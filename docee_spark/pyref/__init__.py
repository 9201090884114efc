"""Pure-Python reference semantics (test oracles).

Each function here re-implements, from its documented behavior, one
correctness-bearing routine of Spico197/DocEE (file:line cited per
function). These run on the driver only — in tests, in fixture/gold
generation, and inside Arrow UDFs where the computation is genuinely
per-document. They are deliberately dependency-free (no torch, no spark)
so pytest can compare the Spark pipeline against them row-for-row.
"""
