"""docee_spark — a PySpark-native document-level event-to-KG engine.

A from-scratch re-expression of the capabilities of Spico197/DocEE
(document-level event extraction without triggers: Doc2EDAG / PTPCG-style
decoding, ChFinAnn-style evaluation) as staged Spark DataFrame transforms
over a Common-Crawl-style webtext table, emitting (subj, pred, obj) triples.

Architecture (SURVEY.md §7):
  ingest → segment → tag → spans → decode → triples → canonicalize → eval

All relational work is declarative DataFrame/SQL (Catalyst-optimized); only
the genuinely per-document combinatorial decode and batched model inference
live in Arrow-vectorized pandas UDFs (never per-row Python).
"""

__version__ = "0.1.0"
