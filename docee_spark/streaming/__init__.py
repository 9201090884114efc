"""Structured-Streaming front-end.

The reference is batch-only — no watermarks, windows, or stateful
operators anywhere (SURVEY §2.11). This package is therefore additive:
it lets the same batch pipeline run incrementally over an arriving
webtext feed via ``foreachBatch``, which is the production shape for a
continuously-crawled corpus (each micro-batch appends to the same
snapshot tables the batch job writes).
"""
