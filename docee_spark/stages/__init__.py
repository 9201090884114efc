"""Pipeline stages: DataFrame-in → DataFrame-out pure functions.

Stage chain (SURVEY.md §7): ingest → segment → tag → spans → decode →
triples → canonicalize → eval. Each stage is declarative where Spark can
express it (Catalyst optimizes the whole composed plan); only per-document
combinatorial decoding and batched inference use Arrow-vectorized UDFs.
"""
