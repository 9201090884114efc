"""Large-scale training-data pipeline operators.

Beyond the reference's own inventory (SURVEY §2), these are the operations
a 100 TB webtext corpus needs before/alongside KG construction:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal column plumbing.

Everything here is built-in Column expressions (JVM-side, codegen'd) —
hash functions are md5-based so results are bit-identical to the DuckDB
oracle formulations in __spark_entry__.py.
"""
