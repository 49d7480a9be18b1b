"""Generic Ray Data operator pack (SURVEY.md §2 + training-data ops).

Relational (joins/aggregates/sorts/set-ops), text analysis, dedup
families (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), and similarity search — all expressed as vectorized
``map_batches`` / ``groupby`` compositions over Arrow batches, usable on
any Dataset (the driver's TPC-H-ish tables and the geo tables alike).
"""
