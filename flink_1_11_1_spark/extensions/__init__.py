"""Extension operators beyond the reference surface (SURVEY.md §8.4):
large-scale training-data pipeline ops over ``documents`` /
``embeddings`` — deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard), embedding similarity search, text analysis, multimodal column
plumbing.  All partition-parallel DataFrame jobs designed for 100 TB.
"""
