"""Deduplication operators for large-scale training-data pipelines.

(Placeholder — populated in the dedup wave: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.)
"""
