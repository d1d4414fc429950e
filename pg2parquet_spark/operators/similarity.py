"""Similarity search over embedding columns.

(Placeholder — populated in the similarity wave: brute-force cosine top-k,
LSH-bucketed ANN.)
"""
