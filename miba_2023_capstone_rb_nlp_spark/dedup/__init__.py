"""Deduplication operators for large-scale training-data pipelines:
exact (hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash banding,
and embedding-cosine near-dup. All hashes are md5-derived so results
are engine-deterministic (oracle-checkable) and cluster-stable.
"""
