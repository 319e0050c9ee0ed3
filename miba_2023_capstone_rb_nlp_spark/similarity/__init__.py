"""Similarity search over embedding columns: brute-force cosine
top-k (correctness baseline) and bucketed variants (hyperplane LSH,
cell-restricted IVF) as the scale path."""
