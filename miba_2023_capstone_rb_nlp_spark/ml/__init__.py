"""ML/NLP macro-operators (SURVEY §2.9 M1-M10), Spark-first:

- deterministic hash-embedding stand-in (oracle-checkable) next to a
  real-transformer path gated behind import-try (the container has no
  torch/transformers);
- MLlib KMeans + silhouette sweep;
- the distinct→infer→join rewrite around every expensive inference
  (the reference's most important hand-optimization, SURVEY §4);
- medoid summarization (window top-n → infer → join back);
- PCA (MLlib) as the distributed dimensionality-reduction path, with
  driver-side UMAP/HDBSCAN gated stubs documenting the scale ceiling.
"""
