"""Dimensionality reduction (SURVEY M9): MLlib PCA as the distributed
path; UMAP as a gated driver-side stub (no distributed UMAP exists —
it needs a global kNN graph; reference runs it in-process,
word_wizard.py:513-559).

Output column named ``reduced_dimensions`` — normalizing the
reference's misleading ``*_word_embeddings`` suffix reuse
(word_wizard.py:557, documented deviation).
"""

from __future__ import annotations

from pyspark.ml.feature import PCA
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_reduce(
    df: DataFrame,
    vec_col: str,
    n_components: int = 2,
    out_col: str = "reduced_dimensions",
    fit_df: DataFrame | None = None,
) -> DataFrame:
    """Distributed PCA → array<double> coords. The covariance/SVD runs
    on executors; only the k×d principal-component matrix lives on
    the driver.

    ``fit_df``: optional frame to fit the model on instead of ``df``
    — pass a persisted upstream base with the same rows (1:1 lineage)
    so the fit action scans the cache rather than recomputing every
    enrichment join stacked on top of it. The transform still applies
    to ``df``.
    """
    feat = df.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    fit_feat = feat if fit_df is None else fit_df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features")
    )
    model = PCA(k=n_components, inputCol="_features", outputCol="_pca").fit(fit_feat)
    return (
        model.transform(feat)
        .withColumn(out_col, vector_to_array(F.col("_pca")))
        .drop("_features", "_pca")
    )


def umap_reduce(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_components: int = 2,
    out_col: str = "reduced_dimensions",
) -> DataFrame:
    """Driver-side UMAP (gated): collect embeddings, fit, join coords
    back by id. Documented scale ceiling — prefer pca_reduce beyond
    ~1M rows."""
    try:
        import umap
    except ImportError as e:  # pragma: no cover - env without umap
        raise NotImplementedError(
            "umap-learn is not installed; use pca_reduce for the "
            "distributed path"
        ) from e
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    ids = [r[0] for r in rows]
    vecs = np.array([r[1] for r in rows])
    coords = umap.UMAP(
        n_components=n_components, n_neighbors=15, min_dist=0.0, metric="cosine",
        random_state=42,
    ).fit_transform(vecs)
    label_df = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in zip(ids, coords)],
        [id_col, out_col],
    )
    return df.join(label_df, id_col, "left")
