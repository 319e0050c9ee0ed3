"""Clustering stages (SURVEY M3/M4): MLlib KMeans with silhouette
model selection, plus gated driver-side HDBSCAN.

Reference parity: k sweep over [k_min, k_max) picking max silhouette
(word_wizard.py:677-687, floor k≥5 at :715); the interactive elbow
mode (:689-710) is deliberately dropped (non-headless). HDBSCAN has
no distributed implementation — the reference runs it on 2-D
UMAP-reduced data (word_wizard.py:284-288), so the driver-side fit on
collected reduced vectors preserves semantics with a documented scale
ceiling (reduce first, collect k×2 doubles per row).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def _with_vector(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))


def kmeans_assign(
    df: DataFrame, vec_col: str, k: int, out_col: str = "cluster",
    fit_df: DataFrame | None = None, init_mode: str | None = None,
    n_hint: int | None = None,
) -> DataFrame:
    """Fit MLlib KMeans (seeded) and append integer labels.

    ``fit_df``: optional (typically narrow, right-partitioned) frame
    with the same rows to fit on — Lloyd's is iterative, so every
    excess partition is paid once per iteration in task overhead; the
    transform (one map-only pass) still applies to ``df``.

    ``init_mode``: None picks adaptively from ``n_hint`` (row count if
    the caller already knows it): k-means|| init costs ~2×initSteps
    extra distributed rounds, which buys convergence quality that only
    matters at scale — below ~1M fit rows the init rounds dominate the
    whole fit (measured ~2.5× wall on local[32]) while Lloyd's fully
    recovers quality, so small fits use "random". At 100 TB (n_hint
    large or unknown) the default stays "k-means||".
    """
    if init_mode is None:
        init_mode = "random" if (n_hint is not None and n_hint < 1_000_000) else "k-means||"
    feat = _with_vector(df, vec_col)
    fit_feat = feat if fit_df is None else _with_vector(fit_df, vec_col)
    model = KMeans(
        k=k, seed=SEED, initMode=init_mode, featuresCol="_features"
    ).fit(fit_feat)
    return (
        model.transform(feat)
        .withColumnRenamed("prediction", out_col)
        .drop("_features")
    )


def choose_k_silhouette(
    df: DataFrame, vec_col: str, k_min: int = 5, k_max: int = 15
) -> tuple[int, dict[int, float]]:
    """Silhouette sweep k ∈ [2, k_max), floored at k_min (reference
    word_wizard.py:677-687,715). Driver loop over MLlib fits — each
    fit is distributed; only scores come back to the driver.

    Sweep fits use random init at every scale: the sweep is model
    SELECTION (relative silhouette ranking), so per-fit init quality
    is noise the evaluator integrates over — k-means|| would multiply
    the loop's distributed rounds by ~2×initSteps for nothing. The
    winning k's PRODUCTION fit (kmeans_assign) still applies the
    adaptive init rule."""
    feat = _with_vector(df, vec_col).cache()
    evaluator = ClusteringEvaluator(
        featuresCol="_features", metricName="silhouette",
        distanceMeasure="squaredEuclidean",
    )
    scores: dict[int, float] = {}
    try:
        for k in range(2, k_max):
            model = KMeans(
                k=k, seed=SEED, initMode="random", featuresCol="_features"
            ).fit(feat)
            scores[k] = evaluator.evaluate(model.transform(feat))
        best = max(scores, key=lambda k: (scores[k], -k))
        return max(best, k_min), scores
    finally:
        feat.unpersist()


def hdbscan_assign(
    df: DataFrame,
    reduced_col: str,
    id_col: str,
    min_cluster_size: int = 5,
    out_col: str = "cluster",
) -> DataFrame:
    """Driver-side HDBSCAN on (already-reduced) coords, labels joined
    back by id. Noise label −1 (word_wizard.py:288). Scale ceiling:
    requires collecting n×2 doubles to the driver — run AFTER
    dimensionality reduction, never on raw embeddings."""
    try:
        import hdbscan
    except ImportError as e:  # pragma: no cover - env without hdbscan
        raise NotImplementedError(
            "hdbscan is not installed in this environment; use "
            "kmeans_assign for the distributed path"
        ) from e
    import numpy as np

    rows = df.select(id_col, reduced_col).collect()
    ids = [r[0] for r in rows]
    coords = np.array([r[1] for r in rows])
    labels = hdbscan.HDBSCAN(min_cluster_size=min_cluster_size).fit_predict(coords)
    spark = df.sparkSession
    label_df = spark.createDataFrame(
        [(i, int(l)) for i, l in zip(ids, labels)], [id_col, out_col]
    )
    return df.join(label_df, id_col, "left")
