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

# Below this many fit rows the fit runs DRIVER-SIDE (bounded collect,
# seeded numpy Lloyd's) and only the assignment stays distributed —
# the posture production pipelines use (fit on a bounded sample,
# broadcast the centers) and the one this package already takes for
# HDBSCAN/UMAP. Rationale: MLlib's Lloyd's pays one distributed job
# per iteration (~90 ms fixed driver latency in local mode), so a
# 2.7k-row fit costs ~2 s of pure job scheduling for microseconds of
# arithmetic. At 100 TB n_hint is large and the MLlib path keeps the
# fit distributed (pinned by tests/test_ml_plumbing.py's explicit
# MLlib-path test so that branch is still executed in CI).
LOCAL_FIT_MAX_ROWS = 100_000


def _with_vector(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))


def _lloyd_fit_local(vecs, k: int, seed: int, max_iter: int = 20,
                     tol: float = 1e-4):
    """Seeded Lloyd's on a bounded collected sample: random init (k
    distinct rows), empty clusters reseeded at the farthest point,
    convergence when no center moves more than ``tol``. Deterministic
    for a given (rows, order, seed); kmeans_assign feeds it a
    canonically SORTED sample, so end-to-end the labels depend only
    on (data, seed), not physical layout."""
    import numpy as np

    vecs = np.asarray(vecs, dtype=np.float64)
    rng = np.random.RandomState(seed)
    centers = vecs[rng.choice(len(vecs), size=k, replace=False)].copy()
    labels = None
    for _ in range(max_iter):
        # chunked distance matrix: peak memory stays O(chunk × k × d)
        n = len(vecs)
        labels = np.empty(n, dtype=np.int64)
        mind = np.empty(n, dtype=np.float64)
        for s in range(0, n, 8192):
            d = ((vecs[s:s + 8192, None, :] - centers[None, :, :]) ** 2).sum(2)
            labels[s:s + 8192] = d.argmin(1)
            mind[s:s + 8192] = d.min(1)
        new = np.empty_like(centers)
        # empty clusters reseed at DISTINCT farthest points — handing
        # two empties the same point would collapse them into
        # permanently identical centers (effective k silently shrinks)
        far = iter(np.argsort(-mind))
        for j in range(k):
            pts = vecs[labels == j]
            new[j] = pts.mean(0) if len(pts) else vecs[next(far)]
        moved = np.sqrt(((new - centers) ** 2).sum(1)).max()
        centers = new
        if moved < tol:
            break
    return centers


def _assign_centers_expr(df: DataFrame, vec_col: str, centers,
                         out_col: str) -> DataFrame:
    """Nearest-center assignment as a pure Catalyst expression: one
    squared-distance fold per center (zip_with + aggregate over the
    broadcast-literal center), argmin via least + first-match when
    chain (ties → lowest index, = numpy argmin). Whole-stage codegen,
    no Python workers, map-only — THE scalable transform regardless
    of where the fit ran.

    NULL or mis-dimensioned vectors fail LOUDLY (raise_error), the
    same contract as the MLlib transform path — the two branches must
    not diverge on malformed input (a null would otherwise fall
    through every when() to a silent NULL label)."""
    vec = F.col(vec_col).cast("array<double>")
    dists = [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in center]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for center in centers
    ]
    m = F.least(*dists) if len(dists) > 1 else dists[0]
    label = F.when(dists[0] == m, F.lit(0))
    for j in range(1, len(dists)):
        label = label.when(dists[j] == m, F.lit(j))
    label = label.otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "kmeans_assign: NULL or mis-dimensioned vector in "
                    f"column {vec_col!r} (expected dim "
                    f"{len(centers[0])})"
                )
            )
        )
    )
    return df.withColumn(out_col, label.cast("int"))


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

    FIT placement is adaptive by the same logic (LOCAL_FIT_MAX_ROWS):
    below ~100k fit rows, each distributed Lloyd's round is a job
    whose fixed driver latency dwarfs the arithmetic, so the fit runs
    driver-side on the bounded collected sample (seeded numpy
    Lloyd's) and ONLY the assignment stays distributed — as a pure
    codegen expression over the broadcast-literal centers, so the
    transform scales identically either way. Large or unknown n keeps
    the fully-distributed MLlib fit.
    """
    local = (
        init_mode is None  # an explicit init_mode asks for MLlib
        and n_hint is not None
        and n_hint <= LOCAL_FIT_MAX_ROWS
        and n_hint > k
    )
    if local:
        src = df if fit_df is None else fit_df
        # n_hint is ADVISORY — never let a stale/wrong hint unbound
        # the driver collect: limit caps the transfer, and overflow
        # (more rows than the hint promised) falls back to the
        # distributed MLlib fit instead of OOMing the driver. The
        # bare limit().collect() short-circuits (CollectLimit reads
        # only as many partitions as needed), which matters exactly
        # when the hint was stale and the data is large — a Spark-side
        # sort here would force a full scan just to discover the
        # overflow and fall back anyway.
        rows = src.select(vec_col).limit(LOCAL_FIT_MAX_ROWS + 1).collect()
        if k < len(rows) <= LOCAL_FIT_MAX_ROWS:
            # Canonically sorted DRIVER-SIDE (ADVICE r7 #2): collect
            # order is physical scan order, and _lloyd_fit_local's
            # seeded init indexes into the order — sorting the full
            # (≤ cap) sample makes the labels a pure function of
            # (data, seed), invariant under partitioning/file layout,
            # so the local branch passes the same partition-invariance
            # battery as every other operator. On this no-overflow
            # path the collect already holds ALL fit rows, so the
            # local sort loses nothing vs sorting in Spark.
            vecs = sorted(tuple(r[0]) for r in rows)
            centers = _lloyd_fit_local(vecs, k, SEED)
            return _assign_centers_expr(df, vec_col, centers, out_col)
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
