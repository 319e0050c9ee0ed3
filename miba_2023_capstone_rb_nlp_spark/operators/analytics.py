"""Cluster analytics: centroids, medoid flagging, and the flagship
reporting query (per-cluster window aggregates + medoid filter +
projection).

Reference parity (SURVEY.md §2.5, §3.3):
  - medoid flagging  = W1/M5, reference ``word_wizard.py:719-746``
    (n_med nearest-to-centroid per cluster, euclidean metric);
  - flagship query   = the MVP notebook reporting query
    (``MVP.ipynb`` cell-12): window count (A6) + window mean (A7) +
    medoid filter (P9) + fixed projection (P6).

Spark-first design: centroids are one hash aggregation (map-side
partial avg per dimension — a single shuffle on the cluster key);
the centroid table (k rows) is broadcast back, distance is a codegen
array expression, medoids come from a rank-1..n window. At 100 TB the
only shuffle is on ``label`` — AQE handles skewed clusters.

Determinism: distances are rounded and ties broken by row id so
results are stable across partitionings and engines (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed
from miba_2023_capstone_rb_nlp_spark.functions.vectors import euclidean

_SCALE = 6


def vector_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first non-null row (tiny
    driver action, executed once per plan build)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).filter("d is not null").first()
    if row is None:
        raise ValueError(f"no non-null vectors in column {vec_col!r}")
    return row["d"]


def centroids(
    df: DataFrame, vec_col: str, label_col: str, dim: int | None = None
) -> DataFrame:
    """Per-cluster mean vector → DataFrame[label, centroid].

    One shuffle: groupBy(label) with per-dimension ``avg`` columns
    (partial aggregation map-side, so 100 TB in → k rows out).
    Components rounded so downstream math is engine-deterministic.
    """
    dim = dim or vector_dim(df, vec_col)
    # posexplode + (label, dim)-keyed aggregate instead of 2×dim
    # aggregate columns: the wide form (sum+count per dimension, 128
    # expressions at dim 64) falls off whole-stage codegen and was
    # measured ~1.7× slower at sf0.1; the exploded form is one narrow
    # partial-agg exchange of (label, i, sum, count) — k×dim rows —
    # at any scale. Exact-parity details vs the wide form:
    #   * slice(..., dim) bounds positions at dim (getItem never read
    #     past it);
    #   * posexplode_outer keeps labels whose every vector is NULL
    #     (their i=NULL group contributes nothing to the map but
    #     holds the label in the final groupBy);
    #   * collect_list skips the when()-nulled i=NULL entries;
    #   * transform(sequence, m[j]) re-emits ALL dim positions, NULL
    #     where no row had that component — identical to the wide
    #     form's count=0 → NULL division.
    v = F.slice(F.col(vec_col).cast("array<double>"), 1, dim)
    pe = df.select(
        F.col(label_col).alias(label_col),
        F.posexplode_outer(v).alias("_i", "_x"),
    )
    per_dim = pe.groupBy(label_col, "_i").agg(
        fixed(F.sum("_x") / F.count("_x"), _SCALE).alias("_c")
    )
    m = F.map_from_entries(
        F.collect_list(
            F.when(
                F.col("_i").isNotNull(), F.struct(F.col("_i"), F.col("_c"))
            )
        )
    )
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)), lambda j: m[j]
        ).alias("centroid")
    )


def with_centroid_distance(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int | None = None,
    dist_col: str = "dist",
) -> DataFrame:
    """Join (broadcast — k rows) each row to its cluster centroid and
    compute rounded euclidean distance."""
    cents = centroids(df, vec_col, label_col, dim)
    joined = df.join(F.broadcast(cents), on=label_col, how="inner")
    return joined.withColumn(
        dist_col, fixed(euclidean(F.col(vec_col), F.col("centroid")), _SCALE)
    ).drop("centroid")


def with_medoids(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    id_col: str,
    n_med: int = 2,
    dim: int | None = None,
    flag_col: str = "is_medoid",
) -> DataFrame:
    """Flag the n_med rows nearest their cluster centroid (reference
    ``word_wizard.py:725-735``), ties broken by id for determinism."""
    with_dist = with_centroid_distance(df, vec_col, label_col, dim)
    w = Window.partitionBy(label_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return with_dist.withColumn(
        flag_col, F.row_number().over(w) <= F.lit(n_med)
    )


def pairwise_medoid_scores(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    id_col: str,
    dim: int,
) -> DataFrame:
    """W2 medoid metric (reference ``word_wizard.py:737-746``, the
    hdbscan path): per cluster, each row's MEAN euclidean distance to
    every other member → DataFrame[label, id, mean_dist].

    O(n²) per cluster — the reference's known hazard, here bounded per
    applyInPandas group and vectorized (one outer-difference per
    dimension). Determinism: each pairwise distance is quantized to
    1e-6 and summed as scaled int64 (exact, order-independent), then
    the mean is derived in a fixed textual order mirrored by the SQL
    oracle. Singleton clusters have no pairwise distances and emit no
    rows (matching the oracle's self-excluding join).
    """
    import numpy as np
    import pandas as pd

    from miba_2023_capstone_rb_nlp_spark.functions.blas import to_matrix

    def emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"label": [], "id": [], "mean_dist": []})
        mat = to_matrix(pdf["_v"], dim)
        d2 = np.zeros((n, n), dtype=np.float64)
        for d in range(dim):
            diff = mat[:, d][:, None] - mat[:, d][None, :]
            d2 += diff * diff
        fx = np.floor(np.sqrt(d2) * 1_000_000.0).astype(np.int64)
        sums = fx.sum(axis=1)  # self-distance contributes exactly 0
        mean = sums.astype(np.float64) / 1_000_000.0 / (n - 1)
        mean_q = np.floor(mean * 10_000.0) / 10_000.0
        return pd.DataFrame(
            {
                "label": pdf["_l"].to_numpy(),
                "id": pdf["_id"].to_numpy(),
                "mean_dist": mean_q,
            }
        )

    base = df.select(
        F.col(label_col).alias("_l"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    )
    return base.groupBy("_l").applyInPandas(
        emit, schema="label int, id bigint, mean_dist double"
    )


def cluster_viz_summary(
    documents: DataFrame,
    embeddings: DataFrame,
    n_med: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Flagship reporting query (MVP.ipynb cell-12 re-expressed).

    Decide-small / move-big-once shape (optimization guide §2.3/§8,
    r15): every DECISION — centroids, distances, medoid ranks,
    per-cluster size and char-mean — runs over narrow proxies
    (label, id, dist, x, y, n_chars); the heavy ``text`` column and
    the full embedding array never cross a hash exchange. Mirrors the
    oracle exactly: centroids and ranks are computed from embeddings
    ALONE (the oracle's ``cent``/``flagged`` CTEs have no documents
    join), documents attach afterwards.

    Plan: (1) centroid aggregate (map-side partial, k rows out);
    (2) the rank window over (label, vec_id, x, y, dist) with the
    n_med filter directly above row_number so WindowGroupLimit prunes
    to ≤n_med rows per label per map partition BEFORE the exchange;
    (3) per-cluster size/mean_chars as ONE partial aggregate over the
    narrow (id ⋈ n_chars) join — k rows, broadcast back; (4) the
    ≤k×n_med medoid rows broadcast against documents to fetch text.
    The old shape shuffled text + the 64-dim array through the label
    window and computed the doc⋈vec join twice (once under the
    centroid aggregate, once for the stream).
    """
    # (1)+(2): decision pass over embeddings only — project x/y and
    # drop the vector before any exchange
    narrow = with_centroid_distance(
        embeddings, "embedding", "label", dim
    ).select(
        "label",
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
        "dist",
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    medoids = (
        narrow.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(n_med))
        .drop("rn")
    )
    # (3): size / mean_chars of the doc-joined cluster population as a
    # k-row aggregate (the oracle's window-over-enr values, same
    # arithmetic: sum(n_chars) cast double / count, floor-quantized)
    stats = (
        embeddings.select("vec_id", "label")
        .join(
            documents.select("doc_id", "n_chars"),
            F.col("vec_id") == F.col("doc_id"),
            "inner",
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("size"),
            fixed(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_chars"),
        )
    )
    # (4): attach text by broadcasting the ≤k×n_med medoid rows —
    # documents stream, the inner join drops medoids without a doc
    # row exactly as the oracle's post-rank join does
    return (
        documents.select("doc_id", "text")
        .join(
            F.broadcast(medoids.join(F.broadcast(stats), "label", "inner")),
            F.col("doc_id") == F.col("vec_id"),
            "inner",
        )
        .select(
            F.col("label").alias("cluster"),
            F.col("size"),
            F.col("x"),
            F.col("y"),
            F.col("mean_chars"),
            F.col("dist"),
            F.col("doc_id"),
            F.col("text"),
        )
    )
