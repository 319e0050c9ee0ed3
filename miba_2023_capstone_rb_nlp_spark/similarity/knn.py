"""k-nearest-neighbor search over an ``array<float>`` embedding column.

Brute force: broadcast the (small) query set against the corpus —
one pass, no shuffle except the top-k window on query id. At 100 TB
the corpus side stays partitioned; only queries broadcast.

IVF variant: restrict the scan to the query's cell (here: a
precomputed cell id column, e.g. a KMeans assignment) — candidates
drop by ~n_cells× at the cost of recall on cell borders; multi-probe
= join on array of nearest cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed
from miba_2023_capstone_rb_nlp_spark.functions.vectors import (
    dot_expanded,
    norm2_expanded,
)


def _cos(dim: int) -> F.Column:
    denom = F.col("qn") * F.col("cn")
    return F.when(
        denom != 0.0, dot_expanded(F.col("qv"), F.col("cv"), dim) / denom
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 10,
    scale: int = 6,
) -> DataFrame:
    """→ [query_id, neighbor_id, cos, rk ≤ k] (self excluded).

    Deterministic: quantized cosine, ties broken by neighbor id.
    Norms precomputed per side before the broadcast join (not per
    candidate pair); dot is an expanded codegen chain.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm2_expanded(F.col(vec_col), dim).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm2_expanded(F.col(vec_col), dim).alias("cn"),
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn("cos", fixed(_cos(dim), scale))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def knn_ivf_cells(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    dim: int,
    k: int = 10,
    scale: int = 6,
) -> DataFrame:
    """IVF-style: only score candidates in the query's cell."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm2_expanded(F.col(vec_col), dim).alias("qn"),
        F.col(cell_col).alias("cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm2_expanded(F.col(vec_col), dim).alias("cn"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", fixed(_cos(dim), scale))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cell", "neighbor_id", "cos", "rk")
    )
