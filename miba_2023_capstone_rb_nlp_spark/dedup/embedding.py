"""Embedding-cosine near-duplicate pairs: exact all-pairs baseline +
random-hyperplane LSH bucketing as the scale path.

Hyperplanes are derived deterministically from md5 (plane p, dim d →
weight in [-1, 1] with 1/1000 resolution), so buckets are identical
across engines/runs — no seeded RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed
from miba_2023_capstone_rb_nlp_spark.functions.vectors import (
    as_double,
    dot_expanded,
    norm2_expanded,
)


def cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.45,
    scale: int = 6,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold → [va, vb, cos].

    O(n²) — correctness baseline and small-n path; use
    hyperplane_lsh_pairs at scale. Hot-path tuning: norms are
    materialized once per VECTOR before the pair join (not 2× per
    pair) and the dot is an expanded codegen chain (functions/vectors
    rationale) — same values, ~10× less work per pair.
    """
    with_norm = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm2_expanded(F.col(vec_col), dim).alias("_n"),
    )
    a = with_norm.select(
        F.col("_id").alias("va"), F.col("_v").alias("ea"), F.col("_n").alias("na")
    )
    b = with_norm.select(
        F.col("_id").alias("vb"), F.col("_v").alias("eb"), F.col("_n").alias("nb")
    )
    denom = F.col("na") * F.col("nb")
    cos = F.when(
        denom != 0.0, dot_expanded(F.col("ea"), F.col("eb"), dim) / denom
    )
    return (
        a.join(b, F.col("va") < F.col("vb"))
        .withColumn("cos", fixed(cos, scale))
        .filter(F.col("cos") >= threshold)
        .select("va", "vb", "cos")
    )


def _plane_weight(plane: int, d: int) -> float:
    # materialized per-literal on the driver? No — weights must be
    # column-free constants; computed in SQL for engine parity.
    raise NotImplementedError("weights are generated as literals; see hyperplane_bits")


def hyperplane_bits(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """LSH bucket id: sign bits of dot(vec, plane_p) for p < n_planes.

    plane_p[d] = ((md5_60("p:d") mod 2001) - 1000) / 1000 ∈ [-1, 1],
    computed as literal constants at plan-build time (same formula in
    the SQL oracle).
    """
    import hashlib

    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        dot = F.lit(0.0)
        for d in range(dim):
            hx = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15]
            w = ((int(hx, 16) % 2001) - 1000) / 1000.0
            # scalar widen per element (see vectors.dot_expanded note)
            dot = dot + vec.getItem(d).cast("double") * F.lit(w)
        bit = F.when(dot >= 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bucket + bit
    return bucket


def hyperplane_lsh_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    n_planes: int = 16,
    threshold: float = 0.45,
    scale: int = 6,
) -> DataFrame:
    """Bucketed near-dup pairs: same 16-bit hyperplane bucket →
    verify cosine ≥ threshold. Sub-quadratic; recall bounded by
    bucket collisions (raise n_planes / add multi-probe for recall).
    """
    with_bucket = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        norm2_expanded(F.col(vec_col), dim).alias("nrm"),
        hyperplane_bits(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    a, b = with_bucket.alias("a"), with_bucket.alias("b")
    denom = F.col("a.nrm") * F.col("b.nrm")
    cos = F.when(
        denom != 0.0,
        dot_expanded(F.col("a.vec"), F.col("b.vec"), dim) / denom,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .withColumn("cos", fixed(cos, scale))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vid").alias("va"), F.col("b.vid").alias("vb"), "cos",
            F.col("a.bucket").alias("bucket"),
        )
    )
