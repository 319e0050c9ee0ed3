"""Embedding-cosine near-duplicate pairs: exact all-pairs baseline +
random-hyperplane LSH bucketing as the scale path.

Hyperplanes are derived deterministically from md5 (plane p, dim d →
weight in [-1, 1] with 1/1000 resolution), so buckets are identical
across engines/runs — no seeded RNG.

Execution strategy (scale rationale): exact all-pairs is O(n²) by
definition, so the job is to make the constant factor BLAS-grade and
the distribution shape block-parallel. Vectors are hashed into B
blocks; every unordered block pair (i,j) becomes one applyInPandas
group holding only blocks i and j (replication factor B per vector,
work (n/B)² per group — the standard distributed all-pairs layout).
Inside a group the cosine matrix is computed by the numpy kernels in
``functions.blas``, whose accumulation order is bit-identical to the
SQL oracle's list_sum fold. The LSH path computes 16-bit hyperplane
signatures with the same kernels, then pairs only within buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.blas import (
    cos_matrix,
    fixed_np,
    seq_plane_dots,
    to_matrix,
)


def _pair_frame(
    ids_a: np.ndarray,
    ids_b: np.ndarray,
    cos: np.ndarray,
    threshold: float,
    same_block: bool,
) -> pd.DataFrame:
    """Mask a cosine matrix down to qualifying (va < vb) pairs."""
    with np.errstate(invalid="ignore"):
        mask = cos >= threshold
    if same_block:
        mask &= ids_a[:, None] < ids_b[None, :]
    ii, jj = np.nonzero(mask)
    va = ids_a[ii]
    vb = ids_b[jj]
    lo = np.minimum(va, vb)
    hi = np.maximum(va, vb)
    return pd.DataFrame({"va": lo, "vb": hi, "cos": cos[ii, jj]})


def cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.45,
    scale: int = 6,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold → [va, vb, cos].

    O(n²) — correctness baseline and small-n path; use
    hyperplane_lsh_pairs at scale. Block-pair applyInPandas layout:
    pair (a,b) with blocks (x,y) is produced exactly once, by group
    (min(x,y), max(x,y)) — same-block pairs only by the diagonal
    group, cross-block pairs only by their one off-diagonal group.
    ``n_blocks`` scales with corpus size (group work is (n/B)²).
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    fan = (
        base.withColumn(
            "_ob", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
        )
        .withColumn("_gi", F.least("_blk", "_ob"))
        .withColumn("_gj", F.greatest("_blk", "_ob"))
    )

    def emit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gi, gj = key
        if gi == gj:
            ids = pdf["_id"].to_numpy()
            mat = to_matrix(pdf["_v"], dim)
            cos = fixed_np(cos_matrix(mat, mat), scale)
            return _pair_frame(ids, ids, cos, threshold, same_block=True)
        a = pdf[pdf["_blk"] == gi]
        b = pdf[pdf["_blk"] == gj]
        ids_a = a["_id"].to_numpy()
        ids_b = b["_id"].to_numpy()
        cos = fixed_np(
            cos_matrix(to_matrix(a["_v"], dim), to_matrix(b["_v"], dim)),
            scale,
        )
        return _pair_frame(ids_a, ids_b, cos, threshold, same_block=False)

    return fan.groupBy("_gi", "_gj").applyInPandas(
        emit, schema="va bigint, vb bigint, cos double"
    )


def plane_weights(dim: int, n_planes: int = 16) -> np.ndarray:
    """(n_planes, dim) deterministic hyperplane weights:
    plane_p[d] = ((md5_60("p:d") mod 2001) - 1000) / 1000 ∈ [-1, 1] —
    identical formula in the SQL oracle, no RNG."""
    w = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            hx = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15]
            w[p, d] = ((int(hx, 16) % 2001) - 1000) / 1000.0
    return w


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

    Signature pass is a mapInPandas over the corpus; candidates come
    from ONE bucket equi-join (both sides shuffle the same signature
    child — exchange reuse computes it once) and a vectorized per-pair
    scoring pass.
    Skewed buckets (near-identical corpora) are the known hazard at
    scale — mitigate by raising n_planes, not by salting (a salted
    bucket would miss pairs).
    """
    weights = plane_weights(dim, n_planes)
    powers = (1 << np.arange(n_planes, dtype=np.int64))

    def add_bucket(batches):
        for pdf in batches:
            mat = to_matrix(pdf["_v"], dim)
            dots = seq_plane_dots(mat, weights)
            pdf = pdf.copy()
            pdf["bucket"] = ((dots >= 0.0) * powers).sum(axis=1)
            yield pdf

    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    with_bucket = base.mapInPandas(
        add_bucket,
        schema="_id bigint, _v array<float>, bucket bigint",
    )

    a = with_bucket.select(
        F.col("bucket"), F.col("_id").alias("va"), F.col("_v").alias("_va_v")
    )
    b = with_bucket.select(
        F.col("bucket"), F.col("_id").alias("vb"), F.col("_v").alias("_vb_v")
    )
    # SHUFFLE_HASH: exchange-reuse computes the bucket pass once
    cand = a.hint("SHUFFLE_HASH").join(b, on="bucket").filter(
        F.col("va") < F.col("vb")
    )

    def score(batches):
        for pdf in batches:
            va = to_matrix(pdf["_va_v"], dim)
            vb = to_matrix(pdf["_vb_v"], dim)
            # per-row (not outer) sequential-fold dot + norms
            dot = np.zeros(len(pdf), dtype=np.float64)
            na = np.zeros(len(pdf), dtype=np.float64)
            nb = np.zeros(len(pdf), dtype=np.float64)
            for d in range(dim):
                dot += va[:, d] * vb[:, d]
                na += va[:, d] * va[:, d]
                nb += vb[:, d] * vb[:, d]
            denom = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = fixed_np(dot / denom, scale)
            cos[denom == 0.0] = np.nan
            with np.errstate(invalid="ignore"):
                keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "va": pdf["va"].to_numpy()[keep],
                    "vb": pdf["vb"].to_numpy()[keep],
                    "cos": cos[keep],
                    "bucket": pdf["bucket"].to_numpy()[keep],
                }
            )

    return cand.mapInPandas(
        score, schema="va bigint, vb bigint, cos double, bucket bigint"
    )
