"""MinHash signatures + banded LSH candidate pairs — the scale path
for near-dup detection (sub-quadratic: candidates only on band
collisions).

Hash family: Kirsch-Mitzenmacher double hashing
h_i(s) = md5_60("A:"+s) + i * md5_56("B:"+s) — two md5 evaluations
per shingle instead of k (the signature build is md5-bound), the
classic two-hash construction whose LSH behavior matches independent
hashes, engine-identical (oracle parity), and stable across cluster
runs (unlike JVM-seeded murmur). i ≤ 15 keeps h_i < 2^61: no BIGINT
overflow in any engine.

Scale: signature build is one explode + one groupBy(doc) with k
min-aggregates (map-side partial); band join shuffles on (band,
signature) which is uniform by construction — no skew mitigation
needed. k=16, bands=4×4 targets the jaccard≈0.3+ regime
(P[collide] = 1-(1-j^4)^4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed
from miba_2023_capstone_rb_nlp_spark.functions.text import md5_long, md5_long56
from miba_2023_capstone_rb_nlp_spark.dedup.jaccard import shingle_table

K = 16
BANDS = 4
ROWS_PER_BAND = K // BANDS


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = K
) -> DataFrame:
    """→ DataFrame[doc, h0..h{k-1}]."""
    sh = shingle_table(df, text_col, id_col, n)
    base = sh.select(
        "doc",
        md5_long(F.concat(F.lit("A:"), F.col("s"))).alias("_m1"),
        md5_long56(F.concat(F.lit("B:"), F.col("s"))).alias("_m2"),
    )
    hashed = base.select(
        "doc",
        *[
            (F.col("_m1") + F.lit(i) * F.col("_m2")).alias(f"_h{i}")
            for i in range(k)
        ],
    )
    return hashed.groupBy("doc").agg(
        *[F.min(f"_h{i}").alias(f"h{i}") for i in range(k)]
    )


def _band_sig(band: int) -> F.Column:
    cols = [F.col(f"h{band * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
    return F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = K,
    bands: int = BANDS,
    scale: int = 6,
) -> DataFrame:
    """→ DataFrame[da, db, est_jaccard]: distinct pairs colliding in
    ≥1 band; est_jaccard = matching minhashes / k (exact multiple of
    1/k — engine-deterministic)."""
    sig = minhash_signatures(df, text_col, id_col, n, k)
    # one self-join on (band_index, band_signature) after posexplode —
    # both sides share the shuffle exchange so the signature build runs
    # once (a union of per-band joins recomputes it per branch)
    banded = sig.select(
        "doc",
        *[F.col(f"h{i}") for i in range(k)],
        F.posexplode(
            F.array(*[_band_sig(b) for b in range(bands)])
        ).alias("bi", "bv"),
    )
    # SHUFFLE_HASH: exchange-reuse computes the signature build once
    a = banded.hint("SHUFFLE_HASH").alias("a")
    bb = banded.alias("b")
    pairs = a.join(
        bb,
        (F.col("a.bi") == F.col("b.bi"))
        & (F.col("a.bv") == F.col("b.bv"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(
        F.col("a.doc").alias("da"),
        F.col("b.doc").alias("db"),
        *[F.col(f"a.h{i}").alias(f"ha{i}") for i in range(k)],
        *[F.col(f"b.h{i}").alias(f"hb{i}") for i in range(k)],
    )
    matches = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0),
        range(k),
        F.lit(0),
    )
    return (
        pairs.dropDuplicates(["da", "db"])
        .withColumn("est_jaccard", fixed(matches.cast("double") / k, scale))
        .select("da", "db", "est_jaccard")
    )
