"""MinHash signatures + banded LSH candidate pairs — the scale path
for near-dup detection (sub-quadratic: candidates only on band
collisions).

Hash family: h_i(s) = 60-bit md5("i:" + s) — independent-enough for
LSH, identical in every engine (oracle parity), and stable across
cluster runs (unlike JVM-seeded murmur).

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
from miba_2023_capstone_rb_nlp_spark.functions.text import md5_long
from miba_2023_capstone_rb_nlp_spark.dedup.jaccard import shingle_table

K = 16
BANDS = 4
ROWS_PER_BAND = K // BANDS


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = K
) -> DataFrame:
    """→ DataFrame[doc, h0..h{k-1}]."""
    sh = shingle_table(df, text_col, id_col, n)
    hashed = sh.select(
        "doc",
        *[
            md5_long(F.concat(F.lit(f"{i}:"), F.col("s"))).alias(f"_h{i}")
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
    banded = sig.select(
        "doc",
        *[_band_sig(b).alias(f"b{b}") for b in range(bands)],
        *[F.col(f"h{i}") for i in range(k)],
    )
    pairs = None
    for b in range(bands):
        a = banded.alias("a")
        bb = banded.alias("b")
        p = a.join(
            bb,
            (F.col(f"a.b{b}") == F.col(f"b.b{b}")) & (F.col("a.doc") < F.col("b.doc")),
        ).select(
            F.col("a.doc").alias("da"),
            F.col("b.doc").alias("db"),
            *[F.col(f"a.h{i}").alias(f"ha{i}") for i in range(k)],
            *[F.col(f"b.h{i}").alias(f"hb{i}") for i in range(k)],
        )
        pairs = p if pairs is None else pairs.unionByName(p)
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
