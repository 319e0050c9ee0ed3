"""Exact n-gram Jaccard similarity pairs.

Candidate generation by shared-shingle equi-join (only pairs sharing
at least one shingle are scored — pairs below that trivially have
jaccard 0). This is exact but worst-case quadratic on stop-shingles;
the scale path at 100 TB is MinHash LSH (dedup/minhash.py), which
bounds candidates by band collisions. Keep this as the precision
oracle and for post-LSH verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed
from miba_2023_capstone_rb_nlp_spark.functions.text import md5_long, word_ngrams


def shingle_table(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (exploded)."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("s"),
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.1,
    scale: int = 6,
) -> DataFrame:
    """→ DataFrame[da, db, inter, jaccard] with jaccard ≥ threshold.

    jaccard derived from exact integer counts (engine-deterministic).

    The shared-shingle join runs on the 60-bit md5 of the shingle, not
    the string: fixed-width bigint keys shuffle ~4× fewer bytes and
    compare in one instruction (exact up to md5-60 collisions; the
    oracle hashes identically, so parity is unaffected).
    """
    sh = shingle_table(df, text_col, id_col, n).select(
        "doc", md5_long(F.col("s")).alias("hs")
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    # SHUFFLE_HASH: exchange-reuse computes the shingle table once
    a = sh.hint("SHUFFLE_HASH").alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.hs") == F.col("b.hs")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("da"), F.col("b.doc").alias("db"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc").alias("da"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc").alias("db"), F.col("n_sh").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "da")
        .join(nb, "db")
        .withColumn("jaccard", fixed(jac, scale))
        .filter(F.col("jaccard") >= threshold)
        .select("da", "db", "inter", "jaccard")
    )
