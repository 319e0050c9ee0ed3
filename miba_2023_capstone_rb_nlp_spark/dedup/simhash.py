"""SimHash (60-bit) near-dup detection with pigeonhole banding.

simhash(doc): per bit b, sum ±1 over token hashes' bit b; bit set if
sum > 0. Pairs within hamming ≤ 3 are found EXACTLY by the 4×15-bit
band join (pigeonhole: ≤3 differing bits leave ≥1 band identical).

Scale: signature = explode + groupBy(doc) (60 partial-agg sums);
band join shuffles on 15-bit chunk values — uniform. Candidates per
band are tiny at any corpus size for true near-dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.text import md5_long, tokens

BITS = 60
CHUNKS = 4
CHUNK_BITS = BITS // CHUNKS  # 15


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """→ DataFrame[doc, simhash] (60-bit, token-frequency weighted)."""
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    h = tok.withColumn("hv", md5_long(F.col("t")))
    bit_sums = h.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hv"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(BITS)
        ]
    )
    sim = None
    for b in range(BITS):
        term = F.when(
            F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """→ DataFrame[da, db, hamming ≤ max_hamming].

    Exact for max_hamming ≤ CHUNKS-1 via pigeonhole banding.
    """
    sig = simhash(df, text_col, id_col)
    banded = sig.select(
        "doc",
        "simhash",
        *[
            F.shiftright(F.col("simhash"), c * CHUNK_BITS)
            .bitwiseAND((1 << CHUNK_BITS) - 1)
            .alias(f"c{c}")
            for c in range(CHUNKS)
        ],
    )
    pairs = None
    for c in range(CHUNKS):
        a, b = banded.alias("a"), banded.alias("b")
        p = a.join(
            b,
            (F.col(f"a.c{c}") == F.col(f"b.c{c}")) & (F.col("a.doc") < F.col("b.doc")),
        ).select(
            F.col("a.doc").alias("da"),
            F.col("b.doc").alias("db"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.dropDuplicates(["da", "db"])
        .withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("da", "db", "hamming")
    )
