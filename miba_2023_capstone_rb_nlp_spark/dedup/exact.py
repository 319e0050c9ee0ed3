"""Exact deduplication: fingerprint groupBy → canonical id.

Scale: one shuffle on the 60-bit fingerprint (uniform — no skew);
min-id canonical selection is a partial aggregate. At 100 TB this is
the cheapest dedup pass and always runs first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.text import fingerprint


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """→ input + fingerprint, canonical_id, is_dup columns.

    canonical = min(id) per fingerprint; deterministic under any
    partitioning.
    """
    fp = df.withColumn("fingerprint", fingerprint(F.col(text_col)))
    canon = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return fp.join(canon, "fingerprint", "inner").withColumn(
        "is_dup", F.col(id_col) != F.col("canonical_id")
    )
