"""Skew mitigation: salted joins and salted aggregation.

The 100 TB failure mode: one hot key (a viral document, a default
user id, an empty-string URL) lands an entire shuffle partition on
one executor. AQE's skew-join splitting handles sort-merge joins it
can see; salting is the explicit, always-available fix and the only
one that works for aggregations and for pre-AQE plan shapes.

Both transforms are RESULT-INVARIANT — the suite proves it by
oracle-matching the salted plans against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side to a smaller side with key salting.

    The skewed side gets a deterministic salt in [0, n_salts) (hash of
    its full row id would do; we use a hash of the key PLUS a row-local
    component via ``spark_partition_id`` — any spread works, it never
    affects results). The small side is EXPLODED n_salts× so every
    (key, salt) pair exists. The join key becomes (key, salt): a hot
    key now spreads over n_salts reducers.

    Cost model: replicates the small side n_salts× — use when
    small × n_salts ≪ skewed-side hot-key volume.

    Only inner/left/left_semi are result-invariant under salting:
    for right/full joins an unmatched small-side row exists n_salts
    times and each copy would survive null-extended, duplicating
    rows versus the plain join.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join: how={how!r} is not result-invariant under "
            "salting (small side is exploded n_salts×); use inner, "
            "left, or left_semi"
        )
    salted_l = skewed.withColumn(
        "_salt",
        F.pmod(F.hash(F.col(key), F.spark_partition_id()), F.lit(n_salts)),
    )
    salted_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_l.join(salted_r, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` is [(col, fn, alias)] with fn ∈ {sum, count, min, max} —
    the decomposable aggregates. Stage 1 aggregates on (key, salt)
    (spreads the hot key), stage 2 merges per key. Spark's partial
    aggregation already does this for the MAP side; explicit salting
    additionally spreads the REDUCE side, which partial agg cannot.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {
        "sum": F.sum,
        "count": lambda c: F.count(F.lit(1)),
        "min": F.min,
        "max": F.max,
    }
    salted = df.withColumn(
        "_salt",
        F.pmod(F.hash(F.col(key), F.spark_partition_id()), F.lit(n_salts)),
    )
    stage1 = salted.groupBy(key, "_salt").agg(
        *[firsts[fn](c).alias(f"_p_{alias}") for c, fn, alias in aggs]
    )
    return stage1.groupBy(key).agg(
        *[mergers[fn](f"_p_{alias}").alias(alias) for c, fn, alias in aggs]
    )
