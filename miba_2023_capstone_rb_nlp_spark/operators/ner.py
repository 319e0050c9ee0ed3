"""Weighted entity aggregation (SURVEY §2.9 M8 + §2.4 A4): the
relational core shared by the suite's ``ner_top_orgs`` entry and
WordWizard.entitiy_recognition.

Reference semantics (``word_wizard.py:430-511``): extract ORG
entities per section, weight title×3, description×2, interest×1,
keep the top-n per cluster. (The reference bug that weights the
description *text* instead of its orgs — ``word_wizard.py:501`` — is
fixed per SURVEY §7 hard-parts.)

Extraction is pluggable and the aggregation plan does NOT change
with the extractor (pinned by tests/test_plans.py): the default is a
deterministic gazetteer expression (lexicon alternation via
regexp_extract_all — the same mechanism as the reference's spaCy
EntityRuler patterns, ``word_wizard.py:463-471``); the model path is
``ml.inference.ner_transformer`` (mapInPandas, gated on transformers).

Scale: extraction runs pre-shuffle (codegen expression or Arrow
batch); then one shuffle on (cluster, org) with map-side partial
sums and one top-n window over k×orgs rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# gazetteer lexicon (EntityRuler-style): word-boundary alternation;
# the synthetic corpus is lowercase so capitalization NER would be
# vacuous — lexicon matching exercises the identical relational plan
ORG_LEXICON = ("spark", "customer", "supplier", "vector", "stream", "window")
ORG_PATTERN = r"\b(" + "|".join(ORG_LEXICON) + r")\b"

# reference weighting (word_wizard.py:499-507)
TITLE_WEIGHT = 3
DESCRIPTION_WEIGHT = 2
INTEREST_WEIGHT = 1


def gazetteer_entities(col: Column, pattern: str = ORG_PATTERN) -> Column:
    """Expression-path extractor: string column → array<string> of
    lexicon matches. Whole-stage-codegen, no Python."""
    return F.regexp_extract_all(col, F.lit(pattern), 1)


def weighted_sections(
    df: DataFrame,
    cluster_col: str,
    sections: list[tuple[int, Column]],
) -> DataFrame:
    """Fan a row out into (cluster, w, t) section rows — one per
    (weight, text-expression) pair, pre-extraction."""
    arr = F.array(
        *[
            F.struct(F.lit(w).alias("w"), t.alias("t"))
            for (w, t) in sections
        ]
    )
    return df.select(
        F.col(cluster_col).alias("_cluster"), F.explode(arr).alias("sec")
    ).select("_cluster", F.col("sec.w").alias("w"), F.col("sec.t").alias("t"))


def weighted_top_entities(
    section_df: DataFrame,
    top_n: int = 5,
    extractor: Callable[[Column], Column] = gazetteer_entities,
    exclude: tuple[str, ...] = (),
) -> DataFrame:
    """(cluster, w, t) section rows → [cluster, org, weight, rk] with
    rk ≤ top_n per cluster, weight = Σ section-weights per mention.

    ``extractor`` maps the text column to an array<string> of entity
    mentions; swapping it (gazetteer ↔ model UDF output) must not and
    does not change this aggregation plan. ``exclude`` parameterizes
    the reference's hard-coded EntityRuler drop-list
    (word_wizard.py:463-471; README.md:115 calls this out).
    """
    orgs = section_df.select(
        "_cluster", "w", F.explode(extractor(F.col("t"))).alias("org")
    )
    if exclude:
        orgs = orgs.filter(~F.col("org").isin(*exclude))
    counts = orgs.groupBy("_cluster", "org").agg(F.sum("w").alias("weight"))
    w = Window.partitionBy("_cluster").orderBy(
        F.col("weight").desc(), F.col("org").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select(F.col("_cluster"), "org", "weight", "rk")
    )


def top_entities_array(ranked: DataFrame, cluster_col: str, out_col: str) -> DataFrame:
    """[cluster, org, weight, rk] → [cluster_col, out_col] with
    out_col = rank-ordered array<string> (the WordWizard column shape,
    word_wizard.py:509)."""
    return (
        ranked.groupBy(F.col("_cluster").alias(cluster_col))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "org"))),
                lambda s: s["org"],
            ).alias(out_col)
        )
    )
