"""NER top-orgs per cluster (SURVEY §2.9 M8 + §2.4 A4): weighted
frequency count with per-group top-n.

Reference semantics (``word_wizard.py:430-511``): extract ORG
entities from title/description/body, weight them title×3,
description×2, body×1, keep the top-5 per cluster. (The reference
bug that weights the description *text* instead of its orgs —
``word_wizard.py:501`` — is fixed here per SURVEY §7 hard-parts.)

The entity extractor is a deterministic gazetteer stand-in (lexicon
alternation via regexp_extract_all — the same mechanism as the
reference's spaCy EntityRuler patterns, ``word_wizard.py:463-471``)
so the weighted-top-n RELATIONAL shape — explode entities with
weight → groupBy(cluster, org) sum(weight) → rank ≤ 5 — is
oracle-checkable; the spaCy model path drops into ml/inference.py
without changing this plan.

Scale: one shuffle on (label, org) with map-side partial sums, one
top-n window over k×orgs rows. The regex runs pre-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.suite import register

# gazetteer lexicon (EntityRuler-style): word-boundary alternation;
# the synthetic corpus is lowercase so capitalization NER would be
# vacuous — lexicon matching exercises the identical relational plan
ORG_LEXICON = ("spark", "customer", "supplier", "vector", "stream", "window")
ORG_PATTERN = r"\b(" + "|".join(ORG_LEXICON) + r")\b"
# reference weighting: title ×3, description ×2, interest/body ×1
# (word_wizard.py:499-507); sections fabricated from text spans
SECTIONS = [(3, 1, 60), (2, 61, 140), (1, 201, None)]

_NER_ORACLE = f"""
WITH d AS (
  SELECT e.label, doc.text
  FROM documents doc JOIN embeddings e ON doc.doc_id = e.vec_id
),
sec AS (
  SELECT label, 3 AS w, substr(text, 1, 60) AS t FROM d
  UNION ALL SELECT label, 2 AS w, substr(text, 61, 140) AS t FROM d
  UNION ALL SELECT label, 1 AS w, substr(text, 201) AS t FROM d
),
orgs AS (
  SELECT label, w,
         unnest(regexp_extract_all(t, '{ORG_PATTERN}', 1)) AS org
  FROM sec
),
counts AS (
  SELECT label, org, CAST(sum(w) AS BIGINT) AS weight
  FROM orgs GROUP BY label, org
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY label
            ORDER BY weight DESC, org ASC) AS INT) AS rk
  FROM counts
)
SELECT label, org, weight, rk FROM ranked WHERE rk <= 5
"""


@register("ner_top_orgs", oracle=_NER_ORACLE)
def q_ner_top_orgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.cpu_table(spark, sf_dir, "documents")
    embs = catalog.table(spark, sf_dir, "embeddings").select("vec_id", "label")
    d = docs.join(embs, docs["doc_id"] == embs["vec_id"], "inner")

    sections = F.array(
        *[
            F.struct(
                F.lit(w).alias("w"),
                (
                    F.expr(f"substring(text, {start}, {length})")
                    if length is not None
                    else F.expr(f"substring(text, {start})")
                ).alias("t"),
            )
            for (w, start, length) in SECTIONS
        ]
    )
    orgs = (
        d.select("label", F.explode(sections).alias("sec"))
        .select(
            "label",
            F.col("sec.w").alias("w"),
            F.explode(
                F.regexp_extract_all(F.col("sec.t"), F.lit(ORG_PATTERN), 1)
            ).alias("org"),
        )
    )
    counts = orgs.groupBy("label", "org").agg(F.sum("w").alias("weight"))
    w = Window.partitionBy("label").orderBy(
        F.col("weight").desc(), F.col("org").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("label", "org", "weight", "rk")
    )
