"""Topic-modelling suite: c-TF-IDF per language class over documents
(M10), plus the A3 ordered group-concat it replaces."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.operators.ctfidf import ctfidf_topics
from miba_2023_capstone_rb_nlp_spark.suite import register

_CTFIDF_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
),
counts AS (
  SELECT lang, term, count(*) AS cnt FROM tok GROUP BY lang, term
),
tot AS (
  SELECT *, sum(cnt) OVER (PARTITION BY lang) AS class_total,
            sum(cnt) OVER (PARTITION BY term) AS term_total
  FROM counts
),
m AS (SELECT count(doc_id) AS m FROM documents),
scored AS (
  SELECT lang, term, cnt,
         floor((CAST(cnt AS DOUBLE) / class_total)
               * ln(CAST(m.m AS DOUBLE) / term_total) * 1000000.0) / 1000000.0
           AS score
  FROM tot, m
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY score DESC, term ASC) AS rk
  FROM scored
)
SELECT lang, term, cnt, score, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 20
"""


@register("ctfidf_topics_per_lang", oracle=_CTFIDF_ORACLE)
def q_ctfidf_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = catalog.table(spark, sf_dir, "documents")
    return ctfidf_topics(d, "lang", "text", "doc_id", top_n=20)


_GROUP_CONCAT_ORACLE = """
SELECT lang, string_agg(substr(text, 1, 40), ' ' ORDER BY doc_id) AS combined,
       count(*) AS n_docs
FROM documents GROUP BY lang
"""


@register("group_concat_docs", oracle=_GROUP_CONCAT_ORACLE)
def q_group_concat_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (group string-concat, word_wizard.py:632) with explicit
    ordering — collect_list order is shuffle-dependent, so we sort
    (doc_id, prefix) structs before joining."""
    d = catalog.table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("doc_id"), F.substring("text", 1, 40).alias("s"))
                    )
                ),
                lambda x: x["s"],
            ),
        ).alias("combined"),
        F.count(F.lit(1)).alias("n_docs"),
    )
