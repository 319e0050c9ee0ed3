"""Flagship query: the MVP notebook reporting query (SURVEY §3.3)
re-expressed over the driver's documents⋈embeddings tables —
window count + window mean + medoid filter + projection."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.operators.analytics import cluster_viz_summary
from miba_2023_capstone_rb_nlp_spark.suite import register

DIM = 64  # embedding dim of the driver's embeddings table

_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
  SELECT label, list(cv ORDER BY i) AS centroid FROM (
    SELECT label, i, floor((sum(v[i]) / count(*)) * 1000000.0) / 1000000.0 AS cv
    FROM e, (SELECT unnest(generate_series(1, {DIM})) AS i) idx
    GROUP BY label, i
  ) GROUP BY label
),
d AS (
  SELECT e.vec_id, e.label, e.v,
         floor(sqrt(list_sum([(e.v[i]-c.centroid[i])*(e.v[i]-c.centroid[i])
                              for i in generate_series(1, {DIM})]))
               * 1000000.0) / 1000000.0 AS dist
  FROM e JOIN cent c USING (label)
),
flagged AS (
  SELECT d.*,
         row_number() OVER (PARTITION BY label ORDER BY dist ASC, vec_id ASC) AS rn
  FROM d
),
enr AS (
  SELECT f.label AS cluster,
         count(*) OVER (PARTITION BY f.label) AS size,
         f.v[1] AS x,
         f.v[2] AS y,
         floor((CAST(sum(doc.n_chars) OVER (PARTITION BY f.label) AS DOUBLE)
                / count(*) OVER (PARTITION BY f.label)) * 10000.0) / 10000.0
           AS mean_chars,
         f.dist, doc.doc_id, doc.text, f.rn
  FROM flagged f JOIN documents doc ON doc.doc_id = f.vec_id
)
SELECT cluster, size, x, y, mean_chars, dist, doc_id, text
FROM enr WHERE rn <= 2
"""


@register("cluster_viz_summary", oracle=_ORACLE)
def q_cluster_viz_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    embs = catalog.table(spark, sf_dir, "embeddings")
    return cluster_viz_summary(docs, embs, n_med=2, dim=DIM)
