"""c-TF-IDF topic modelling (SURVEY §2.9 M10) as pure DataFrame math.

Reference formula (word_wizard.py:607-626): per class c and term t,
  tf(t,c)  = count(t in c) / total_terms(c)
  idf(t)   = ln(m / total_count(t))        [m = total document count]
  score    = tf * idf
top-n terms per class. The reference computes this on a driver-local
(k × vocab) matrix; here it's explode → two partial-aggregated
shuffles (class,term) and (term) → window top-n, which scales to any
vocabulary/corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed
from miba_2023_capstone_rb_nlp_spark.functions.text import tokens


def ctfidf_topics(
    df: DataFrame,
    class_col: str,
    text_col: str,
    doc_id_col: str,
    top_n: int = 20,
    scale: int = 6,
) -> DataFrame:
    """→ DataFrame[class_col, term, score, rk] with rk ≤ top_n.

    Deterministic: exact integer counts; score quantized; ties broken
    by term. The A3 group-concat of the reference collapses into the
    explode+count (concatenating then re-splitting is a no-op
    relationally — we skip the 100TB-hostile giant-string step).
    """
    tok = df.select(
        F.col(class_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    counts = tok.groupBy(class_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    w_class = Window.partitionBy(class_col)
    w_term = Window.partitionBy("term")
    m_df = df.select(F.count(F.col(doc_id_col)).alias("m"))
    scored = (
        counts.withColumn("class_total", F.sum("cnt").over(w_class))
        .withColumn("term_total", F.sum("cnt").over(w_term))
        .crossJoin(F.broadcast(m_df))
        .withColumn(
            "score",
            fixed(
                (F.col("cnt").cast("double") / F.col("class_total"))
                * F.log(F.col("m").cast("double") / F.col("term_total")),
                scale,
            ),
        )
    )
    rw = Window.partitionBy(class_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") <= top_n)
        .select(class_col, "term", "cnt", "score", "rk")
    )
