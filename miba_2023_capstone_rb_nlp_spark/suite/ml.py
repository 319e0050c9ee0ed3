"""ML-stage suite: deterministic stand-ins are oracle-paired
(hash embeddings, distinct-join sentiment, medoid summaries); the
kmeans/PCA entries run the real fits and emit witness rows a DuckDB
oracle checks (VERDICT r10 #4); round 11 extends the same witness
recipe to the full WordWizard chain, so every registry entry is now
oracle-checked — the chain's label-dependent output verifies through
assignment-invariant aggregates (Σ cluster sizes, the size-weighted
sentiment total) the oracle recomputes from the clean table, plus
constant-true invariants of the fitted/enriched result."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.ml.clustering import kmeans_assign
from miba_2023_capstone_rb_nlp_spark.ml.embeddings import hash_embeddings
from miba_2023_capstone_rb_nlp_spark.ml.inference import (
    apply_on_distinct,
    sentiment_stub,
)
from miba_2023_capstone_rb_nlp_spark.ml.reduce import pca_reduce
from miba_2023_capstone_rb_nlp_spark.ml.summarize import summarize_medoids_stub
from miba_2023_capstone_rb_nlp_spark.operators.analytics import with_medoids
from miba_2023_capstone_rb_nlp_spark.suite import register

DIM = 8  # hash-embedding dim
EDIM = 64  # embeddings-table dim


def _docs(spark, sf_dir):
    return catalog.table(spark, sf_dir, "documents")


# --- hash embeddings (M1/M2 deterministic stand-in) ----------------
def _hash_emb_oracle() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN hv % {DIM} = {d} THEN sgn ELSE 0 END) AS s{d}"
        for d in range(DIM)
    )
    norm = " + ".join(
        f"CAST(s{d} AS DOUBLE) * s{d}" for d in range(DIM)
    )
    elems = ",\n       ".join(
        f"CASE WHEN _n > 0 THEN floor((s{d} / _n) * 1000000.0) / 1000000.0 "
        f"ELSE 0.0 END AS e{d}"
        for d in range(DIM)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
h AS (
  SELECT doc_id, hv,
         CASE WHEN (hv >> 10) & 1 = 1 THEN 1 ELSE -1 END AS sgn
  FROM (SELECT doc_id,
               CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS hv
        FROM tok)
),
s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
n AS (SELECT *, sqrt({norm}) AS _n FROM s)
SELECT doc_id, {elems} FROM n
"""


@register("hash_embeddings", oracle=_hash_emb_oracle())
def q_hash_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = hash_embeddings(
        _docs(spark, sf_dir).select("doc_id", "text"), "text", "doc_id", dim=DIM
    )
    return out.select(
        "doc_id",
        *[
            F.element_at("hash_embedding", d + 1).alias(f"e{d}")
            for d in range(DIM)
        ],
    )


# --- sentiment with distinct→infer→join (J4/M7) --------------------
_SENTIMENT_ORACLE = """
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 3 AS DOUBLE)
         AS sentiment
FROM documents
"""


@register("sentiment_distinct_join", oracle=_SENTIMENT_ORACLE)
def q_sentiment_distinct_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 rewrite: infer on distinct texts only, exact join back —
    replaces the reference's positional fan-out (word_wizard.py:
    421-426) with an order-independent plan."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    out = apply_on_distinct(
        d, "text", lambda x: sentiment_stub(x, "text"), ["sentiment"]
    )
    return out.select("doc_id", "sentiment")


# --- medoid summaries (M5+M6 narrowed computation) ------------------
_MEDOID_SUMMARY_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cent AS (
  SELECT label, list(cv ORDER BY i) AS centroid FROM (
    SELECT label, i, floor((sum(v[i]) / count(v[i])) * 1000000.0) / 1000000.0 AS cv
    FROM e, (SELECT unnest(generate_series(1, {EDIM})) AS i) idx
    GROUP BY label, i
  ) GROUP BY label
),
d AS (
  SELECT e.vec_id, e.label,
         floor(sqrt(list_sum([(e.v[i]-c.centroid[i])*(e.v[i]-c.centroid[i])
                              for i in generate_series(1, {EDIM})]))
               * 1000000.0) / 1000000.0 AS dist
  FROM e JOIN cent c USING (label)
),
flagged AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY label
                            ORDER BY dist ASC, vec_id ASC) <= 2 AS is_medoid
  FROM d
)
SELECT f.vec_id, f.label, f.is_medoid,
       CASE WHEN f.is_medoid
            THEN array_to_string((string_split(doc.text, ' '))[1:12], ' ')
            ELSE NULL END AS summary
FROM flagged f JOIN documents doc ON doc.doc_id = f.vec_id
"""


@register("medoid_summaries", oracle=_MEDOID_SUMMARY_ORACLE)
def q_medoid_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medoid flag + head-truncation summary per doc.

    Decide-small shape (optimization guide §2.3/§8, r15): the medoid
    window runs over embeddings ALONE — (vec_id, label, dist) is all
    that crosses the label exchange — and ``text`` attaches by ONE
    id join afterwards, exactly the oracle's structure (its
    ``flagged`` CTE has no documents join). The old plan joined text
    in first, so the window exchange carried text + the 64-dim array;
    with the summary now an inline expression (summarize stub, r15)
    the join-back that doubled the whole upstream is gone too."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    embs = catalog.table(spark, sf_dir, "embeddings")
    flagged = with_medoids(
        embs, "embedding", "label", id_col="vec_id", n_med=2, dim=EDIM
    ).select("vec_id", "label", "is_medoid")
    joined = flagged.join(docs, flagged["vec_id"] == docs["doc_id"], "inner")
    out = summarize_medoids_stub(joined, "text", "vec_id", n_tokens=12)
    return out.select("vec_id", "label", "is_medoid", "summary")


# --- MLlib stages: witness-oracled (VERDICT r10 #4) -----------------
# The fits themselves are not SQL-expressible (seeded Lloyd's /
# eigendecomposition), so instead of rows-only assignment dumps these
# entries run the REAL clustering/reduction and emit WITNESS rows the
# DuckDB oracle can check: genuinely SQL-recomputable values (row
# counts; the exact-decimal total-variance the per-dim dim-stats
# recipe produces) next to Spark-verified invariants of the fitted
# output (law-of-total-variance bounds, orthonormality, centering)
# that the oracle pins as constant-true rows. A silent value bug in
# the assignment/projection flips a boolean witness to 0.0 → a red
# hash row, which rows-only checks could never produce. Raw
# assignments/coords remain covered by the partition-invariance lane
# (tests/test_partition_invariance.py) and test_ml_plumbing.py.

# Per-dim quantized variance, the exact textual recipe of
# embedding_dim_stats' proven-green oracle, reduced to one scalar.
_EMB_VAR_CTE = """
WITH x AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
agg AS (
  SELECT dim, count(*) AS n,
         CAST(sum(CAST(floor(v * 1000000.0) / 1000000.0
                       AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(floor(v * v * 100000000.0) / 100000000.0
                       AS DECIMAL(18,8))) AS DOUBLE) AS s2
  FROM x GROUP BY dim
),
vr AS (
  SELECT n,
         floor((s2 / n - (floor(s1 / n * 1000000.0) / 1000000.0)
                          * (floor(s1 / n * 1000000.0) / 1000000.0))
               * 1000000.0) / 1000000.0 AS variance
  FROM agg
)
"""

_KMEANS_WITNESS_ORACLE = f"""
{_EMB_VAR_CTE},
t AS (
  SELECT CAST(sum(CAST(variance AS DECIMAL(18,6))) * max(n) AS DOUBLE)
    AS tss_q
  FROM vr
)
SELECT 'n_assigned' AS witness,
       CAST((SELECT count(*) FROM embeddings) AS DOUBLE) AS value
UNION ALL SELECT 'tss_q', (SELECT tss_q FROM t)
UNION ALL SELECT 'sizes_sum_eq_n', 1.0
UNION ALL SELECT 'clusters_used_le_k', 1.0
UNION ALL SELECT 'wss_nonneg', 1.0
UNION ALL SELECT 'wss_le_tss', 1.0
"""


def _witness_rows(one_row: DataFrame, pairs: list) -> DataFrame:
    """Explode a 1-row frame of named expressions into (witness,
    value) rows — one job, no driver-side collect."""
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("witness"), expr.cast("double").alias("value")
            )
            for name, expr in pairs
        ]
    )
    return one_row.select(F.explode(arr).alias("_w")).select(
        F.col("_w.witness").alias("witness"), F.col("_w.value").alias("value")
    )


@register("kmeans_clusters", oracle=_KMEANS_WITNESS_ORACLE)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded KMeans (M3) with oracle-checkable witnesses: runs the
    real adaptive fit + codegen assignment, then derives (a)
    ``n_assigned`` and the exact-decimal ``tss_q`` — values DuckDB
    recomputes independently — and (b) invariants of the actual
    labels (sizes sum to n; ≤k clusters used; within-cluster SS is
    non-negative and ≤ total SS per the law of total variance),
    pinned as constant-true rows. Everything is one lazy plan over
    the persisted assignment — no driver-side collect."""
    from miba_2023_capstone_rb_nlp_spark.functions.numeric import dec, fixed
    from miba_2023_capstone_rb_nlp_spark.suite import persist_tracked

    e = catalog.table(spark, sf_dir, "embeddings")
    # count() is a parquet metadata read — cheap n_hint for the
    # adaptive init choice (random below 1M fit rows, k-means|| above).
    # r16: the r15 spread_if_narrow wrap was reverted — its
    # .rdd.getNumPartitions() probe finalized the AQE plan before the
    # persist (cached child printed Final+Initial sections) and the
    # driver measured the entry 15% SLOWER with it; at 100 TB the
    # branch was a no-op anyway (input arrives in ≥cores splits).
    assigned = persist_tracked(
        kmeans_assign(e, "embedding", k=10, n_hint=e.count()).select(
            "vec_id",
            "cluster",
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )
    x = assigned.select("cluster", F.posexplode("v").alias("dim", "v"))
    # ONE exploded pass → per-(cluster, dim) float AND quantized-
    # decimal moments; wss, tss_f and tss_q all re-aggregate these
    # k×dim rows through a linear cascade (r15, guide §2.3). The old
    # shape fanned the unpersisted (cluster, dim) aggregate into two
    # consumers and ran a THIRD exploded pass for the decimal recipe,
    # so the 64× explode+aggregate over the corpus executed three
    # times per run. Quantization still happens per ROW before any
    # sum, and decimal addition is associative, so regrouping
    # (cluster, dim) → dim is exact — tss_q is bit-identical to the
    # oracle's single-level sum. The float wss/tss_f reassociation
    # only moves values within the 1e-6 slack their threshold
    # witnesses already carry.
    cdim = x.groupBy("cluster", "dim").agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(dec(fixed(F.col("v"), 6), 6)).alias("q1"),
        F.sum(dec(fixed(F.col("v") * F.col("v"), 8), 8, 18)).alias("q2"),
    )
    dim_tot = cdim.groupBy("dim").agg(
        F.sum("nc").alias("n"),
        F.sum("s1").alias("gs1"),
        F.sum("s2").alias("gs2"),
        F.sum("q1").alias("qq1"),
        F.sum("q2").alias("qq2"),
        F.sum(
            F.col("s2") - F.col("s1") * F.col("s1") / F.col("nc")
        ).alias("wss_d"),
    )
    meanq = fixed(F.col("qq1").cast("double") / F.col("n"), 6)
    per_dim = dim_tot.select(
        "n",
        "wss_d",
        (F.col("gs2") - F.col("gs1") * F.col("gs1") / F.col("n")).alias(
            "tss_d"
        ),
        fixed(
            F.col("qq2").cast("double") / F.col("n") - meanq * meanq, 6
        ).alias("variance"),
    )
    moments = per_dim.agg(
        F.sum("wss_d").alias("wss"),
        F.sum("tss_d").alias("tss_f"),
        (F.sum(dec(F.col("variance"), 6)) * F.max("n"))
        .cast("double")
        .alias("tss_q"),
    )
    sizes_df = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.sum("sz").alias("sum_sz"), F.count(F.lit(1)).alias("k_used"))
    )
    n_df = assigned.agg(F.count(F.lit(1)).alias("n_assigned"))
    one = n_df.crossJoin(sizes_df).crossJoin(moments)
    return _witness_rows(
        one,
        [
            ("n_assigned", F.col("n_assigned")),
            ("tss_q", F.col("tss_q")),
            ("sizes_sum_eq_n", F.col("sum_sz") == F.col("n_assigned")),
            ("clusters_used_le_k", F.col("k_used") <= F.lit(10)),
            ("wss_nonneg", F.col("wss") >= F.lit(-1e-6)),
            (
                "wss_le_tss",
                F.col("wss")
                <= F.col("tss_f") * F.lit(1.0 + 1e-9) + F.lit(1e-6),
            ),
        ],
    )


_PCA_WITNESS_ORACLE = f"""
{_EMB_VAR_CTE},
t AS (
  SELECT CAST(sum(CAST(variance AS DECIMAL(18,6))) AS DOUBLE)
    AS total_var_q
  FROM vr
)
SELECT 'n_rows' AS witness,
       CAST((SELECT count(*) FROM embeddings) AS DOUBLE) AS value
UNION ALL SELECT 'total_var_q', (SELECT total_var_q FROM t)
UNION ALL SELECT 'components_orthonormal', 1.0
UNION ALL SELECT 'coords_centered', 1.0
UNION ALL SELECT 'explained_nonneg', 1.0
UNION ALL SELECT 'explained_le_total', 1.0
"""


@register("pca_coords", oracle=_PCA_WITNESS_ORACLE)
def q_pca_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed one-pass PCA (M9 scale path) with oracle-checkable
    witnesses: runs the real moment-pass fit + codegen projection,
    then emits (a) ``n_rows`` and the exact-decimal ``total_var_q``
    the oracle recomputes, and (b) invariants of the fitted output —
    WᵀW = I within 1e-6 (driver-side on the d×k component matrix the
    fit already holds), projected coords mean-centered (the folded
    centering offsets are exact), and explained variance
    Var(x)+Var(y) in [0, total] (an orthonormal projection cannot
    capture more variance than the data holds — catches unnormalized
    components and scale bugs). A NaN anywhere poisons a comparison
    to false → red row."""
    import numpy as np

    from miba_2023_capstone_rb_nlp_spark.functions.numeric import dec
    from miba_2023_capstone_rb_nlp_spark.ml.reduce import pca_components
    from miba_2023_capstone_rb_nlp_spark.suite import persist_tracked

    e = catalog.table(spark, sf_dir, "embeddings")
    # ONE persisted base feeds the fit action and every witness
    # branch: without it the entry's final plan scanned the parquet
    # three times (projection + two moment passes) and the fit twice
    # more — at corpus scale that is 5 reads of the dominant table
    # for one diagnostic row set. The fit runs once (components are
    # reused by the projection via the fit/transform split) and the
    # lazy witness plan reads only the cache (pinned in test_plans).
    # r16: spread_if_narrow reverted here too (same reasons as
    # kmeans_clusters — AQE-finalizing probe, driver-measured 17%
    # regression, structural no-op at scale).
    base = persist_tracked(
        e.select(F.col("embedding").cast("array<double>").alias("emb"))
    )
    mean_w = pca_components(base, "emb", 2)
    w = mean_w[1]
    ortho = float(
        np.abs(w.T @ w - np.eye(w.shape[1])).max() <= 1e-6
    )
    out = pca_reduce(base, "emb", n_components=2, components=mean_w).select(
        F.element_at("reduced_dimensions", 1).alias("x"),
        F.element_at("reduced_dimensions", 2).alias("y"),
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # ONE exploded pass (r15, guide §2.3): float and quantized-decimal
    # per-dim moments come out of the same groupBy — the old shape ran
    # the 64× explode+aggregate twice (once for the decimal recipe,
    # once for the float total). Per-row quantization and the decimal
    # sums are textually unchanged, so total_var_q is bit-identical.
    from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed

    x = base.select(F.posexplode("emb").alias("dim", "v"))
    qdim = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(dec(fixed(F.col("v"), 6), 6)).alias("q1"),
        F.sum(dec(fixed(F.col("v") * F.col("v"), 8), 8, 18)).alias("q2"),
    )
    meanq = fixed(F.col("q1").cast("double") / F.col("n"), 6)
    per_dim = qdim.select(
        fixed(
            F.col("q2").cast("double") / F.col("n") - meanq * meanq, 6
        ).alias("variance"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / F.col("n")
        ).alias("var_f"),
    )
    tots = per_dim.agg(
        F.sum(dec(F.col("variance"), 6)).cast("double").alias("total_var_q"),
        F.sum("var_f").alias("total_var_f"),
    )
    one = stats.crossJoin(tots)
    explained = (
        F.col("sxx") / F.col("n")
        - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))
    ) + (
        F.col("syy") / F.col("n")
        - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))
    )
    return _witness_rows(
        one,
        [
            ("n_rows", F.col("n")),
            ("total_var_q", F.col("total_var_q")),
            ("components_orthonormal", F.lit(ortho)),
            (
                "coords_centered",
                (F.abs(F.col("sx") / F.col("n")) <= F.lit(1e-5))
                & (F.abs(F.col("sy") / F.col("n")) <= F.lit(1e-5)),
            ),
            ("explained_nonneg", explained >= F.lit(-1e-6)),
            (
                "explained_le_total",
                explained
                <= F.col("total_var_f") * F.lit(1.0 + 1e-9) + F.lit(1e-6),
            ),
        ],
    )


# --- W2 medoids: min-avg-pairwise-distance (hdbscan path) ----------
_PAIRWISE_MEDOID_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
p AS (
  SELECT a.vec_id, a.label,
         CAST(floor(sqrt(list_sum(
             [(a.v[i]-b.v[i])*(a.v[i]-b.v[i])
              for i in generate_series(1, {EDIM})])) * 1000000.0) AS BIGINT)
           AS fx
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
),
s AS (
  SELECT vec_id, label, sum(fx) AS sfx, count(*) AS m
  FROM p GROUP BY vec_id, label
),
r AS (
  SELECT label, vec_id,
         floor((CAST(sfx AS DOUBLE) / 1000000.0 / m) * 10000.0) / 10000.0
           AS mean_dist
  FROM s
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY label
            ORDER BY mean_dist ASC, vec_id ASC) AS INT) AS rk
  FROM r
)
SELECT label, vec_id, mean_dist, rk FROM ranked WHERE rk <= 2
"""


@register("pairwise_medoids", oracle=_PAIRWISE_MEDOID_ORACLE)
def q_pairwise_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (reference word_wizard.py:737-746): per-cluster min mean
    pairwise distance, top-2 — the O(n²)-bounded-per-cluster metric,
    vectorized per group (see operators.analytics)."""
    from miba_2023_capstone_rb_nlp_spark.operators.analytics import (
        pairwise_medoid_scores,
    )

    e = catalog.table(spark, sf_dir, "embeddings")
    scores = pairwise_medoid_scores(e, "embedding", "label", "vec_id", dim=EDIM)
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(
        F.col("mean_dist").asc(), F.col("id").asc()
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("label", F.col("id").alias("vec_id"), "mean_dist", "rk")
    )


# --- wizard chain, SQL-expressible stages (VERDICT r4 #6) -----------
def _wizard_stages_oracle() -> str:
    """Oracle for the chain's label-invariant stages: the full ETL
    cleaning oracle feeds the wizard's content-hash row id, the
    per-paragraph hash embedding, and the sentiment stand-in — i.e.
    every stage of the flagship chain EXCEPT the KMeans-dependent
    ones, composed exactly as WordWizard composes them."""
    from miba_2023_capstone_rb_nlp_spark.suite.cleaning import _build_oracle

    sums = ",\n         ".join(
        f"sum(CASE WHEN hv % {DIM} = {d} THEN sgn ELSE 0 END) AS s{d}"
        for d in range(DIM)
    )
    norm = " + ".join(f"CAST(s{d} AS DOUBLE) * s{d}" for d in range(DIM))
    elems = ",\n       ".join(
        f"CASE WHEN _n > 0 THEN floor((s{d} / _n) * 1000000.0) / 1000000.0 "
        f"ELSE 0.0 END AS e{d}"
        for d in range(DIM)
    )
    return f"""
WITH clean AS (
  SELECT * FROM ({_build_oracle()}) q
),
base AS (
  SELECT CAST(('0x' || substr(md5(CAST(article_index AS VARCHAR)
                                  || chr(31) || paragraph), 1, 15)) AS BIGINT)
           AS row_id,
         article_index, paragraph
  FROM clean
),
tok AS (SELECT row_id, unnest(string_split(paragraph, ' ')) AS t FROM base),
h AS (
  SELECT row_id, hv,
         CASE WHEN (hv >> 10) & 1 = 1 THEN 1 ELSE -1 END AS sgn
  FROM (SELECT row_id,
               CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS hv
        FROM tok)
),
s AS (SELECT row_id, {sums} FROM h GROUP BY row_id),
n AS (SELECT *, sqrt({norm}) AS _n FROM s),
emb AS (SELECT row_id, {elems} FROM n)
SELECT b.row_id, b.article_index, b.paragraph,
       CAST(CAST(('0x' || substr(md5(b.paragraph), 1, 15)) AS BIGINT) % 3
            AS DOUBLE) AS sentiment,
       {", ".join(f"e.e{d}" for d in range(DIM))}
FROM base b JOIN emb e USING (row_id)
"""


@register("wizard_chain_stages", oracle=_wizard_stages_oracle())
def q_wizard_chain_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable slice of the flagship chain: ETL clean →
    WordWizard(paragraph) row-id → create_sentence_embeddings →
    find_sentiment, THROUGH the real wizard machinery (same
    constructor, same persisted embedding base, same lean stages the
    full chain uses). Only the KMeans-dependent stages (clusters,
    medoids, topics, reduction) are excluded — those stay rows-only in
    ``wizard_full_chain``; this entry turns the chain's composition
    itself into oracle-checked evidence."""
    from miba_2023_capstone_rb_nlp_spark.suite.cleaning import (
        q_etl_clean_articles,
    )
    from miba_2023_capstone_rb_nlp_spark.wizard import WordWizard

    clean = q_etl_clean_articles(spark, sf_dir)
    wiz = WordWizard(clean, interest="paragraph").create_sentence_embeddings()
    wiz = wiz.find_sentiment()
    return wiz.df.select(
        F.col("_row_id").alias("row_id"),
        "article_index",
        "paragraph",
        F.col("paragraph_sentiment").alias("sentiment"),
        *[
            F.element_at("paragraph_sentence_embeddings", d + 1).alias(f"e{d}")
            for d in range(DIM)
        ],
    )


# --- full WordWizard chain (flagship fluent API, MVP.ipynb cell-8) --
# Chain configuration (ADVICE r11 #1): ONE source of truth for the
# values the entry's chain call, the witness battery and the oracle's
# witness rows all share — previously k=5 / n_med=2 were repeated
# literally at all three sites, so a chain-config change that missed
# one would turn the fail-safe witnesses permanently red.
WIZARD_CHAIN_K = 5  # cluster_embeddings(k=...)
WIZARD_CHAIN_N_MED = 2  # medoid rows surfaced per cluster


def _wizard_witness_oracle() -> str:
    """Witness oracle for the FULL chain (the last rows-only→oracled
    conversion, extending VERDICT r10 #4's recipe): the KMeans labels
    are not SQL-expressible, but two aggregates of the chain's viz
    table are ASSIGNMENT-INVARIANT and recomputable from the clean
    table alone — Σ over clusters of ``size`` is the clean row count
    (every enrichment is 1:1, every row lands in exactly one cluster,
    every non-empty cluster surfaces ≥1 medoid row), and Σ of
    ``size × sentiment`` telescopes the per-cluster means back to the
    corpus sentiment total, which the md5-stub formula (proven green
    in wizard_chain_stages) computes row-wise. The rest are
    constant-true invariants of the fitted/enriched output the oracle
    pins as 1.0 rows."""
    from miba_2023_capstone_rb_nlp_spark.suite.cleaning import _build_oracle

    return f"""
WITH clean AS (
  SELECT * FROM ({_build_oracle()}) q
),
s AS (
  SELECT count(*) AS n,
         COALESCE(sum(CAST(CAST(('0x' || substr(md5(paragraph), 1, 15))
                                AS BIGINT) % 3
                           AS DOUBLE)), 0.0) AS sent
  FROM clean
)
SELECT 'clusters_le_k' AS witness, 1.0 AS value
UNION ALL SELECT 'coords_finite', 1.0
UNION ALL SELECT 'enrichment_present', 1.0
UNION ALL SELECT 'entities_le_5', 1.0
UNION ALL SELECT 'medoid_paragraphs_in_corpus', 1.0
UNION ALL SELECT 'medoids_per_cluster_le_{WIZARD_CHAIN_N_MED}', 1.0
UNION ALL SELECT 'sentiment_sum_q', (SELECT round(sent, 3) FROM s)
UNION ALL SELECT 'topics_top5_sorted', 1.0
UNION ALL SELECT 'total_size', (SELECT CAST(n AS DOUBLE) FROM s)
"""


@register("wizard_full_chain", oracle=_wizard_witness_oracle())
def q_wizard_full_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical end-to-end run: ETL clean table →
    embeddings → clustering → NER → medoid summaries → sentiment →
    topics → 2-D reduction → the notebook reporting projection
    (viz_summary), WITNESS-ORACLED since r11 (the registry's last
    rows-only conversion). The chain runs unchanged; the entry then
    verifies the real viz table through (a) two values DuckDB
    recomputes independently of the cluster assignment —
    ``total_size`` (Σ cluster sizes = clean row count) and
    ``sentiment_sum_q`` (Σ size×mean-sentiment = the corpus md5-stub
    total) — and (b) invariants of the enriched output pinned as
    constant-true rows: ≤k clusters, ≤n_med medoid rows per cluster,
    finite 2-D coordinates, ≤5 entities / ≤5 rank-sorted topics per
    cluster, and every medoid paragraph verbatim from the corpus
    (tiny side broadcast, clean streams — the scale-correct shape).
    A silent value bug in ANY stage now flips a witness → a red hash
    row, which the old rows-only dump could never produce. The raw
    8-column viz table stays covered by the flagship entry
    ``cluster_viz_summary`` (hash-green every round it's checked),
    the stage-by-stage ``wizard_chain_stages`` oracle, and the
    partition-invariance lane."""
    from miba_2023_capstone_rb_nlp_spark.suite import persist_tracked
    from miba_2023_capstone_rb_nlp_spark.suite.cleaning import (
        q_etl_clean_articles,
    )
    from miba_2023_capstone_rb_nlp_spark.wizard import WordWizard

    # persisted because TWO consumers scan it: the chain's embedding
    # stage and the corpus-membership probe below (otherwise the
    # probe re-runs the whole ETL regex pipeline)
    clean = persist_tracked(q_etl_clean_articles(spark, sf_dir))
    wiz = (
        WordWizard(clean, interest="paragraph")
        .create_sentence_embeddings()
        .cluster_embeddings(k=WIZARD_CHAIN_K, n_med=WIZARD_CHAIN_N_MED)
        .entitiy_recognition()
        .summarize_medoids()
        .find_sentiment()
        .topic_modelling()
        .reduce_demensionality()
    )
    # ≤ k×n_med rows — repartition(1) (an exchange of ≤10 POST-filter
    # rows; coalesce(1) would instead collapse the upstream
    # window+projection into one task) + persist + materialize so
    # every witness branch is a one-task scan of ONE chain execution.
    # The count() is a bounded driver boundary (≤10 rows, like the
    # chain's own sizing count): without it the branches race the
    # cache population inside a single job and each recomputes the
    # full chain lineage (measured 3× the entry cost at sf0.1); the
    # per-job fixed overhead also argues for FEW branches, so the
    # row- and cluster-level invariants fold into one two-level
    # aggregation and the corpus probe into one union frame.
    out = persist_tracked(wiz.viz_summary().repartition(1))
    out.count()
    return wizard_chain_witnesses(out, clean)


def wizard_chain_witnesses(out: DataFrame, clean: DataFrame) -> DataFrame:
    """(viz table, clean table) → the 9 (witness, value) rows the
    oracle checks (thresholds from WIZARD_CHAIN_K / WIZARD_CHAIN_N_MED
    — the same constants the chain call site uses, ADVICE r11 #1). Factored out of the entry so the sensitivity lane
    (tests/test_ml_plumbing.py) can feed it CORRUPTED viz tables and
    assert each invariant actually flips — the 'a silent value bug
    flips a witness' claim is itself tested, not just the happy
    path."""
    # adjacent-pair slice: scores must be non-increasing down the
    # rank-sorted top-5 (rounding is monotone, so the viz round(…,3)
    # preserves the c-TF-IDF rank order)
    n_pairs = F.greatest(F.size("topics") - F.lit(1), F.lit(0))
    topics_sorted = F.forall(
        F.zip_with(
            F.slice(F.col("topics"), F.lit(1), n_pairs),
            F.slice(F.col("topics"), F.lit(2), n_pairs),
            lambda a, b: a["score"] >= b["score"],
        ),
        lambda ok: ok,
    )
    per_cluster = out.groupBy("cluster").agg(
        # size/sentiment are cluster-constant window values — first()
        # reads the shared value, count() the medoid fan-out
        F.first("size").alias("sz"),
        F.first("sentiment").alias("sent"),
        F.count(F.lit(1)).alias("n_med"),
        F.min(
            # finite = non-null AND not NaN AND not ±Inf (abs<inf is
            # false for NaN too under Spark's NaN-is-largest ordering,
            # but the explicit isnan keeps the intent readable)
            F.when(
                F.col("x").isNotNull()
                & F.col("y").isNotNull()
                & ~F.isnan("x")
                & ~F.isnan("y")
                & (F.abs("x") < F.lit(float("inf")))
                & (F.abs("y") < F.lit(float("inf"))),
                F.lit(1.0),
            ).otherwise(F.lit(0.0))
        ).alias("coords_ok"),
        F.min(
            F.when(F.col("entities").isNull(), F.lit(1.0))
            .when(F.size("entities") <= 5, F.lit(1.0))
            .otherwise(F.lit(0.0))
        ).alias("ents_ok"),
        F.min(
            F.when(F.col("topics").isNull(), F.lit(1.0))
            .when((F.size("topics") <= 5) & topics_sorted, F.lit(1.0))
            .otherwise(F.lit(0.0))
        ).alias("tops_ok"),
        # NULL rows are vacuously fine for the bound checks above (a
        # cluster with no org matches legitimately carries NULL
        # entities), so enrichment PRESENCE is pinned separately:
        # per-cluster flags feeding the existential witness below
        # (ADVICE r11 #2 — a regression nulling a whole enrichment
        # column must flip a witness, not pass vacuously)
        F.max(
            F.when(F.col("entities").isNotNull(), F.lit(1.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("ents_present"),
        F.max(
            F.when(F.col("topics").isNotNull(), F.lit(1.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("tops_present"),
    )
    # coalesce every NULL-on-empty aggregate to its vacuous value (0
    # totals, true invariants) so a 0-row clean table reads green on
    # both sides instead of mismatching NULL vs the oracle's pinned
    # constants — the oracle COALESCEs its sentiment sum to match
    head = per_cluster.agg(
        F.coalesce(F.sum("sz").cast("double"), F.lit(0.0)).alias(
            "total_size"
        ),
        # round(), not the usual fixed() floor: the true value is an
        # exact INTEGER (class ids 0/1/2 summed over the corpus) and
        # size×mean reintroduces ≤1e-11 of error on EITHER side —
        # floor would snap integer−ε down a whole unit, while a
        # half-boundary (x.0005) that could split Spark/DuckDB
        # rounding cannot occur at integer±1e-11
        F.coalesce(
            F.round(F.sum(F.col("sz") * F.col("sent")), 3), F.lit(0.0)
        ).alias("sent_sum_q"),
        (F.count(F.lit(1)) <= F.lit(WIZARD_CHAIN_K)).alias("clusters_le_k"),
        F.coalesce(
            F.max("n_med") <= F.lit(WIZARD_CHAIN_N_MED), F.lit(True)
        ).alias("med_le_2"),
        F.coalesce(F.min("coords_ok"), F.lit(1.0)).alias("coords_finite"),
        F.coalesce(F.min("ents_ok"), F.lit(1.0)).alias("entities_le_5"),
        F.coalesce(F.min("tops_ok"), F.lit(1.0)).alias("topics_ok"),
        # existential, not universal: ≥1 cluster carries non-NULL
        # entities AND ≥1 carries non-NULL topics (vacuously true
        # only on an EMPTY viz table) — scale-robust (a single
        # org-free cluster stays green) yet red when a chain
        # regression nulls an enrichment column corpus-wide
        F.coalesce(
            (F.max("ents_present") + F.max("tops_present")) == F.lit(2.0),
            F.lit(True),
        ).alias("enrichment_present"),
    )
    # corpus membership: inline the ≤k×n_med medoid paragraphs as
    # literals and STREAM the corpus once (never the reverse — clean
    # scales, medoids don't). The collect is bounded by construction
    # (the viz table is ≤k×n_med rows, persisted and counted by the
    # entry) — the same bounded-query-broadcast contract the kNN
    # operators pin. |matches| == |medoid set| ⇔ every medoid
    # paragraph appears verbatim in the corpus. The old shape derived
    # the same boolean lazily through distinct→broadcast-semi→
    # distinct→union→agg — four scheduled jobs and three exchanges
    # per run where ONE aggregate over the clean cache suffices
    # (collect_set is bounded by the ≤k×n_med match set, so the
    # partial aggregation ships at most that many strings per
    # partition).
    paras = [
        r[0] for r in out.select("paragraph").distinct().collect()
    ]
    probe = clean.agg(
        (
            F.size(
                F.collect_set(
                    F.when(F.col("paragraph").isin(paras), F.col("paragraph"))
                )
            )
            == F.lit(len(paras))
        ).alias("in_corpus")
    )
    one = head.crossJoin(probe)
    return _witness_rows(
        one,
        [
            ("clusters_le_k", F.col("clusters_le_k")),
            ("coords_finite", F.col("coords_finite")),
            ("enrichment_present", F.col("enrichment_present")),
            ("entities_le_5", F.col("entities_le_5")),
            ("medoid_paragraphs_in_corpus", F.col("in_corpus")),
            (
                f"medoids_per_cluster_le_{WIZARD_CHAIN_N_MED}",
                F.col("med_le_2"),
            ),
            ("sentiment_sum_q", F.col("sent_sum_q")),
            ("topics_top5_sorted", F.col("topics_ok")),
            ("total_size", F.col("total_size")),
        ],
    )


# --- embedding column health profile --------------------------------
# Vector-QA for the similarity/clustering stack: per-dimension mean,
# variance and zero fraction across the corpus — the check that
# catches dead dims, collapsed encoders and scale drift before they
# poison ANN recall. float32 values are exact in double; each value
# and its square are floor-quantized then DECIMAL-summed (order-free),
# the variance derives as E[x²]−mean² in a fixed textual order.
_DIM_STATS_ORACLE = """
WITH x AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
agg AS (
  SELECT dim, count(*) AS n,
         CAST(sum(CAST(floor(v * 1000000.0) / 1000000.0
                       AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(floor(v * v * 100000000.0) / 100000000.0
                       AS DECIMAL(18,8))) AS DOUBLE) AS s2,
         sum(CASE WHEN v = 0.0 THEN 1 ELSE 0 END) AS n_zero
  FROM x GROUP BY dim
)
SELECT CAST(dim AS INT) AS dim, n,
       floor(s1 / n * 1000000.0) / 1000000.0 AS mean,
       floor((s2 / n - (floor(s1 / n * 1000000.0) / 1000000.0)
                        * (floor(s1 / n * 1000000.0) / 1000000.0))
             * 1000000.0) / 1000000.0 AS variance,
       floor(CAST(n_zero AS DOUBLE) / n * 1000000.0) / 1000000.0
         AS zero_frac
FROM agg
"""


@register("embedding_dim_stats", oracle=_DIM_STATS_ORACLE)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (mean/variance/zero-rate).

    Plan: posexplode fans each vector into (dim, value) pairs
    map-only; ONE aggregate on dim (64 groups — map-side combine
    collapses each partition to 64 rows before the exchange). Output
    is |dims| rows at any corpus size.
    """
    from miba_2023_capstone_rb_nlp_spark.functions.numeric import dec, fixed

    e = catalog.table(spark, sf_dir, "embeddings")
    x = e.select(
        F.posexplode("embedding").alias("dim", "vf")
    ).select("dim", F.col("vf").cast("double").alias("v"))
    agg = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(fixed(F.col("v"), 6), 6)).cast("double").alias("s1"),
        F.sum(dec(fixed(F.col("v") * F.col("v"), 8), 8, 18))
        .cast("double")
        .alias("s2"),
        F.sum(F.when(F.col("v") == 0.0, 1).otherwise(0)).alias("n_zero"),
    )
    mean = fixed(F.col("s1") / F.col("n"), 6)
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        mean.alias("mean"),
        fixed(F.col("s2") / F.col("n") - mean * mean, 6).alias("variance"),
        fixed(F.col("n_zero").cast("double") / F.col("n"), 6).alias("zero_frac"),
    )
