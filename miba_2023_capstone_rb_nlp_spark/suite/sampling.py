"""Training-data curation suite: deterministic stratified sampling
and winnowing fingerprints over ``documents`` — the two curation
primitives a 100 TB pretraining pipeline runs constantly (balance
strata, then near-match detection inside the sample).

Both are engine-deterministic (md5-derived pseudo-randomness, no RNG
state) so they carry full DuckDB oracles, and both are scale-shaped:
rate sampling is a pure filter (map-only, no shuffle), exact-k
sampling is one window shuffle on the stratum key, winnowing is a
map-only pass until the final explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.functions.text import (
    md5_long,
    shingle_hashes,
    winnow_from_hashes,
)
from miba_2023_capstone_rb_nlp_spark.suite import persist_tracked, register

K_PER_STRATUM = 25
RATE_PERMILLE = 100  # 10% hash-threshold sample

_STRATIFIED_ORACLE = f"""
WITH h AS (
  SELECT lang, doc_id,
         CAST(('0x' || substr(md5('smp:' || doc_id), 1, 15)) AS BIGINT) AS hv,
         CAST(('0x' || substr(md5('rate:' || doc_id), 1, 15)) AS BIGINT)
           % 1000 < {RATE_PERMILLE} AS in_rate_sample
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, in_rate_sample,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY hv ASC, doc_id ASC) AS INT) AS smp_rank
  FROM h
)
SELECT lang, doc_id, smp_rank, in_rate_sample
FROM ranked WHERE smp_rank <= {K_PER_STRATUM}
"""


@register("stratified_sample_docs", oracle=_STRATIFIED_ORACLE)
def q_stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling, two idioms in one entry:

    - exact-k per stratum: rank rows inside each ``lang`` by a keyed
      md5 (a seeded permutation without RNG state — reproducible
      across engines, runs, and partitionings), keep the first k.
      One window shuffle on the stratum key; skewed strata are
      AQE-splittable because the hash order is uniform.
    - rate sampling flag: md5('rate:'||id) mod 1000 < 100 ⇒ a 10%
      Bernoulli sample as a PURE FILTER — the idiom to reach for at
      100 TB when exact stratum counts aren't required, because it
      pushes to the scan and never shuffles.
    """
    d = catalog.cpu_table(spark, sf_dir, "documents")
    hv = md5_long(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
    rate = (
        md5_long(F.concat(F.lit("rate:"), F.col("doc_id").cast("string")))
        % 1000
        < RATE_PERMILLE
    )
    w = Window.partitionBy("lang").orderBy(F.col("_hv").asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", hv.alias("_hv"), rate.alias("in_rate_sample"))
        .withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= K_PER_STRATUM)
        .select("lang", "doc_id", "smp_rank", "in_rate_sample")
    )


_WINNOW_ORACLE = """
WITH p AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         [CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 15))
               AS BIGINT)
          for i in generate_series(1, len(t) - 2)] AS h
  FROM p
),
f AS (
  SELECT doc_id,
         CASE WHEN len(h) = 0 THEN []
              WHEN len(h) < 4 THEN [list_min(h)]
              ELSE list_distinct([list_min(h[j:j+3])
                                  for j in generate_series(1, len(h) - 3)])
         END AS fps
  FROM sh
)
SELECT doc_id, unnest(fps) AS fingerprint FROM f
"""


@register("winnowing_fingerprints", oracle=_WINNOW_ORACLE)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (n=3-gram shingles, w=4 windows) per
    document — the local-match detection primitive (any shared run of
    ≥ 6 tokens shares a fingerprint). Map-only until the explode;
    downstream equi-join on ``fingerprint`` turns this into a
    plagiarism/near-match pair generator with the same shape as the
    shingle join in dedup/jaccard.

    Two-projection shape on purpose: the shingle-hash array is
    materialized first so the windowed minima slide over a column
    reference instead of re-hashing every shingle per window (the
    inlined form is O(windows × shingles) md5 calls per doc — ~10×
    slower at sf0.1)."""
    d = catalog.cpu_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", shingle_hashes(F.col("text"), n=3).alias("_sh"))
        .select(
            "doc_id",
            F.explode(winnow_from_hashes(F.col("_sh"), w=4)).alias(
                "fingerprint"
            ),
        )
    )


# --- DSIR-style importance selection (Xie et al. 2023) --------------
# Hashed-unigram importance weights: per token-bucket b,
#   lw(b) = ln( p_target(b) / p_corpus(b) )  with add-one smoothing
# over _DSIR_BUCKETS hashed buckets (hashing is what bounds the
# feature table at ANY corpus size — the paper's own device); a doc's
# score is the sum of its tokens' lw, and selection is the threshold
# rule score > corpus-mean score ("more target-like than the average
# document") — the mean is ONE 1-row aggregate broadcast back, so the
# selection step is a map-only decision with no global sort (the
# paper's Gumbel resampling needs a global order; the threshold
# variant is the scale-shaped analog). An absolute score > 0 rule
# would be vacuous here: the bucket smoothing dominates the tiny
# synthetic counts and pushes every score negative.
#
# Determinism across engines: the only transcendental (ln) is applied
# to an IEEE-identical double ratio once per BUCKET (≤4096 rows), and
# its output is floor-quantized at 1e-4 BEFORE the per-doc sum, which
# is an exact DECIMAL sum (order-free). Spark F.log == DuckDB ln
# (natural log) on identical input doubles.
_DSIR_BUCKETS = 4096
_DSIR_TARGET = "src0"

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
  FROM documents
),
tb AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % {_DSIR_BUCKETS}
           AS b
  FROM tok
),
counts AS (
  SELECT b,
         count(*) FILTER (WHERE source = '{_DSIR_TARGET}') AS ct,
         count(*) AS cs
  FROM tb GROUP BY b
),
tot AS (SELECT sum(ct) AS tt, sum(cs) AS ts FROM counts),
feat AS (
  SELECT b,
         floor(ln(((ct + 1.0) / (tt + {_DSIR_BUCKETS}.0)) /
                  ((cs + 1.0) / (ts + {_DSIR_BUCKETS}.0))) * 10000.0)
           / 10000.0 AS lw
  FROM counts, tot
),
per AS (
  SELECT tb.doc_id, tb.source,
         count(*) AS n_tokens,
         CAST(sum(CAST(feat.lw AS DECIMAL(18,4))) AS DOUBLE) AS score
  FROM tb JOIN feat USING (b)
  GROUP BY tb.doc_id, tb.source
),
mean AS (
  SELECT floor(CAST(sum(CAST(score AS DECIMAL(18,4))) AS DOUBLE)
               / count(score) * 1000000.0) / 1000000.0 AS thr
  FROM per
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       score, score > thr AS selected
FROM per, mean
"""


@register("dsir_importance_select", oracle=_DSIR_ORACLE)
def q_dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection for LM pretraining via importance weights:
    hashed-unigram log-likelihood ratio of a target domain
    (source = src0) vs the whole corpus, summed per doc (exact
    decimal sum of per-bucket quantized weights), selected when
    above the corpus-mean score. Plan: tokenize+md5 the corpus ONCE
    into a persisted per-doc bucket-count table (the paper's own
    materialization — a hashed doc-feature matrix, ≤ n_docs × 4096
    rows regardless of corpus size); both the global bucket counts
    and the per-doc scores derive from that table, so the raw token
    stream is scanned exactly once. Downstream: a 1-row totals
    broadcast, the ≤4096-row feature table broadcast back, ONE
    per-doc agg, a 1-row mean broadcast."""

    from miba_2023_capstone_rb_nlp_spark.functions.numeric import davg, dec
    from miba_2023_capstone_rb_nlp_spark.functions.text import tokens

    docs = catalog.cpu_table(spark, sf_dir, "documents")
    tb = docs.select(
        "doc_id",
        "source",
        F.explode(tokens(F.col("text"))).alias("w"),
    ).select(
        "doc_id",
        "source",
        (md5_long(F.col("w")) % _DSIR_BUCKETS).alias("b"),
    )
    # per-doc hashed feature counts: the ONE exchange the token
    # stream pays (map-side combine collapses tokens to doc×bucket
    # pairs before the shuffle)
    per_db = (
        tb.groupBy("doc_id", "source", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_db = persist_tracked(per_db)
    counts = per_db.groupBy("b").agg(
        F.sum(F.when(F.col("source") == _DSIR_TARGET, F.col("c")).otherwise(0)).alias("ct"),
        F.sum("c").alias("cs"),
    )
    tot = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cs").alias("ts")
    )
    nb = float(_DSIR_BUCKETS)
    feat = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.floor(
                F.log(
                    ((F.col("ct") + 1.0) / (F.col("tt") + nb))
                    / ((F.col("cs") + 1.0) / (F.col("ts") + nb))
                )
                * 10000.0
            )
            / 10000.0
        ).alias("lw"),
    )
    # score = Σ_tokens lw = Σ_buckets c·lw; c × DECIMAL(18,4) is an
    # exact decimal product, so the sum equals the oracle's
    # token-row decimal sum bit-for-bit
    # r16: persisted — the mean-threshold pass and the final select
    # both consume this frame, and without the persist each re-ran
    # the broadcast join + per-doc aggregate over the cached feature
    # matrix (2 InMemoryTableScan→join→agg pipelines in the executed
    # plan). O(n_docs) rows, the same budget class as the kmeans
    # persisted assignment.
    per = persist_tracked(
        per_db.join(F.broadcast(feat), "b", "inner")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * dec("lw", 4)).cast("double").alias("score"),
        )
    )
    mean = per.agg(davg("score", scale_in=4, scale_out=6).alias("thr"))
    return per.crossJoin(F.broadcast(mean)).select(
        "doc_id", "source", "n_tokens", "score",
        (F.col("score") > F.col("thr")).alias("selected"),
    )


# --- Efraimidis-Spirakis weighted sampling without replacement --------
# The quality-weighted subset selector (Efraimidis & Spirakis 2006):
# each item draws key u^(1/w) with u uniform and w its weight; the
# global top-k by key IS an exact weighted sample without replacement.
# Engine determinism: u comes from the suite's md5 recipe (no RNG
# state), and the rank uses ln(u)/w — the same ordering as u^(1/w)
# (ln is monotone) with no pow() in either engine — floor-quantized at
# 1e-6 so a last-ulp ln() disagreement cannot reorder the boundary,
# ties broken by doc_id. At 100 TB this is a map-only scan feeding
# TakeOrderedAndProject: per-partition top-k heaps, never a global
# sort; k rows reach the driver.
ES_K = 200
_TWO60 = "1152921504606846976.0"  # 2^60, the md5_long range
_ES_WEIGHTED_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) + 1 AS w,
         floor(ln((CAST(CAST(('0x' || substr(md5('esw:' || doc_id), 1, 15))
                        AS BIGINT) AS DOUBLE) + 1.0) / {_TWO60})
               / (CAST(length(text) AS DOUBLE) + 1.0)
               * 1000000.0) / 1000000.0 AS es_key
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, w, es_key
FROM keyed
ORDER BY es_key DESC, doc_id ASC
LIMIT {ES_K}
"""


@register("weighted_sample_docs", oracle=_ES_WEIGHTED_ORACLE)
def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sample without replacement: top-200 documents by
    the Efraimidis-Spirakis key with weight = length(text)+1 — longer
    documents proportionally likelier, selection reproducible from
    doc_id alone.

    Plan: ONE narrow map-only projection (md5, ln, divide — all
    codegen) into TakeOrderedAndProject: each partition keeps a k-row
    heap and only k rows cross to the driver. No shuffle, no window.
    Longest-first or rate sampling can't do weighted-without-
    replacement; temperature_resample reweights BETWEEN sources,
    this selects WITHIN a corpus by per-item weight.

    Residual cross-engine risk (ADVICE r8 #4, accepted): determinism
    rests on JVM Math.log and DuckDB libm ln agreeing after the 1e-6
    floor-quantization. Top-k SET membership is more fragile than the
    value-only entries using the same recipe — a last-ulp ln()
    disagreement landing EXACTLY on a quantum boundary for the rank-
    200/201 pair could swap them. No such collision exists in the
    test corpora (keys near the cut differ by >>1 quantum), and the
    quantization makes the window ~2^-32 of key space per item; an
    integer-only key (rank on hash<<w) would change the estimator, so
    the float recipe stays."""
    docs = catalog.table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    hv = md5_long(F.concat(F.lit("esw:"), F.col("doc_id").cast("string")))
    w = F.length("text").cast("bigint") + F.lit(1)
    u = (hv.cast("double") + F.lit(1.0)) / F.lit(float(2**60))
    key = F.floor(
        F.log(u) / w.cast("double") * F.lit(1000000.0)
    ).cast("double") / F.lit(1000000.0)
    return (
        docs.select(
            "doc_id", w.alias("w"), key.alias("es_key")
        )
        .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
        .limit(ES_K)
    )
