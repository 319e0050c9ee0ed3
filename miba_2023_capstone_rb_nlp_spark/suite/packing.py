"""Training-batch assembly suite: sequence packing, hash-based
train/val/test splits, and temperature-based mixture resampling —
the last mile of a pretraining data pipeline (after cleaning, dedup,
and sampling, the corpus must become fixed-budget sequences drawn
from a tuned source mixture).

All three are engine-deterministic by construction (md5-derived
splits, integer fixed-point mixture weights) so each carries a full
DuckDB oracle, and all three are scale-shaped: packing is one window
shuffle on the stratum key, the split profile is a map-only hash +
one aggregation, the mixture table aggregates to |sources| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.functions.text import md5_long, token_count
from miba_2023_capstone_rb_nlp_spark.suite import register

SEQ_BUDGET = 2048  # tokens per packed training sequence
TRAIN_PCT = 80
VAL_PCT = 10  # test = remainder
DRAW_BUDGET = 10000  # total draws allocated across sources
ALPHA_SQRT = True  # temperature alpha = 0.5 (sqrt scaling)

_PACKING_ORACLE = f"""
WITH toks AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS tok
  FROM documents
),
cum AS (
  SELECT lang, doc_id, tok,
         sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tok
  FROM toks
),
assigned AS (
  SELECT lang, tok,
         CAST(floor((cum_tok - tok) / {SEQ_BUDGET}.0) AS BIGINT) AS seq_id
  FROM cum
)
SELECT lang, seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS seq_tokens
FROM assigned
GROUP BY lang, seq_id
"""


@register("sequence_packing", oracle=_PACKING_ORACLE)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous greedy sequence packing: within each ``lang``
    stratum, documents (in doc_id order) fill fixed token-budget
    training sequences; a document starts in the sequence its running
    token offset falls into.

    This is the deterministic, shuffle-minimal packing a distributed
    pipeline actually uses — true first-fit bin packing is inherently
    sequential, while offset-based assignment needs exactly ONE window
    shuffle on the stratum key and is reproducible across runs and
    partitionings. Output is the per-sequence manifest (doc count +
    real token payload per sequence).
    """
    d = catalog.cpu_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = d.select("lang", "doc_id", token_count(F.col("text")).alias("tok"))
    assigned = toks.select(
        "lang",
        "tok",
        F.floor(
            (F.sum("tok").over(w) - F.col("tok")) / F.lit(float(SEQ_BUDGET))
        )
        .cast("bigint")
        .alias("seq_id"),
    )
    return assigned.groupBy("lang", "seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("seq_tokens"),
    )


_SPLIT_ORACLE = f"""
WITH b AS (
  SELECT lang, n_chars,
         CAST(('0x' || substr(md5('split:' || doc_id), 1, 15)) AS BIGINT)
           % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM b
GROUP BY split
"""


@register("hash_split_profile", oracle=_SPLIT_ORACLE)
def q_hash_split_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by keyed md5 bucket
    (80/10/10) plus the per-split profile.

    The assignment is a pure map — no RNG state, no shuffle, stable
    under reruns and repartitioning, and documents keep their split
    forever as the corpus grows (the property that prevents test-set
    leakage across pipeline versions). The profile is one aggregation
    over 3 groups.
    """
    d = catalog.cpu_table(spark, sf_dir, "documents")
    bucket = (
        md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % 100
    )
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
    )


_MIXTURE_ORACLE = f"""
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY source
),
tot AS (SELECT sum(n_docs) AS total FROM counts),
wts AS (
  SELECT c.source, c.n_docs,
         CAST(floor(sqrt(c.n_docs / t.total) * 1000000000.0) AS BIGINT)
           AS w_fixed
  FROM counts c CROSS JOIN tot t
)
SELECT source, n_docs, w_fixed,
       CAST(({DRAW_BUDGET} * w_fixed) // (sum(w_fixed) OVER ()) AS BIGINT)
         AS expected_draws
FROM wts
"""


@register("temperature_resample", oracle=_MIXTURE_ORACLE)
def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (alpha = 0.5): each
    source's sampling weight is p^alpha of its corpus share —
    up-weighting rare sources, down-weighting dominant ones — and the
    draw budget is allocated proportionally.

    Parity is exact by construction: the only irrational step (sqrt,
    correctly rounded under IEEE-754 in both engines) is immediately
    floored to integer nano-units, and the allocation is pure BIGINT
    arithmetic (integer division) from there — no float summation
    order anywhere. Scale shape: one |sources|-row aggregate and two
    1-row broadcast scalars (total docs, total weight) — no global
    single-partition window.
    """
    d = catalog.cpu_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").alias("total"))
    wts = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.floor(
            F.sqrt(F.col("n_docs") / F.col("total")) * F.lit(1000000000.0)
        )
        .cast("bigint")
        .alias("w_fixed"),
    )
    sum_w = wts.agg(F.sum("w_fixed").alias("sum_w"))
    return (
        wts.crossJoin(F.broadcast(sum_w))
        .select(
            "source",
            "n_docs",
            "w_fixed",
            F.expr(f"({DRAW_BUDGET} * w_fixed) div sum_w")
            .cast("bigint")
            .alias("expected_draws"),
        )
    )


# --- token-window chunking (long-doc → training-sample windows) ----
CHUNK_WINDOW = 64  # tokens per chunk
CHUNK_STRIDE = 48  # window step (overlap = WINDOW - STRIDE)

_CHUNK_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT doc_id, w,
         unnest(range(0, greatest(len(w) - 1, 0) + 1, {CHUNK_STRIDE})) AS st
  FROM t
)
SELECT doc_id,
       CAST(floor(st / {CHUNK_STRIDE}.0) AS INT) AS chunk_id,
       CAST(st AS BIGINT) AS start_tok,
       CAST(len(w[st + 1: st + {CHUNK_WINDOW}]) AS BIGINT) AS n_tokens,
       md5(array_to_string(w[st + 1: st + {CHUNK_WINDOW}], ' ')) AS chunk_md5
FROM s
"""


@register("doc_chunk_windows", oracle=_CHUNK_ORACLE)
def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking: long documents become
    fixed-budget overlapping training samples (window 64, stride 48 →
    16-token overlap carries context across boundaries). Map-only:
    tokenize → posexplode a stepped start-index sequence → slice.
    No shuffle; at 100 TB the fan-out is bounded by ~n_tokens/stride
    chunks per doc and each chunk row carries an md5 instead of the
    text, so the exploded output stays narrow. chunk_id derives from
    the start offset (start/stride) — no window function needed.
    Complements ``sequence_packing``: chunking splits over-long docs,
    packing fills under-full sequences."""
    # NULL text is filtered on BOTH sides: un-filtered, Spark's
    # concat_ws over a null array yields md5('') where DuckDB's
    # array_to_string yields NULL — a latent cross-engine divergence
    # (no current testdata generation has null text, but a future one
    # might)
    docs = catalog.cpu_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = F.split(F.col("text"), " ")
    d = docs.select("doc_id", w.alias("w")).withColumn(
        "st",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.size("w") - 1, F.lit(0)),
                F.lit(CHUNK_STRIDE),
            )
        ),
    )
    chunk = F.slice(F.col("w"), F.col("st") + 1, CHUNK_WINDOW)
    return d.select(
        "doc_id",
        F.floor(F.col("st") / float(CHUNK_STRIDE)).cast("int").alias("chunk_id"),
        F.col("st").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )
