"""Corpus retrieval suite: BM25 ranked search and corpus n-gram
frequency — the inverted-index primitives of a training-data pipeline
(query-based decontamination, corpus exploration, quality probes).

Both are pure Catalyst plans (explode → partial-agg → broadcast join),
no UDFs, no collected driver state:

- BM25 builds the posting list lazily: the term filter lands BEFORE
  the (doc, term) aggregation, so only query-term postings ever
  shuffle — at 100 TB the shuffled volume is O(matching postings),
  not O(corpus tokens). df/idf is a ≤|query| row broadcast; the
  global avgdl scalar is a 1-row broadcast cross join; final top-k is
  TakeOrderedAndProject (per-partition heads, no global sort).
- Per-term scores are floored to integer micro-units BEFORE the
  per-doc sum, so the aggregation is exact integer math — immune to
  float summation-order divergence between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.functions.text import word_ngrams
from miba_2023_capstone_rb_nlp_spark.suite import register

QUERY_TERMS = ("spark", "join", "window", "scan", "filter")
K1 = 1.2
B = 0.75
TOP_K = 20
BIGRAM_TOP_K = 50

_terms_sql = ", ".join(f"'{t}'" for t in QUERY_TERMS)

_BM25_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
dls AS (SELECT doc_id, len(t) AS dl, t FROM base),
stats AS (SELECT sum(dl) AS sum_dl, count(*) AS n_docs FROM dls),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM dls)
  WHERE term IN ({_terms_sql})
  GROUP BY doc_id, dl, term
),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT f.doc_id,
         CAST(floor(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (f.tf * {K1 + 1.0})
           / (f.tf + {K1} * (1.0 - {B} + {B} * f.dl / (s.sum_dl / s.n_docs)))
           * 1000000.0) AS BIGINT) AS term_score_micro
  FROM tf f JOIN dft d USING (term) CROSS JOIN stats s
)
SELECT doc_id,
       CAST(sum(term_score_micro) AS BIGINT) AS score_micro,
       CAST(count(*) AS INT) AS n_terms
FROM scored
GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC
LIMIT {TOP_K}
"""


@register("bm25_topk", oracle=_BM25_ORACLE)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, Lucene idf) top-k documents for a fixed
    query over ``documents``.

    Scale shape: the `isin(query_terms)` filter sits between the
    explode and the groupBy, so the partial aggregation (map-side
    combine) only ever sees query-term tokens; df and avgdl are tiny
    broadcasts; the top-k compiles to TakeOrderedAndProject, never a
    single-partition global sort.
    """
    d = catalog.cpu_table(spark, sf_dir, "documents")
    dls = d.select(
        "doc_id",
        F.split(F.lower(F.col("text")), " ").alias("t"),
    ).select("doc_id", F.size("t").alias("dl"), "t")
    stats = dls.agg(
        F.sum("dl").alias("sum_dl"), F.count("*").alias("n_docs")
    )
    tf = (
        dls.select("doc_id", "dl", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(K1) * (
        F.lit(1.0 - B)
        + F.lit(B) * F.col("dl") / (F.col("sum_dl") / F.col("n_docs"))
    )
    term_score = F.floor(
        idf * (F.col("tf") * F.lit(K1 + 1.0)) / denom * F.lit(1000000.0)
    ).cast("bigint")
    return (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score_micro"))
        .groupBy("doc_id")
        .agg(
            F.sum("term_score_micro").cast("bigint").alias("score_micro"),
            F.count("*").cast("int").alias("n_terms"),
        )
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(TOP_K)
    )


_BIGRAM_ORACLE = f"""
WITH base AS (
  SELECT string_split(lower(text), ' ') AS t FROM documents
),
grams AS (
  SELECT unnest([array_to_string(t[i:i+1], ' ')
                 for i in generate_series(1, len(t) - 1)]) AS bigram
  FROM base
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM grams
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT {BIGRAM_TOP_K}
"""


@register("bigram_topk", oracle=_BIGRAM_ORACLE)
def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequency table, top-k — the language-model
    n-gram statistic (and the repetition/boilerplate probe) over the
    whole corpus.

    `word_ngrams` builds shingles with `transform` over an index
    sequence (no per-token explode until the single explode here), the
    count is a map-side-combined groupBy on the bigram string, and the
    top-k is TakeOrderedAndProject. Wordcount shape — linear scale-out.
    """
    d = catalog.cpu_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(word_ngrams(F.lower(F.col("text")), 2)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(BIGRAM_TOP_K)
    )


# --- positional inverted index: exact phrase search -----------------
# The postings-with-positions primitive BM25 lacks: find documents
# containing the exact phrase, by adjacency-joining per-term position
# lists. The term filters land BEFORE the explode output shuffles, so
# at any corpus size only the phrase terms' postings move — the join
# graph is |phrase|-1 equi-joins on (doc_id, pos±k), each bounded by
# the rarest term's posting list.
PHRASE = ("slow", "hash", "batch")

_PHRASE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
pos AS (
  SELECT doc_id, i AS p, l[i] AS w
  FROM tok, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) r
  WHERE l[i] IN ('{PHRASE[0]}', '{PHRASE[1]}', '{PHRASE[2]}')
),
hits AS (
  SELECT t0.doc_id, t0.p AS start_pos
  FROM pos t0
  JOIN pos t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
  JOIN pos t2 ON t2.doc_id = t0.doc_id AND t2.p = t0.p + 2
  WHERE t0.w = '{PHRASE[0]}' AND t1.w = '{PHRASE[1]}'
    AND t2.w = '{PHRASE[2]}'
)
SELECT doc_id, count(*) AS n_matches,
       CAST(min(start_pos) AS BIGINT) AS first_pos
FROM hits GROUP BY doc_id
"""


@register("phrase_match_docs", oracle=_PHRASE_ORACLE)
def q_phrase_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-term phrase search over a positional posting list.

    Plan: posexplode builds (doc, pos, term) postings; the IN-filter
    on the three phrase terms prunes the stream BEFORE any exchange
    (pushed into the generate's output, so non-phrase tokens never
    shuffle); two self-equi-joins on (doc_id, pos+offset) assemble
    adjacency; ONE per-doc count agg. 1-indexed positions match the
    SQL oracle's list indexing.
    """
    from miba_2023_capstone_rb_nlp_spark.functions.text import tokens

    docs = catalog.cpu_table(spark, sf_dir, "documents")
    pos = (
        docs.select(
            "doc_id", F.posexplode(tokens(F.col("text"))).alias("p0", "w")
        )
        .filter(F.col("w").isin(*PHRASE))
        .select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    )
    t0 = pos.filter(F.col("w") == PHRASE[0]).select("doc_id", "p")
    t1 = pos.filter(F.col("w") == PHRASE[1]).select(
        "doc_id", (F.col("p") - 1).alias("p")
    )
    t2 = pos.filter(F.col("w") == PHRASE[2]).select(
        "doc_id", (F.col("p") - 2).alias("p")
    )
    hits = t0.join(t1, ["doc_id", "p"]).join(t2, ["doc_id", "p"])
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p").cast("bigint").alias("first_pos"),
    )
