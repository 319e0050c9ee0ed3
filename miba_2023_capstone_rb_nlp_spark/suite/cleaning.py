"""ETL pipeline suite queries: fabricate a deterministic links/content
pair from ``documents`` (shared SQL, identical in Spark SQL and
DuckDB), then run the real pipeline operators: P1 filter → J1 join →
posexplode (L4/P8) → full cleaning chain (F1-F7, P3-P7).

The fabrication injects the cleaner's trigger cases (FIXTURES.md:
phrases, emails, html, tabs/double-spaces, strings straddling the
20/100/150/400 length cutoffs) so every cleaning rule has a
non-trivial hit rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.operators import cleaning
from miba_2023_capstone_rb_nlp_spark.operators.pipeline import assemble_articles
from miba_2023_capstone_rb_nlp_spark.suite import register

# --- shared fabrication SQL (valid in BOTH Spark SQL and DuckDB) ----
LINKS_SQL = """
SELECT
  CAST(doc_id AS BIGINT) AS article_index,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Google' WHEN 1 THEN 'Bing'
       ELSE 'Yahoo' END AS engine,
  CASE WHEN doc_id % 19 = 0 THEN NULL
       ELSE 'https://news.example.com/' || doc_id END AS se_link,
  CASE WHEN doc_id % 7 = 0 THEN 'Subscribe now ' || substr(text, 1, 60)
       ELSE substr(text, 1, 60) END AS se_title,
  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE substr(text, 1, 150) END
    AS se_description,
  source AS se_source
FROM documents
"""

CONTENT_SQL = """
SELECT
  'https://news.example.com/' || doc_id AS bs_link,
  substr(text, 1, 50) AS n3k_title,
  text || CASE WHEN doc_id % 11 = 0 THEN ' mail me at a.b@example.com'
               ELSE '' END AS n3k_body,
  CASE WHEN doc_id % 13 = 0 THEN '<div>' || substr(text, 3, 55) || '</div>'
       ELSE substr(text, 3, 55) END AS bs_title,
  substr(text, 1, CAST(n_chars AS INT) - 5) || chr(9) || 'tail  words'
    AS bs_body,
  substr(text, 1, 180) AS p0,
  substr(text, 160, 200) AS p1,
  substr(text, 300, 240) AS p2
FROM documents
WHERE doc_id % 17 <> 0
"""

# --- oracle mirror of operators/cleaning.clean_articles -------------
_STR_COLS = [
    "engine", "link", "source", "se_title", "description",
    "n3k_title", "n3k_body", "bs_title", "bs_body", "paragraph",
]
_REPL = cleaning.REPLACEMENT_PATTERN
_PHR = cleaning.PHRASE_PATTERN
_REM = cleaning.REMOVAL_PATTERN
_EMPTY = cleaning.EMPTY_STRING_PATTERN


def _null_contains(c, pat):
    return (
        "CASE WHEN regexp_matches(" + c + ", '" + pat + "') THEN NULL "
        "ELSE " + c + " END AS " + c
    )


def _null_short(c, k):
    return f"CASE WHEN length({c}) < {k} THEN NULL ELSE {c} END AS {c}"


def _build_oracle() -> str:
    fill = ", ".join(f"coalesce({c}, '') AS {c}" for c in _STR_COLS)
    ws_cols = ["n3k_title", "n3k_body", "bs_title", "bs_body", "paragraph", "description"]
    ws = ", ".join(
        "trim(regexp_replace(" + c + ", '" + _REPL + "', ' ', 'g')) AS " + c
        for c in ws_cols
    )
    ws_keep = ", ".join(c for c in _STR_COLS if c not in ws_cols)
    phr_cols = ["n3k_title", "bs_title", "se_title", "paragraph", "description"]
    phr = ", ".join(_null_contains(c, _PHR) for c in phr_cols)
    phr_keep = ", ".join(c for c in _STR_COLS if c not in phr_cols)
    thr = ", ".join(
        _null_short(c, k)
        for c, k in [
            ("n3k_title", 20), ("bs_title", 20), ("se_title", 20),
            ("description", 100), ("bs_body", 400), ("n3k_body", 400),
            ("paragraph", 150),
        ]
    )
    thr_keep = "engine, link, source"
    rem_cols = ["title", "paragraph", "description"]
    rem = ", ".join(_null_contains(c, _REM) for c in rem_cols)
    emp_cols = ["title", "body", "paragraph", "description"]
    emp = ", ".join(_null_contains(c, _EMPTY) for c in emp_cols)
    return f"""
WITH links AS ({LINKS_SQL}),
content AS ({CONTENT_SQL}),
joined AS (
  SELECT l.article_index, l.engine, l.se_link, l.se_title, l.se_description,
         l.se_source, c.*
  FROM links l JOIN content c ON l.se_link = c.bs_link
  WHERE l.se_link IS NOT NULL
),
exploded AS (
  SELECT article_index, engine, se_link AS link, se_title,
         se_description AS description, se_source AS source,
         n3k_title, n3k_body, bs_title, bs_body, p AS paragraph
  FROM joined, (SELECT unnest([1,2,3]) AS pn) pp,
       LATERAL (SELECT CASE pn WHEN 1 THEN p0 WHEN 2 THEN p1 ELSE p2 END AS p) px
),
s0 AS (SELECT article_index, {fill} FROM exploded),
s1 AS (SELECT article_index, {ws_keep}, {ws} FROM s0),
s2 AS (SELECT article_index, {phr_keep}, {phr} FROM s1),
s3 AS (SELECT article_index, {thr_keep}, {thr} FROM s2),
s4 AS (
  SELECT *,
    CASE WHEN length(n3k_body) > length(bs_body) THEN n3k_body
         WHEN length(n3k_body) < length(bs_body) THEN bs_body
         ELSE '' END AS body,
    CASE WHEN length(n3k_title) > length(bs_title) THEN n3k_title
         WHEN length(n3k_title) < length(bs_title) THEN bs_title
         ELSE '' END AS title0
  FROM s3
),
s5 AS (
  SELECT *, CASE WHEN length(se_title) > length(title0) THEN se_title
                 ELSE title0 END AS title
  FROM s4
),
s6 AS (SELECT article_index, engine, link, source, body, {rem} FROM s5),
s7 AS (SELECT article_index, engine, link, source, {emp} FROM s6)
SELECT article_index, engine, link, source, title, description, body, paragraph
FROM s7
WHERE title IS NOT NULL AND description IS NOT NULL
  AND body IS NOT NULL AND paragraph IS NOT NULL
"""


def _fabricate(spark: SparkSession, sf_dir: str):
    catalog.table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    links = spark.sql(LINKS_SQL)
    content = spark.sql(CONTENT_SQL).withColumn(
        "bs_paragraph", F.array("p0", "p1", "p2")
    ).drop("p0", "p1", "p2")
    return links, content


# Construction memo: the cleaning chain is a DEEP projection (dozens
# of regex/coalesce expressions), and analyzing it costs ~0.5 s of
# driver-side plan building per call — pure Python/Catalyst overhead,
# re-paid by every consumer (the entry itself, wizard_chain_stages,
# wizard_full_chain, each bench rep). The logical plan for the same
# (session, sf_dir) is immutable, so the built DataFrame is cached
# and reused; no action runs at build time, so this changes nothing
# about execution or caching semantics.
#
# Keyed by SESSION IDENTITY (the object, compared with `is` — not
# applicationId, which spark.newSession() siblings share despite
# having separate temp catalogs/confs) PLUS the documents-table
# source fingerprint (ADVICE r7 #1): the analyzed plan freezes the
# resolved file listing, so regenerating sf_dir mid-session must
# miss the memo and re-resolve instead of reading stale/missing
# files. Bounded FIFO so dead sessions' plans can't accumulate.
_CLEAN_PLAN_MEMO: dict[
    tuple[int, str, str], tuple[SparkSession, DataFrame]
] = {}
_CLEAN_PLAN_MEMO_MAX = 8


@register("etl_clean_articles", oracle=_build_oracle())
def q_etl_clean_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ETL shape: P1 → J1 → posexplode → F1-F7 → P6/P7.

    Parallelism: the single-file scan arrives as ONE partition, which
    would serialize the whole regex chain. Repartitioning the content
    side BEFORE the join lets the broadcast join, the explode, and the
    cleaning projection all pipeline across every core with no
    wide-row exchange afterwards (measured ~5× vs repartitioning the
    exploded rows). The cleaning chain itself stays one narrow
    single-evaluation projection (operators/cleaning.py).
    """
    key = (
        id(spark),
        sf_dir,
        catalog.source_fingerprint(sf_dir, "documents"),
    )
    hit = _CLEAN_PLAN_MEMO.get(key)
    if hit is None or hit[0] is not spark:  # id() reuse after GC
        links, content = _fabricate(spark, sf_dir)
        content = content.repartition(spark.sparkContext.defaultParallelism)
        raw = assemble_articles(links, content).drop("pos", "bs_link")
        while len(_CLEAN_PLAN_MEMO) >= _CLEAN_PLAN_MEMO_MAX:
            _CLEAN_PLAN_MEMO.pop(next(iter(_CLEAN_PLAN_MEMO)))
        hit = (spark, cleaning.clean_articles(raw))
        _CLEAN_PLAN_MEMO[key] = hit
    return hit[1]


_EXPLODE_ORACLE = f"""
WITH links AS ({LINKS_SQL}),
content AS ({CONTENT_SQL})
SELECT l.article_index, CAST(pp.pn - 1 AS INT) AS pos,
       CASE pp.pn WHEN 1 THEN c.p0 WHEN 2 THEN c.p1 ELSE c.p2 END AS paragraph
FROM links l
JOIN content c ON l.se_link = c.bs_link, (SELECT unnest([1,2,3]) AS pn) pp
WHERE l.se_link IS NOT NULL
"""


@register("explode_paragraphs", oracle=_EXPLODE_ORACLE)
def q_explode_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4/P8: posexplode materializes paragraph order as a column."""
    links, content = _fabricate(spark, sf_dir)
    return assemble_articles(links, content).select(
        "article_index", "pos", "paragraph"
    )
