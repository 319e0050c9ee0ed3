"""Content-cleaning stage (SURVEY §2.8 F1-F7, §2.2 P3-P7) as pure
Catalyst column expressions — the reference's ``content_cleaner.py``
re-expressed declaratively.

Behavioral spec (constants + step order) from the reference,
``content_cleaner.py:40-131``; implementation is Spark-native.
Pandas null semantics are preserved exactly:
  - ``NaN > x`` is false → Spark ``when`` with null condition falls
    through, matching the reference's mask behavior (including the
    harsh "one side null ⇒ coalesce to ''" quirk at
    ``content_cleaner.py:110-113``);
  - ``Series.replace(pat, NaN, regex=True)`` nulls on a *search*
    match anywhere in the string (verified against pandas 2.x) →
    ``when(col.rlike(pat), None)``.

Everything is a single narrow projection chain — no shuffle, fully
pipelined inside one WholeStageCodegen span, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.lets import let2, piped

# Regex constants per content_cleaner.py:56-66 (public reference).
WEBSITE_PATTERN = r"(?:http[s]?://)?www\.[^\s.]+\.[^\s]{2,}|^https?:\/\/.*[\r\n]*"
EMAIL_PATTERN = r"[\w.-]+@[\w.-]+\.[\w.-]+"
PHONE_PATTERN = r"\+?\d{1,2}[-.\s]?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}"
INDENT_PATTERN = r"\n|\t| +"
HTML_PATTERN = r"<.*?>"
EMPTY_STRING_PATTERN = r"^\s*$"
REPLACEMENT_PATTERN = rf"(?:{INDENT_PATTERN}|{HTML_PATTERN})"
REMOVAL_PATTERN = rf"(?:{WEBSITE_PATTERN}|{EMAIL_PATTERN}|{PHONE_PATTERN}|{HTML_PATTERN})"

# Phrase list per content_cleaner.py:72-78.
UNDESIREABLE_PHRASES = [
    "javascript", "cookie", "cookies", "explorer", "are you a robot", "subscribe",
    "register", "login", "sign in", "sign up", "log in", "sign out", "log out",
    "privacy", "terms", "contact", "about", "help", "feedback", "careers",
    "advertise", "rate us", "subscribe to unlock", "give us feedback",
    "free download", "all rights reserved", "©", "about us", "contact us",
    "privacy policy",
]
PHRASE_PATTERN = "(?i)(?:" + "|".join(UNDESIREABLE_PHRASES) + ")"

# Length thresholds per content_cleaner.py:88-94.
MIN_TITLE_LEN = 20
MIN_DESCRIPTION_LEN = 100
MIN_BODY_LEN = 400
MIN_PARAGRAPH_LEN = 150

CLEAN_COLUMNS = [
    "article_index", "engine", "link", "source",
    "title", "description", "body", "paragraph",
]


def _normalize_ws(c: Column) -> Column:
    """F1: whitespace/HTML → single space, then trim."""
    return F.trim(F.regexp_replace(c, REPLACEMENT_PATTERN, " "))


def _null_if_contains(c: Column, pattern: str) -> Column:
    """F2/F6: search-match anywhere ⇒ NULL (pandas semantics)."""
    return F.when(c.rlike(pattern), F.lit(None)).otherwise(c)


def _null_if_short(c: Column, min_len: int) -> Column:
    """F3: too short ⇒ NULL (null length falls through → stays null)."""
    return F.when(F.length(c) < min_len, F.lit(None)).otherwise(c)


def _longest_or_empty(a: Column, b: Column) -> Column:
    """F5: strictly-longer side wins; ties AND any-null ⇒ '' (exact
    pandas-mask parity, content_cleaner.py:106-113)."""
    return (
        F.when(F.length(a) > F.length(b), a)
        .when(F.length(a) < F.length(b), b)
        .otherwise(F.lit(""))
    )


def clean_articles(df: DataFrame) -> DataFrame:
    """Full cleaning chain over the raw joined article table.

    Input schema (post-join, post-explode; see operators/pipeline.py):
    article_index, engine, se_link, se_title, se_description,
    se_source, n3k_title, n3k_body, bs_title, bs_body, paragraph.
    Output: the canonical 8-column clean table
    (content_cleaner.py:128).

    Every output column is built as ONE single-evaluation pipeline via
    functions.lets (transform-array let bindings): stacked
    ``when(..).otherwise(c)`` stages otherwise re-evaluate their input
    up to 2^depth times per row after CollapseProject inlining — the
    body-column regex normalization measured ~30× duplicated. The
    whole chain stays one narrow projection: no shuffle, no cache,
    linear scaling.
    """

    def fill(c: Column) -> Column:
        return F.coalesce(c, F.lit(""))  # content_cleaner.py:41

    def ws(c: Column) -> Column:  # F1, content_cleaner.py:69-70
        return _normalize_ws(c)

    def phrases(c: Column) -> Column:  # F2, content_cleaner.py:81-85
        return _null_if_contains(c, PHRASE_PATTERN)

    def short(k: int):  # F3, content_cleaner.py:88-94
        return lambda c: _null_if_short(c, k)

    def removal(c: Column) -> Column:  # F6, content_cleaner.py:121-122
        return _null_if_contains(c, REMOVAL_PATTERN)

    def empty(c: Column) -> Column:  # F7, content_cleaner.py:124-126
        return _null_if_contains(c, EMPTY_STRING_PATTERN)

    # per-source-column chains (each input evaluated exactly once)
    n3k_title = piped(
        F.col("n3k_title"), fill, ws, phrases, short(MIN_TITLE_LEN)
    )
    bs_title = piped(
        F.col("bs_title"), fill, ws, phrases, short(MIN_TITLE_LEN)
    )
    se_title = piped(  # no ws-normalization for se_title in reference
        F.col("se_title"), fill, phrases, short(MIN_TITLE_LEN)
    )
    description = piped(
        F.col("description"),
        fill, ws, phrases, short(MIN_DESCRIPTION_LEN), removal, empty,
    )
    paragraph = piped(
        F.col("paragraph"),
        fill, ws, phrases, short(MIN_PARAGRAPH_LEN), removal, empty,
    )
    n3k_body = piped(F.col("n3k_body"), fill, ws, short(MIN_BODY_LEN))
    bs_body = piped(F.col("bs_body"), fill, ws, short(MIN_BODY_LEN))

    # F5 longest-of-two coalesce + se_title override
    # (content_cleaner.py:106-118)
    body = piped(let2(n3k_body, bs_body, _longest_or_empty), empty)
    title = piped(
        let2(
            se_title,
            let2(n3k_title, bs_title, _longest_or_empty),
            lambda s, t: F.when(F.length(s) > F.length(t), s).otherwise(t),
        ),
        removal,
        empty,
    )

    out = df.withColumnRenamed("se_description", "description").select(
        F.col("article_index"),
        fill(F.col("engine")).alias("engine"),
        fill(F.col("se_link")).alias("link"),
        fill(F.col("se_source")).alias("source"),
        title.alias("title"),
        description.alias("description"),
        body.alias("body"),
        paragraph.alias("paragraph"),
    )
    # P6 projection order + P7 dropna (content_cleaner.py:128-129)
    return out.select(*CLEAN_COLUMNS).na.drop(
        subset=["title", "description", "body", "paragraph"]
    )
