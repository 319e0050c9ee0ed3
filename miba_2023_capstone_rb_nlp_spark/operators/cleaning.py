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
    """
    out = df.na.fill("")  # content_cleaner.py:41
    out = (
        out.withColumnRenamed("se_link", "link")
        .withColumnRenamed("se_description", "description")
        .withColumnRenamed("se_source", "source")
    )
    # F1 whitespace normalization (content_cleaner.py:69-70)
    for c in ["n3k_title", "n3k_body", "bs_title", "bs_body", "paragraph", "description"]:
        out = out.withColumn(c, _normalize_ws(F.col(c)))
    # F2 phrase nulling (content_cleaner.py:81-85)
    for c in ["n3k_title", "bs_title", "se_title", "paragraph", "description"]:
        out = out.withColumn(c, _null_if_contains(F.col(c), PHRASE_PATTERN))
    # F3 length thresholds (content_cleaner.py:88-94)
    for c, k in [
        ("n3k_title", MIN_TITLE_LEN), ("bs_title", MIN_TITLE_LEN),
        ("se_title", MIN_TITLE_LEN), ("description", MIN_DESCRIPTION_LEN),
        ("bs_body", MIN_BODY_LEN), ("n3k_body", MIN_BODY_LEN),
        ("paragraph", MIN_PARAGRAPH_LEN),
    ]:
        out = out.withColumn(c, _null_if_short(F.col(c), k))
    # F5 longest-of-two coalesce + se_title override
    # (content_cleaner.py:106-118)
    out = out.withColumn("body", _longest_or_empty(F.col("n3k_body"), F.col("bs_body")))
    out = out.withColumn("title", _longest_or_empty(F.col("n3k_title"), F.col("bs_title")))
    out = out.withColumn(
        "title",
        F.when(
            F.length("se_title") > F.length("title"), F.col("se_title")
        ).otherwise(F.col("title")),
    )
    # F6 removal patterns on title/paragraph/description
    # (content_cleaner.py:121-122)
    for c in ["title", "paragraph", "description"]:
        out = out.withColumn(c, _null_if_contains(F.col(c), REMOVAL_PATTERN))
    # F7 empty/whitespace-only ⇒ NULL (content_cleaner.py:124-126)
    for c in ["title", "body", "paragraph", "description"]:
        out = out.withColumn(c, _null_if_contains(F.col(c), EMPTY_STRING_PATTERN))
    # P6 projection + P7 dropna (content_cleaner.py:128-129)
    return out.select(*CLEAN_COLUMNS).na.drop(
        subset=["title", "description", "body", "paragraph"]
    )
