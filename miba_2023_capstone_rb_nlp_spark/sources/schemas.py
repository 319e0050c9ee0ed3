"""Declared StructTypes for every pipeline stage (SURVEY §1.1-1.2).

The reference's schema is dynamic/inferred (columns appear as method
side effects, discovered by string probing); here every stage has a
fixed declared schema — presence checks become schema checks.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# link_extractor.py:192-198
LINKS_SCHEMA = StructType(
    [
        StructField("engine", StringType(), False),
        StructField("se_link", StringType(), True),
        StructField("se_title", StringType(), True),
        StructField("se_description", StringType(), True),
        StructField("se_source", StringType(), True),
    ]
)

# content_extractor.py:127-145
RAW_CONTENT_SCHEMA = StructType(
    [
        StructField("n3k_link", StringType(), True),
        StructField("n3k_title", StringType(), True),
        StructField("n3k_body", StringType(), True),
        StructField("n3k_author", ArrayType(StringType()), True),
        StructField("n3k_published", TimestampType(), True),
        StructField("bs_link", StringType(), True),
        StructField("bs_title", StringType(), True),
        StructField("bs_body", StringType(), True),
        StructField("bs_paragraph", ArrayType(StringType()), True),
    ]
)

# content_cleaner.py:128
CLEAN_SCHEMA = StructType(
    [
        StructField("article_index", LongType(), False),
        StructField("engine", StringType(), True),
        StructField("link", StringType(), True),
        StructField("source", StringType(), True),
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("body", StringType(), True),
        StructField("paragraph", StringType(), True),
    ]
)
