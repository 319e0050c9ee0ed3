"""Query suite: every implemented operator from SURVEY.md §2 gets a
named entry pairing a PySpark plan-builder with an equivalent ANSI-SQL
oracle (run by DuckDB on the same parquet). ``__spark_entry__.py``
exposes this registry to the driver.

Conventions (driver contract):
  - spark fn signature: (SparkSession, sf_dir) -> DataFrame
  - every computed column aliased IDENTICALLY in spark + SQL
  - floats rounded at the query boundary so the order-insensitive
    value hash is engine-deterministic
  - flat output schemas (no nested structs) where an oracle exists
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(fn=fn, oracle=oracle)
        return fn

    return deco


def load_suite() -> dict[str, Query]:
    """Import all suite modules (side effect: they register)."""
    from miba_2023_capstone_rb_nlp_spark.suite import (  # noqa: F401
        flagship,
        relational,
    )

    for optional in (
        "cleaning",
        "ner",
        "multimodal",
        "streaming_live",
        "text",
        "dedup",
        "similarity",
        "events",
        "temporal",
        "topics",
        "ml",
    ):
        try:
            __import__(f"miba_2023_capstone_rb_nlp_spark.suite.{optional}")
        except ImportError:
            pass
    return REGISTRY
