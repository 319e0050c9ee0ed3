"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's query suite
(``miba_2023_capstone_rb_nlp_spark.suite``): each entry pairs a
PySpark plan-builder with a DuckDB-runnable ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from miba_2023_capstone_rb_nlp_spark.suite import load_suite

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (MVP reporting query re-expressed): per-cluster
    window aggregates + medoid filter over documents⋈embeddings."""
    suite = load_suite()
    return suite["cluster_viz_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_suite().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    return {
        name: q.oracle for name, q in load_suite().items() if q.oracle is not None
    }
