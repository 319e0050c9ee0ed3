"""Every suite query with an oracle must match DuckDB exactly at
sf0.001 (the driver checks the same at sf0.01)."""

from __future__ import annotations

import pytest

from miba_2023_capstone_rb_nlp_spark.suite import load_suite
from tests.conftest import SF_TEST_DIR
from tests.parity import compare, duckdb_conn

SUITE = load_suite()
WITH_ORACLE = sorted(name for name, q in SUITE.items() if q.oracle)
ROWS_ONLY = sorted(name for name, q in SUITE.items() if not q.oracle)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_TEST_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, oracle, name):
    q = SUITE[name]
    spark_df = q.fn(spark, SF_TEST_DIR)
    oracle_df = oracle.execute(q.oracle).df()
    compare(spark_df, oracle_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = SUITE[name]
    df = q.fn(spark, SF_TEST_DIR)
    assert df.count() >= 0 and len(df.schema) > 0


def test_catalog_defends_against_foreign_session_tz(spark, oracle):
    """An external driver session running in another timezone must
    still hash-match: catalog.table() re-asserts UTC at build time
    (the round-4 ADVICE hazard, made executable). Simulates the
    driver by flipping the session TZ before building the plan."""
    name = "events_tumbling_hourly"
    q = SUITE[name]
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = q.fn(spark, SF_TEST_DIR)
        # building any events frame must have re-pinned UTC
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        compare(df, oracle.execute(q.oracle).df(), name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
