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


# One representative per family of entries that touch timestamps
# OUTSIDE the catalog's table() path (streaming file sources, the
# split-copy helper, the JSON at-rest copy) plus the catalog baseline
# — each must re-pin UTC itself (via catalog._set_utc) and still
# hash-match when the session starts in another timezone.
_TZ_ENTRIES = [
    "events_tumbling_hourly",     # catalog path (baseline)
    "events_stream_dedup",        # readStream glob source
    "events_stateful_running",    # split-copy + applyInPandasWithState
    "events_asof_cogroup",        # cogroup Arrow stage
    "events_json_roundtrip",      # JSON at-rest copy
]


@pytest.mark.parametrize("name", _TZ_ENTRIES)
def test_catalog_defends_against_foreign_session_tz(spark, oracle, name):
    """An external driver session running in another timezone must
    still hash-match: every timestamp-touching build path re-asserts
    UTC at build time with the warn-once catalog pin (the round-4
    ADVICE hazard + round-6 review finding, made executable)."""
    import warnings

    q = SUITE[name]
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # the pin warns, by design
            df = q.fn(spark, SF_TEST_DIR)
            # building any events frame must have re-pinned UTC
            assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
            compare(df, oracle.execute(q.oracle).df(), name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
