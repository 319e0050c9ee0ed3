from __future__ import annotations

import pytest

from miba_2023_capstone_rb_nlp_spark.session import get_spark

SF_TEST_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="miba-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    yield s
    s.stop()
