"""Full-scale parity: every oracle-backed entry vs DuckDB at sf0.1 —
10× the external driver's sf0.01 gate. Guards against quantization
flukes that only appear with more rows near floor boundaries (the
failure class the fixed-point recipe is designed to exclude).

Slow (~3-12 min on local[32]); opt in with SPARK_GRAFT_SF01_PARITY=1.
Last full run: round 14, **153/153 oracles green in 458 s** on the
post-rotation tree (r14 window reorder + sf0.01 reseed-floor
verification + the upsert bucket-count invariance lane), on a bursty
host (the build day's steal ran 1-4 %; parity is timing-insensitive).
(Round 13: 153/153 in 336 s after the r13 rotation, streaming
state-partition invariance lane and strict ner conf-byte parser;
round 12: 153/153
in 340 s after the r12 rotation, wizard enrichment-presence witness
and conf-driven ner broadcast gate; round 11: 153/153 in
295 s on the round's final tree — the first sweeps with EVERY
registry entry oracled; the r11 witness conversions raised the count
149 → 152 (kmeans_clusters, pca_coords, approx_distinct_parts) and
the wizard_full_chain witness oracle landed mid-round and made it
153, emptying the rows-only set. Earlier
full runs: 152/152 in 674 s earlier in round 11 on a persistently
loaded host; 149/149 in 282 s in round 10; 149/149 in 386 s in round
9; 147/147 in 371 s in round 8; 136/136 in 269 s in round 7; 111/111
in 279 s in round 6.)
"""

from __future__ import annotations

import os

import pytest

from miba_2023_capstone_rb_nlp_spark.suite import load_suite
from tests.parity import compare, duckdb_conn

SF01_DIR = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF01_PARITY") != "1"
    or not os.path.isdir(SF01_DIR),
    reason="sf0.1 parity is opt-in (SPARK_GRAFT_SF01_PARITY=1)",
)

SUITE = load_suite()
WITH_ORACLE = sorted(name for name, q in SUITE.items() if q.oracle)


@pytest.fixture(scope="module")
def oracle01():
    con = duckdb_conn(SF01_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity_sf01(spark, oracle01, name):
    q = SUITE[name]
    compare(q.fn(spark, SF01_DIR), oracle01.execute(q.oracle).df(), name)
    spark.catalog.clearCache()
