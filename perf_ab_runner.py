#!/usr/bin/env python
"""One process of an interleaved fresh-JVM A/B pair (perf_ab_r*.md).

Times the named suite entries in THIS process with bench.py-identical
mechanics — same `get_spark` conf, noop-sink full materialization (no
driver collect), `clearCache()` + explicit driver GC between reps so
ContextCleaner reclaims shuffle state outside the timed region — and
prints ONE JSON line ``{entry: [rep_secs, ...]}``.

The per-round A/B records (perf_ab_r9/r10/r11.md) run this script
alternately from HEAD and from a /tmp worktree of the comparison
commit, one fresh JVM per invocation, so JIT/page-cache state can't
leak between the sides and slow host windows hit both sides equally.

Usage:
    python perf_ab_runner.py entry1,entry2[,entry3...] [reps]
Env:
    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from miba_2023_capstone_rb_nlp_spark.session import get_spark  # noqa: E402
from miba_2023_capstone_rb_nlp_spark.suite import load_suite  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="perf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    suite = load_suite()
    out: dict[str, list[float]] = {}
    for name in names:
        q = suite[name]
        rs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        out[name] = rs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
