#!/usr/bin/env python
"""Benchmark: run the suite's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Each query is forced to full materialization via the noop sink (no
driver collect — measures the distributed plan, not toPandas)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from miba_2023_capstone_rb_nlp_spark.session import get_spark  # noqa: E402
from miba_2023_capstone_rb_nlp_spark.suite import load_suite  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# best-of-N per query: single-run timings on a shared box carry multi-
# second GC/load spikes on random queries; min-of-2 measures the plan
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

SKIP: set[str] = set()

# The driver records only the LAST 2000 chars of stdout; round 2's
# 67-query JSON line ran 2044 chars and lost its head, so the artifact
# failed to parse. Keep the line safely under the window: compact
# separators, 2-decimal timings, and — only if still too long — fold
# the cheapest registry-tail entries into one "other" aggregate.
LINE_BUDGET = 1900


def encode_line(timings: dict[str, float], sf_val: float | str) -> str:
    def dump(qs: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in sorted(qs.items())},
                "sf": sf_val,
            },
            separators=(",", ":"),
        )

    qs = dict(timings)
    line = dump(qs)
    # fold the LAST-registered (lowest-priority) entries first; their
    # time still counts in "value" via the untouched `timings` sum
    fold_order = [k for k in reversed(list(timings)) if k != "other"]
    folded = 0.0
    while len(line) > LINE_BUDGET and fold_order:
        victim = fold_order.pop(0)
        folded += qs.pop(victim)
        qs["other"] = round(folded, 2)
        line = dump(qs)
    return line


def main() -> None:
    spark = get_spark(app_name="miba-bench")
    spark.sparkContext.setLogLevel("ERROR")
    suite = load_suite()
    # warm the JVM/codegen so query 1 isn't charged for startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # iterate in registry-priority order (load_suite() puts the
    # driver-checked core first) so encode_line's fold-from-the-end
    # sacrifices the deprioritized twins, never a core entry
    timings: dict[str, float] = {}
    for name, q in suite.items():
        if name in SKIP:
            continue
        best = None
        for _ in range(max(1, REPS)):
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    line = encode_line(timings, sf_val)
    # stop Spark BEFORE printing: the JSON line must be the absolute
    # last stdout so the driver's 2000-char tail window contains it
    spark.stop()
    print(line, flush=True)


if __name__ == "__main__":
    main()
