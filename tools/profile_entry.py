#!/usr/bin/env python
"""Per-entry stage/job profiler (guide §1/§7): run suite entries with
the Spark UI enabled and dump every job/stage's wall time, shuffle
bytes and task count from the UI REST API — the sandbox substitute
for clicking through the Stages tab.

Usage:
    python tools/profile_entry.py entry1[,entry2,...] [reps]
Env:
    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)

Prints, per entry, per rep: total wall seconds, then a per-stage table
(stage id, seconds, tasks, shuffle read/write MB, input MB, name).
Stages from earlier entries/reps are excluded by stage-id watermark.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miba_2023_capstone_rb_nlp_spark.session import get_spark  # noqa: E402
from miba_2023_capstone_rb_nlp_spark.suite import load_suite  # noqa: E402


def _api(port: int, app_id: str, path: str):
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile-entry",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    suite = load_suite()
    for name in names:
        q = suite[name]
        for rep in range(reps):
            seen = {s["stageId"] for s in _api(port, app_id, "stages")}
            spark.sparkContext.setJobDescription(f"{name}#rep{rep}")
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            stages = [
                s for s in _api(port, app_id, "stages")
                if s["stageId"] not in seen and s["status"] != "SKIPPED"
            ]
            stages.sort(key=lambda s: s["stageId"])
            total = sum(
                (s.get("executorRunTime") or 0) for s in stages
            ) / 1000.0
            print(f"\n== {name} rep{rep}: wall {wall:.2f}s  "
                  f"{len(stages)} stages  sum-executorRunTime {total:.2f}s")
            for s in stages:
                dur = "?"
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    try:
                        from datetime import datetime

                        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                        t1 = datetime.strptime(
                            s["firstTaskLaunchedTime"].replace("GMT", ""), fmt
                        )
                        t2 = datetime.strptime(
                            s["completionTime"].replace("GMT", ""), fmt
                        )
                        dur = f"{(t2 - t1).total_seconds():6.2f}"
                    except Exception:
                        dur = "?"
                print(
                    f"  st{s['stageId']:>5} wall={dur:>6}s "
                    f"run={(s.get('executorRunTime') or 0) / 1000.0:6.2f}s "
                    f"tasks={s.get('numCompleteTasks', 0):>3} "
                    f"sr={(s.get('shuffleReadBytes') or 0) / 1e6:7.2f}MB "
                    f"sw={(s.get('shuffleWriteBytes') or 0) / 1e6:7.2f}MB "
                    f"in={(s.get('inputBytes') or 0) / 1e6:7.2f}MB  "
                    f"{s.get('name', '')[:70]}"
                )
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
