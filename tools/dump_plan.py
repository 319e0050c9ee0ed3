#!/usr/bin/env python
"""Dump .explain('formatted') for named suite entries to files.

Usage: python tools/dump_plan.py out_dir suffix entry1[,entry2,...]
Writes out_dir/<entry>_<suffix>.txt for each entry. Plans are built
(not executed) except where an entry's builder itself runs actions
(wizard/kmeans fits, streaming drains) — those run as they would in
any sweep.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miba_2023_capstone_rb_nlp_spark.session import get_spark  # noqa: E402
from miba_2023_capstone_rb_nlp_spark.suite import load_suite  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = [n for n in sys.argv[3].split(",") if n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    suite = load_suite()
    for name in names:
        df = suite[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
