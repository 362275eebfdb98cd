#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<outdir>/<name>_<tag>.txt.

Usage: python scripts/dump_plans.py <outdir> <tag> <query> [<query> ...]
       python scripts/dump_plans.py r11 before q1_pricing_summary similarity_ivf_topk

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Plans are the
pre-execution formatted physical plans (AdaptiveSparkPlan isFinalPlan=false
wrappers included) — the same surface PLANS.md is derived from.
"""
from __future__ import annotations

import os
import sys


def main() -> int:
    outdir, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from deg04_local_data_lake_spark import registry
    from deg04_local_data_lake_spark.session import get_spark_session

    spark = get_spark_session(app_name="deg04-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(dest, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(dest, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
