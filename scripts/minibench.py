#!/usr/bin/env python
"""Median-of-5 (after 2 warm-ups) noop-sink timing for named queries —
the same estimator as bench.py, for iterating on one query.

Usage: python scripts/minibench.py <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys
import time


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from deg04_local_data_lake_spark import registry
    from deg04_local_data_lake_spark.caching import release_caches
    from deg04_local_data_lake_spark.session import get_spark_session

    spark = get_spark_session(app_name="deg04-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        fn = qs[name]
        for _ in range(2):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: median={sorted(runs)[2]} runs={runs}")
        release_caches()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
