#!/usr/bin/env python
"""Per-query profiling: split wall-clock into BUILD (query-function call,
which includes any eager fixture/localCheckpoint jobs) and ACTION (noop
sink), plus the Spark job/stage breakdown of the action.

Usage: python scripts/profile_queries.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
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

    spark = get_spark_session(app_name="deg04-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    st = spark.sparkContext.statusTracker()
    for name in names:
        fn = qs[name]
        # warm-ups (2, uncounted — matches bench.py estimator)
        for _ in range(2):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        jobs_before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_action = time.perf_counter() - t0
        jobs_after = set(st.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs_after - jobs_before)
        stages = []
        for j in new_jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    stages.append((j, sid, si.numTasks, si.name.split("(")[0][:45]))
        print(
            f"{name}: build={t_build:.3f}s action={t_action:.3f}s "
            f"jobs={len(new_jobs)} stages={len(stages)}"
        )
        for j, sid, ntasks, nm in stages:
            print(f"    job {j} stage {sid}: {ntasks} tasks  {nm}")
        release_caches()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
