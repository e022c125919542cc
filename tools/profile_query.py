#!/usr/bin/env python
"""Profile one or more registry queries: wall time, job/stage counts, and
`explain('formatted')` — the round-14 measurement harness (guide §1).

Usage: python tools/profile_query.py q1_pricing_summary d_dup_clusters ...
       python tools/profile_query.py --plans-dir plans/r14 --suffix before q1 ...

Each query runs once as warm-up (codegen/footer jobs excluded), then once
timed with a job group so the job/stage totals for the timed run are exact.
Timed action = noop sink (guide §1.4).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unravelsports_spark.cache import release_tracked  # noqa: E402
from unravelsports_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default=None, help="write <name>_<suffix>.txt explains here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from unravelsports_spark.plans import QUERIES

    spark = get_spark("r14-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in args.names:
        fn = QUERIES[name]
        # warm-up (not counted)
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        release_tracked()

        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            release_tracked()
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())

        best = float("inf")
        jobs = stages = tasks = 0
        for r in range(args.runs):
            gid = f"prof:{name}:{r}"
            sc.setJobGroup(gid, name)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            st = sc.statusTracker()
            job_ids = st.getJobIdsForGroup(gid)
            n_stages = n_tasks = 0
            for jid in job_ids:
                ji = st.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = st.getStageInfo(sid)
                    if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            sc.setJobGroup("", "")
            release_tracked()
            if dt < best:
                best, jobs, stages, tasks = dt, len(job_ids), n_stages, n_tasks
        print(f"{name:32s} best={best:7.3f}s jobs={jobs:3d} stages={stages:3d} tasks={tasks:5d}")
    spark.stop()


if __name__ == "__main__":
    main()
