#!/usr/bin/env python
"""Time EVERY registry query once (warmup + 1 timed noop run) and print the
slowest first — the round-14 outlier hunt over the full 204-query registry
(the bench headlines only 40; this catches real compute hiding in the rest).

Run: python tools/time_sweep.py [top_n]   (env SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.plans import QUERIES
    from unravelsports_spark.session import get_spark

    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark("time-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out = []
    for name in QUERIES:
        try:
            sc.setJobDescription(f"sweep-warm:{name}")
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            release_tracked()
            sc.setJobGroup(f"sweep:{name}", name)
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(f"sweep:{name}"))
            sc.setJobGroup("", "")
            release_tracked()
            out.append((dt, n_jobs, name))
        except Exception as ex:  # noqa: BLE001 — a sweep reports, never dies
            out.append((float("nan"), -1, f"{name} ERROR {repr(ex)[:120]}"))
        print(f". {name} {out[-1][0]:.2f}s {out[-1][1]}j", flush=True)
    # NaN (errored queries) breaks sort transitivity and can displace real
    # outliers from the top-N — key errored rows to -inf so they sink
    out.sort(key=lambda r: r[0] if r[0] == r[0] else float("-inf"), reverse=True)
    print(f"\n=== top {top_n} by wall (1 run, warm) @ {SF_DIR} ===")
    for dt, nj, name in out[:top_n]:
        print(f"{dt:7.2f}s {nj:3d}j  {name}")


if __name__ == "__main__":
    main()
