"""Driver-window simulation: run EXACTLY the 50-slot certification prefix
the driver will execute this round — __spark_entry__.py loaded by path in a
fresh process, a PLAIN SparkSession (not the package factory), queries() in
the driver's priority order, each compared against its oracle_sql() on the
gate-scale tables (oracle-backed slots: rows+schema+exact values via
compare_frames; rows-only slots: rows >= 0 with a stable schema).

This is the pre-flight for CORRECTNESS_r{N}.json: a green run here means the
rotation cannot re-burn slots. The full-registry check remains
tools/oracle_sweep.py; this tool exists because the WINDOW (the first
``--slots`` entries, default 50) is what certification actually grades.

Run: python tools/window_sim.py  [env SPARK_GRAFT_SF_DIR, default sf0.01]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SLOTS = int(os.environ.get("SPARK_GRAFT_WINDOW", "50"))


def main() -> int:
    import duckdb

    from pyspark.sql import SparkSession

    from tests.oracle_compare import compare_frames

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = mod.entry(spark)
    n = len(df.collect())
    print(f"entry smoke: {n} rows, schema {df.schema.simpleString()[:80]}...")
    assert n > 0

    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    # same benign-diff classification as tools/oracle_sweep.py: at non-gate
    # scales the sf0.01-pinned snapshot oracles and the measured 1-ulp ln
    # boundary rows diverge BY DESIGN and must not report as regressions
    # (r9 review finding); at the gate scale both sets compare exact
    from tools.oracle_sweep import EXPECTED_SNAPSHOT, KNOWN_LN_BOUNDARY

    gate_scale = SF_DIR.rstrip("/").endswith("sf0.01")
    window = list(qs)[:SLOTS]
    t0 = time.time()
    failed, benign = [], []
    try:
        for i, name in enumerate(window):
            # a slot that RAISES must record as failed and let the rest of
            # the window run — the pre-flight's whole point is a complete
            # slot-burn report (r9 review finding)
            try:
                sdf = qs[name](spark, SF_DIR)
                if name in osql:
                    ok, msg = compare_frames(sdf, con.execute(osql[name]))
                    if ok:
                        tag = "exact"
                    elif not gate_scale and name in EXPECTED_SNAPSHOT:
                        tag = f"snapshot-by-design at {SF_DIR} ({msg[:60]})"
                        benign.append(name)
                    elif not gate_scale and name in KNOWN_LN_BOUNDARY:
                        tag = f"known-ln-boundary at {SF_DIR} ({msg[:60]})"
                        benign.append(name)
                    else:
                        tag = f"FAIL {msg}"
                        failed.append(name)
                else:
                    rows = sdf.collect()
                    tag = f"rows-only ({len(rows)} rows)"
            except Exception as e:  # noqa: BLE001 — any raise burns the slot
                tag = f"FAIL raised {type(e).__name__}: {e}"
                failed.append(name)
            print(f"[{i + 1:2d}/{len(window)}] {name}: {tag}", flush=True)
        print(
            f"window @ {SF_DIR}: {len(window) - len(failed)}/{len(window)} green "
            f"({len(benign)} benign-diff), {len(failed)} failed, "
            f"{int(time.time() - t0)}s"
        )
        if failed:
            print("FAILED:", failed)
    finally:
        from unravelsports_spark.cache import release_tracked

        release_tracked()  # the evicting wrapper frees per-slot; this
        # releases the LAST slot's caches before teardown
        spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
