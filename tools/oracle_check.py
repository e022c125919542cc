#!/usr/bin/env python
"""Check NAMED registry queries against their DuckDB oracles at one SF —
the focused (per-change) companion to tools/oracle_sweep.py.

Run: python tools/oracle_check.py d_kcore_peeling d_dup_clusters ...
     (env SPARK_GRAFT_SF_DIR, default sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb

    from tests.oracle_compare import compare_frames
    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.plans import ORACLE_SQL, QUERIES
    from unravelsports_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rc = 0
    for name in sys.argv[1:]:
        t0 = time.time()
        ok, msg = compare_frames(
            QUERIES[name](spark, SF_DIR), con.execute(ORACLE_SQL[name])
        )
        release_tracked()
        print(f"{'OK  ' if ok else 'FAIL'} {name} {time.time() - t0:.1f}s {msg if not ok else ''}",
              flush=True)
        rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
