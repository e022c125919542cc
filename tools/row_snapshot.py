#!/usr/bin/env python
"""Exact row-set snapshot/compare for registry queries — the verification
harness for optimizations touching rows-only queries (no SQL oracle to
diff against): collect every row, canonicalize (round-trip through repr,
sort), and write/compare a digest file.

Run: python tools/row_snapshot.py save /tmp/snap.json q1 q2 ...
     python tools/row_snapshot.py check /tmp/snap.json q1 q2 ...
(env SPARK_GRAFT_SF_DIR, default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(df) -> list[str]:
    return sorted(repr(tuple(r)) for r in df.collect())


def main() -> int:
    mode, path, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.plans import QUERIES
    from unravelsports_spark.session import get_spark

    spark = get_spark("row-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "save":
        out = {}
        for name in names:
            out[name] = canon(QUERIES[name](spark, SF_DIR))
            release_tracked()
            print(f"saved {name}: {len(out[name])} rows", flush=True)
        with open(path, "w") as f:
            json.dump(out, f)
        return 0
    with open(path) as f:
        ref = json.load(f)
    rc = 0
    for name in names:
        got = canon(QUERIES[name](spark, SF_DIR))
        release_tracked()
        if name not in ref:
            # a typo'd or later-added name must FAIL this query and keep
            # checking the rest, not abort the whole run with a KeyError
            rc = 1
            print(f"FAIL {name}: not present in snapshot {path}", flush=True)
            continue
        ok = got == ref[name]
        if not ok:
            rc = 1
            a, b = set(ref[name]), set(got)
            print(f"FAIL {name}: {len(ref[name])} ref vs {len(got)} got; "
                  f"only-ref {list(a - b)[:3]} only-got {list(b - a)[:3]}", flush=True)
        else:
            print(f"OK   {name} ({len(got)} rows)", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
