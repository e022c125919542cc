#!/usr/bin/env python
"""Run EVERY registered DuckDB oracle against its Spark query at an
arbitrary scale factor — the cross-scale correctness sweep. The driver
gate certifies sf0.01; this reruns the same compare at sf0.1 (or any
$SPARK_GRAFT_SF_DIR) to catch scale-sensitive defects (overflow, skew,
top-k boundary drift) the small gate can't see.

Known-expected mismatches at non-gate scales, by design:
- snapshot oracles (a9_approx_distinct, a15_hll_sketch_union,
  s_ann_mllib_brp, d_mllib_minhash_join): the oracle pins the sf0.01
  approximate/MLlib output as literal values — other scales differ by
  construction (listed in EXPECTED_SNAPSHOT below and reported
  separately).
- 1-ulp ln() rounding-boundary hits (the round-2 float discipline's
  documented limit): ln can differ by 1 ulp between the JVM and libm;
  ROUND(_, 6) absorbs it unless a value lands exactly on a rounding
  boundary. At sf0.1 the LM scorers (t_unigram_logprob,
  t_bigram_logprob) each hit one such row. These are reported, not
  suppressed — a NEW name in the failure list is a real regression.

Run: python tools/oracle_sweep.py   (env SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: oracles that pin engine-specific approximate output at sf0.01
EXPECTED_SNAPSHOT = {
    "a9_approx_distinct",
    "a15_hll_sketch_union",
    "s_ann_mllib_brp",
    "d_mllib_minhash_join",
    # r9: Viterbi segmentation over the documents table is deterministic
    # but not SQL-expressible; the VALUES oracle pins the sf0.01 rollup
    "t_unigram_tokens",
    # r10: greedy WordPiece longest-match segmentation, same class
    "t_wordpiece_tokens",
    # r14: grouped-map savgol over the SF-SCALE events table — the VALUES
    # oracle pins the sf0.01 full-output fingerprint (the other five m_*_fp
    # twins run on scale-independent fixtures and stay exact at any sf)
    "m_savgol_events_fp",
}

#: LM scorers with a measured 1-ulp ln() rounding-boundary row at sf0.1
#: (r7 sweep: t_bigram avg_logprob -3.414089 vs -3.414090). Reported as
#: "known-ln-boundary"; any OTHER name failing is a real regression.
KNOWN_LN_BOUNDARY = {"t_unigram_logprob", "t_bigram_logprob"}


def main() -> int:
    import duckdb

    from tests.oracle_compare import compare_frames
    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.plans import ORACLE_SQL, QUERIES
    from unravelsports_spark.session import get_spark

    spark = get_spark("oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    fails, snapshot_diffs, ln_boundary = [], [], []
    t0 = time.time()
    for name in ORACLE_SQL:
        try:
            ok, msg = compare_frames(
                QUERIES[name](spark, SF_DIR), con.execute(ORACLE_SQL[name])
            )
        except Exception as ex:  # noqa: BLE001 — a sweep reports, never dies
            ok, msg = False, repr(ex)[:200]
        if not ok:
            if name in EXPECTED_SNAPSHOT:
                bucket, tag = snapshot_diffs, "snapshot-diff"
            elif name in KNOWN_LN_BOUNDARY:
                bucket, tag = ln_boundary, "known-ln-boundary"
            else:
                bucket, tag = fails, "FAIL"
            bucket.append((name, msg[:200]))
            print(tag, name, msg[:200], flush=True)
        release_tracked()
    n = len(ORACLE_SQL)
    print(
        f"sweep @ {SF_DIR}: "
        f"{n - len(fails) - len(snapshot_diffs) - len(ln_boundary)}/{n} exact, "
        f"{len(snapshot_diffs)} snapshot-by-design diffs, "
        f"{len(ln_boundary)} known ln-boundary rows, "
        f"{len(fails)} real mismatches, {time.time() - t0:.0f}s"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
