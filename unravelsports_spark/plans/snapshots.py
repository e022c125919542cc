"""Snapshot oracles for engine-specific estimators (round 4).

These queries have no SQL-computable oracle (HyperLogLog++ internals, MLlib
LSH hash families), but their outputs are deterministic — seeded hash
functions, order-independent register merges — verified across different
masters/partition counts before snapshotting. The oracle is the literal
expected table, so the driver records rows+schema+hash instead of rows>0.
A changed estimate/neighbor set flips the hash; regenerate deliberately via
tools/gen_snapshot_oracles note in STATUS.md. a15_hll_sketch_union joined
in round 5 after its per-source repartition made the union estimate stable
across master/partition configs (see the query docstring).
"""

from .relational import ORACLE_SQL

ORACLE_SQL.update(
    {
        "a15_hll_sketch_union": """
    SELECT * FROM (VALUES
      (CAST(20 AS BIGINT), CAST(499 AS BIGINT), CAST(500 AS BIGINT))
    ) AS t(n_sources, global_estimate, sum_per_source_exact)
    """,
        "a9_approx_distinct": """
    SELECT * FROM (VALUES
      ('A', CAST(10998 AS BIGINT), CAST(20028 AS BIGINT)),
      ('N', CAST(10967 AS BIGINT), CAST(19926 AS BIGINT)),
      ('R', CAST(11120 AS BIGINT), CAST(20046 AS BIGINT))
    ) AS t(l_returnflag, approx_orders, n_rows)
    """,
        "s_ann_mllib_brp": """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(7 AS BIGINT), CAST(1.18925 AS DOUBLE)),
      (CAST(73 AS BIGINT), CAST(1.187069 AS DOUBLE)),
      (CAST(190 AS BIGINT), CAST(1.198503 AS DOUBLE)),
      (CAST(320 AS BIGINT), CAST(1.193432 AS DOUBLE)),
      (CAST(365 AS BIGINT), CAST(1.122503 AS DOUBLE)),
      (CAST(387 AS BIGINT), CAST(1.1566 AS DOUBLE)),
      (CAST(388 AS BIGINT), CAST(1.203079 AS DOUBLE)),
      (CAST(423 AS BIGINT), CAST(1.185805 AS DOUBLE)),
      (CAST(464 AS BIGINT), CAST(1.202807 AS DOUBLE))
    ) AS t(vec_id, distance)
    """,
        "d_mllib_minhash_join": """
    SELECT * FROM (VALUES
      (CAST(20 AS BIGINT), CAST(63 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(22 AS BIGINT), CAST(411 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(32 AS BIGINT), CAST(258 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(45 AS BIGINT), CAST(413 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(57 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(98 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(100 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(111 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(142 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(147 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(167 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(173 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(216 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(233 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(251 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(264 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(272 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(274 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(280 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(294 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(299 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(311 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(319 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(328 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(354 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(417 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(426 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(429 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(441 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(453 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(463 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(56 AS BIGINT), CAST(466 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(98 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(100 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(111 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(142 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(147 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(167 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(173 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(216 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(233 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(251 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(264 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(272 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(274 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(280 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(294 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(299 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(311 AS BIGINT), CAST(0.0 AS DOUBLE)),
      (CAST(57 AS BIGINT), CAST(319 AS BIGINT), CAST(0.0 AS DOUBLE))
    ) AS t(id_a, id_b, jaccard_dist)
    """,
    }
)
