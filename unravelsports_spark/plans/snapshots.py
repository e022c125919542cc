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
      (CAST(70 AS BIGINT), CAST(447 AS BIGINT), CAST(0.01087 AS DOUBLE)),
      (CAST(98 AS BIGINT), CAST(290 AS BIGINT), CAST(0.01087 AS DOUBLE)),
      (CAST(285 AS BIGINT), CAST(301 AS BIGINT), CAST(0.01087 AS DOUBLE)),
      (CAST(8 AS BIGINT), CAST(245 AS BIGINT), CAST(0.012195 AS DOUBLE)),
      (CAST(393 AS BIGINT), CAST(420 AS BIGINT), CAST(0.012658 AS DOUBLE)),
      (CAST(45 AS BIGINT), CAST(413 AS BIGINT), CAST(0.012987 AS DOUBLE)),
      (CAST(267 AS BIGINT), CAST(413 AS BIGINT), CAST(0.013158 AS DOUBLE)),
      (CAST(58 AS BIGINT), CAST(293 AS BIGINT), CAST(0.014286 AS DOUBLE)),
      (CAST(166 AS BIGINT), CAST(323 AS BIGINT), CAST(0.016667 AS DOUBLE)),
      (CAST(458 AS BIGINT), CAST(462 AS BIGINT), CAST(0.017241 AS DOUBLE)),
      (CAST(61 AS BIGINT), CAST(185 AS BIGINT), CAST(0.017544 AS DOUBLE)),
      (CAST(31 AS BIGINT), CAST(383 AS BIGINT), CAST(0.02381 AS DOUBLE)),
      (CAST(72 AS BIGINT), CAST(377 AS BIGINT), CAST(0.02439 AS DOUBLE)),
      (CAST(45 AS BIGINT), CAST(267 AS BIGINT), CAST(0.025974 AS DOUBLE)),
      (CAST(107 AS BIGINT), CAST(387 AS BIGINT), CAST(0.026316 AS DOUBLE)),
      (CAST(152 AS BIGINT), CAST(178 AS BIGINT), CAST(0.027027 AS DOUBLE)),
      (CAST(120 AS BIGINT), CAST(332 AS BIGINT), CAST(0.028571 AS DOUBLE)),
      (CAST(326 AS BIGINT), CAST(457 AS BIGINT), CAST(0.028571 AS DOUBLE)),
      (CAST(295 AS BIGINT), CAST(374 AS BIGINT), CAST(0.033333 AS DOUBLE)),
      (CAST(435 AS BIGINT), CAST(486 AS BIGINT), CAST(0.033333 AS DOUBLE)),
      (CAST(310 AS BIGINT), CAST(389 AS BIGINT), CAST(0.038462 AS DOUBLE)),
      (CAST(92 AS BIGINT), CAST(450 AS BIGINT), CAST(0.041667 AS DOUBLE)),
      (CAST(44 AS BIGINT), CAST(446 AS BIGINT), CAST(0.043478 AS DOUBLE)),
      (CAST(87 AS BIGINT), CAST(134 AS BIGINT), CAST(0.045455 AS DOUBLE)),
      (CAST(26 AS BIGINT), CAST(455 AS BIGINT), CAST(0.1 AS DOUBLE))
    ) AS t(id_a, id_b, jaccard_dist)
    """,
    }
)
