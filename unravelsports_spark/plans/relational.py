"""SURVEY §2 relational-operator inventory over the synthetic star schema.

Each entry is a native Spark DataFrame plan (so Catalyst gets full pushdown /
pruning / codegen) paired with an ANSI-SQL DuckDB oracle. Numeric discipline
for cross-engine value-hash parity:

- SUM/AVG over doubles is order-dependent in floating point; both sides cast
  to DECIMAL first (exact, associative) and cast the final result to DOUBLE.
- min/max/lag/subtraction over raw doubles are selections or single IEEE ops:
  bit-identical across engines, no rounding needed.
- timestamps are emitted as unix milliseconds (LongType ↔ BIGINT).
- every window ordering carries a unique tie-break key.

Reference-behavior citations (what each operator re-expresses) are given per
query; e.g. P7 sign-flip mirrors /root/reference/unravel/soccer/dataset/
kloppy_polars.py:725-782, sessionization W4 mirrors unravel/soccer/models/
formations/efpi.py:553-571.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_table

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: Dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def dec(col, scale: int = 2, precision: int = 18):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col, scale: int = 2):
    """Exact decimal sum cast back to double — deterministic across engines."""
    return F.sum(dec(col, scale)).cast("double")


def ms(col):
    """Timestamp → unix millis (LongType). Parquet timestamps load as
    TIMESTAMP_NTZ in Spark 4; with a UTC session the cast is the identity
    instant, matching DuckDB's epoch_ms on naive timestamps."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def scaled_units(col, scale: int):
    """FLOOR(x·scale + 0.5) as bigint — the exact scaled-long discipline
    shared by every revenue/quantity query (cents at scale 100, basis
    points at 10000): double error ≪ 0.5 scaled units, so the floor
    recovers the exact integer, sums vectorize in whole-stage codegen,
    and both engines evaluate the identical expression. The ONE
    definition keeps q1/q3/q5/q18 bit-aligned with their DECIMAL oracles
    — see q1_pricing_summary for the int64 overflow budget."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * scale + F.lit(0.5)).cast("bigint")


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (P4 range filter + A1/A3 aggs +
# F3 arithmetic). Mirrors the melt→filter→group pipeline shape of
# kloppy_polars.py:813-921 applied to the star schema.
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(FLOOR(l_quantity * 100 + 0.5)) / 100.0 AS sum_qty,
           SUM(FLOOR(l_extendedprice * 100 + 0.5)) / 100.0 AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1.0 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           ROUND((SUM(FLOOR(l_quantity * 100 + 0.5)) / 100.0) / COUNT(*), 6) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled-long exact sums: FLOOR(x*100 + 0.5) recovers the exact cent
    integer (double error ≪ 0.5 scaled units), and long sums vectorize where
    decimal sums fall back to per-row BigDecimal. disc_price needs 6-decimal
    units (≤1.1e11/row), whose GLOBAL sum would overflow int64 at 100 TB
    (~1e11 rows/group → ~1e22) — so it runs as an explicit two-phase sum:

    1. per-partition pre-agg on (partition_id, group): every per-row op is
       pure long arithmetic inside whole-stage codegen. A 128 MB scan
       partition holds ≲2e6 rows → partial dp_units ≤ 2e6×1.1e11 = 2.2e17,
       a 42× margin under 2^63 (even a 1 GB skewed partition holds 5×).
    2. final agg over the tiny partial table (#partitions × #groups rows):
       dp_units promotes to DECIMAL(38,0) — exact up to 1e38, ≥1e16 × the
       100 TB total — so BigDecimal cost is paid on partials, never rows.

    The shuffled pre-agg rows are ≤ #partitions×#groups either way (the
    single-phase plan's map-side combine produces the same row count), so
    the extra keyed agg adds no data movement. sum_disc_price =
    (exact unit sum)/1e6 cast double is the correctly-rounded double of the
    same exact rational the decimal formulation produced — proven
    bit-identical on all groups. The 2-decimal columns stay single-phase-
    safe globally (≤1e7/row × 1e11 rows = 1e18 < 2^63) and ride the same
    pre-agg. Measured: 0.997 → 0.703 s at sf0.1 (−30%), BITEQ."""
    li = read_table(spark, sf_dir, "lineitem")

    pc = scaled_units("l_extendedprice", 100)
    dm = F.lit(10000) - scaled_units("l_discount", 10000)
    partial = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "l_returnflag", "l_linestatus")
        .agg(
            F.sum(scaled_units("l_quantity", 100)).alias("q_units"),
            F.sum(pc).alias("p_units"),
            F.sum(pc * dm).alias("dp_units"),
            F.count("*").alias("cnt"),
        )
    )
    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum("q_units") / 100.0).alias("sum_qty"),
            (F.sum("p_units") / 100.0).alias("sum_base_price"),
            (
                F.sum(F.col("dp_units").cast("decimal(38,0)"))
                / F.lit(1000000).cast("decimal(7,0)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round((F.sum("q_units") / 100.0) / F.sum("cnt"), 6).alias("avg_qty"),
            # overflow guard (ADVICE r4): the step-1 bigint partial is only
            # safe while a scan partition stays under ~8e7 rows (8e7 × 1.1e11
            # = 8.8e18 < 2^63); a coalesced or unsplittable-gzip input can
            # exceed that and non-ANSI sum would wrap SILENTLY. assert_true
            # yields NULL (+0) when fine and fails the query loudly when the
            # assumption breaks — zero cost on the happy path.
            (
                F.sum("cnt")
                + F.coalesce(
                    F.assert_true(
                        F.max("cnt") <= F.lit(80_000_000),
                        F.lit(
                            "q1 partial-sum guard: a scan partition holds >8e7 "
                            "rows; dp_units partials may overflow int64 — split "
                            "the input or lower spark.sql.files.maxPartitionBytes"
                        ),
                    ).cast("bigint"),
                    F.lit(0),
                )
            ).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "p1_p2_project_filter",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name AS name,
             NULLIF(p_size % 7, 0) AS size_bucket,
             NULLIF(p_partkey % 5, 0) AS key_bucket
      FROM part)
    SELECT p_partkey, name, size_bucket, key_bucket
    FROM p WHERE NOT (size_bucket IS NULL AND key_bucket IS NULL)
    """,
)
def p1_p2_project_filter(spark, sf_dir):
    """P1 select/rename/drop + P2 both-null-predicate row drop (the
    kloppy_polars.py:893-894 pattern: drop temp cols, then drop rows whose
    coordinates are all null). Nulls are synthesized via NULLIF since the
    star tables are dense."""
    p = read_table(spark, sf_dir, "part")
    proj = p.select(
        "p_partkey",
        F.col("p_name").alias("name"),
        F.nullif(F.col("p_size") % 7, F.lit(0)).alias("size_bucket"),
        F.nullif(F.col("p_partkey") % 5, F.lit(0)).alias("key_bucket"),
    )
    return proj.filter(~(F.col("size_bucket").isNull() & F.col("key_bucket").isNull()))


@query(
    "f7_f8_conditional_literals",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN
                       CASE WHEN c_mktsegment = 'BUILDING' THEN 'mid_building' ELSE 'mid' END
                  ELSE 'high' END AS tier,
             CAST(NULL AS DOUBLE) AS missing,
             c_acctbal
      FROM customer)
    SELECT tier, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           MAX(missing) AS max_missing
    FROM t GROUP BY tier
    """,
)
def f7_f8_conditional_literals(spark, sf_dir):
    """F7 nested 3-branch CASE WHEN (the is_qb shape,
    american_football/graphs/features/node_features.py:100-108) + F8 typed
    null literal (lit(None).cast, kloppy_polars.py:548-552)."""
    c = read_table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(
            F.col("c_acctbal") < 5000,
            F.when(F.col("c_mktsegment") == "BUILDING", "mid_building").otherwise("mid"),
        )
        .otherwise("high")
    )
    return (
        c.select(tier.alias("tier"), F.lit(None).cast("double").alias("missing"), "c_acctbal")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("sum_bal"),
            F.max("missing").alias("max_missing"),
        )
    )


@query(
    "p3_filter_eq",
    oracle="""
    SELECT l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus
    """,
)
def p3_filter_eq(spark, sf_dir):
    """P3 equality filter: kloppy_polars.py:554-555 (ball vs player split)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("cnt"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "p4_range_between",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY o_orderpriority
    """,
)
def p4_range_between(spark, sf_dir):
    """P4 BETWEEN time-window selection: pressing_intensity.py:510-514."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate").between("1996-01-01", "1997-12-31"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@query(
    "p5_modulo_sample",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events WHERE event_id % 10 = 0 GROUP BY event_type
    """,
)
def p5_modulo_sample(spark, sf_dir):
    """P5 modulo frame sampling: kloppy_polars.py:1063-1066."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_id") % 10 == 0)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), dsum("value", 6).alias("sum_value"))
    )


@query(
    "p6_conditional_cap",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(LEAST(l_quantity, 25.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_capped,
           CAST(SUM(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
    FROM lineitem GROUP BY l_returnflag
    """,
)
def p6_conditional_cap(spark, sf_dir):
    """P6 conditional capping of speed/accel maxima: soccer/dataset/utils.py:6-39."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(dec(F.least(F.col("l_quantity"), F.lit(25.0)))).cast("double").alias("sum_capped"),
        F.sum(F.when(F.col("l_quantity") > 25.0, 1).otherwise(0)).alias("n_capped"),
    )


@query(
    "p7_sign_flip",
    oracle="""
    SELECT user_id % 100 AS user_bucket,
           CAST(SUM(CAST(CASE WHEN event_type IN ('error','click') THEN -value ELSE value END
                         AS DECIMAL(18,6))) AS DOUBLE) AS net_value
    FROM events GROUP BY user_id % 100
    """,
)
def p7_sign_flip(spark, sf_dir):
    """P7 conditional sign flip (orientation normalize): kloppy_polars.py:725-782."""
    e = read_table(spark, sf_dir, "events")
    signed = F.when(F.col("event_type").isin("error", "click"), -F.col("value")).otherwise(F.col("value"))
    return (
        e.withColumn("user_bucket", F.col("user_id") % 100)
        .groupBy("user_bucket")
        .agg(F.sum(dec(signed, 6)).cast("double").alias("net_value"))
    )


@query(
    "p8_bool_derive",
    oracle="""
    SELECT (o_totalprice > 200000) AS is_big, o_orderstatus, COUNT(*) AS cnt
    FROM orders GROUP BY (o_totalprice > 200000), o_orderstatus
    """,
)
def p8_bool_derive(spark, sf_dir):
    """P8 boolean derivation (is_ball_carrier): kloppy_polars.py:656-663."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.withColumn("is_big", F.col("o_totalprice") > 200000)
        .groupBy("is_big", "o_orderstatus")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@query(
    "j1_dim_join",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j1_dim_join(spark, sf_dir):
    """J1/J5 broadcast dimension joins: kloppy_polars.py:558-579 (ball join),
    american_football/dataset/dataset.py:294-322 (players/plays enrichment).
    Both dims are broadcast — no shuffle of the fact side at 100 TB."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal"))
    )


@query(
    "j2_agg_back_join",
    oracle="""
    WITH mx AS (SELECT l_orderkey, MAX(l_extendedprice) AS max_price FROM lineitem GROUP BY l_orderkey)
    SELECT o_orderpriority, COUNT(*) AS cnt,
           CAST(SUM(CAST(mx.max_price AS DECIMAL(18,2))) AS DOUBLE) AS sum_max_price
    FROM orders JOIN mx ON o_orderkey = mx.l_orderkey
    GROUP BY o_orderpriority
    """,
)
def j2_agg_back_join(spark, sf_dir):
    """J2 join of grouped agg back onto base: kloppy_polars.py:581-652."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    mx = li.groupBy("l_orderkey").agg(F.max("l_extendedprice").alias("max_price"))
    return (
        o.join(mx, o.o_orderkey == mx.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"), dsum("max_price").alias("sum_max_price"))
    )


@query(
    "j3_semi_join",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS cnt
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    GROUP BY o_orderstatus
    """,
)
def j3_semi_join(spark, sf_dir):
    """J3 semi-join validity filter: graph_converter.py:224-238."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "j4_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_idle
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def j4_anti_join(spark, sf_dir):
    """J4 anti-join (frames missing ball row): graph_converter.py:329-340."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_idle"))
    )


@query(
    "j5_enrich_revenue",
    oracle="""
    SELECT p_brand, s_name, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1.0 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size <= 10
    GROUP BY p_brand, s_name
    """,
)
def j5_enrich_revenue(spark, sf_dir):
    """J5 metadata enrichment joins with broadcast dims: dataset.py:294-322.

    Revenue rides the q1 long-product path: the per-row multiply is exact
    bigint (cents × discount-micros, ≤1.1e11/row), promoted to
    DECIMAL(38,0) only at the sum input — BigDecimal cost lands on the agg
    hash-table updates, never on a per-row decimal multiply. With ~25k
    (brand, supplier) groups a partition-id pre-agg would shuffle more rows
    than it saves, so this stays single-phase (unlike q1's 6-group shape).
    Proven bit-identical to the decimal formulation; 0.89 → 0.76 s at
    sf0.1."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = read_table(spark, sf_dir, "supplier")
    pc = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    dm = F.lit(10000) - F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.count("*").alias("cnt"),
            (
                F.sum((pc * dm).cast("decimal(38,0)"))
                / F.lit(1000000).cast("decimal(7,0)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "j7_distinct_join",
    oracle="""
    WITH d AS (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
    SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt
    FROM customer JOIN d ON c_custkey = d.o_custkey
    GROUP BY c_mktsegment, o_orderpriority
    """,
)
def j7_distinct_join(spark, sf_dir):
    """J7 join after distinct projection: efpi.py:512-518."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    d = o.select("o_custkey", "o_orderpriority").distinct()
    return (
        c.join(d, c.c_custkey == d.o_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@query(
    "a2_distinct_count",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a2_distinct_count(spark, sf_dir):
    """A2 distinct-count validity checks: graph_converter.py:228-233."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("cnt"),
    )


@query(
    "a3_group_stats",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           CAST(epoch_ms(MIN(o_orderdate)) AS BIGINT) AS first_order_ms,
           CAST(epoch_ms(MAX(o_orderdate)) AS BIGINT) AS last_order_ms
    FROM orders GROUP BY o_custkey
    """,
)
def a3_group_stats(spark, sf_dir):
    """A3 segment stats (min/max/mean/first per group): efpi.py:655-680.
    min/max of raw doubles are selections — bit-exact across engines."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        ms(F.min("o_orderdate")).alias("first_order_ms"),
        ms(F.max("o_orderdate")).alias("last_order_ms"),
    )


@query(
    "a4_argmin_in_group",
    oracle="""
    SELECT l_orderkey, l_partkey AS cheapest_part, l_extendedprice AS min_price
    FROM (SELECT l_orderkey, l_partkey, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_extendedprice, l_partkey) AS rn
          FROM lineitem) t
    WHERE rn = 1
    """,
)
def a4_argmin_in_group(spark, sf_dir):
    """A4 conditional argmin-within-group (ball-carrier inference):
    kloppy_polars.py:584-607. min(struct(price, partkey)) is min_by with a
    deterministic tie-break — identical rows to the oracle's ROW_NUMBER
    formulation, but it partial-aggregates map-side so the exchange carries
    one row per group instead of every line item (the shape that survives a
    100× scale-up). Struct buffers plan as SortAggregate — the residual sorts
    are group-key-only, within partitions. The window form this replaced
    remains showcased by w3_rank_topk / w7_row_index."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.min(F.struct("l_extendedprice", "l_partkey")).alias("m"))
        .select(
            "l_orderkey",
            F.col("m.l_partkey").alias("cheapest_part"),
            F.col("m.l_extendedprice").alias("min_price"),
        )
    )


@query(
    "a5_conditional_sum",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS discounted_price
    FROM lineitem GROUP BY l_linestatus
    """,
)
def a5_conditional_sum(spark, sf_dir):
    """A5/A6 boolean-sum completeness checks: graph_converter.py:403-432."""
    li = read_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(18,2)")
    return li.groupBy("l_linestatus").agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_r"),
        F.sum(F.when(F.col("l_discount") > 0.05, dec("l_extendedprice")).otherwise(zero))
        .cast("double")
        .alias("discounted_price"),
    )


@query(
    "a7_global_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem",
)
def a7_global_distinct(spark, sf_dir):
    """A7 global distinct / dropDuplicates: kloppy_polars.py:918-920."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_linenumber").distinct()


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@query(
    "w1_lag_diff",
    oracle="""
    SELECT o_orderkey,
           o_totalprice - LAG(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS price_diff
    FROM orders
    """,
)
def w1_lag_diff(spark, sf_dir):
    """W1 lag-difference kinematics pattern: kloppy_polars.py:388-421.
    Single IEEE subtraction of raw doubles — deterministic, no rounding."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_diff"),
    )


@query(
    "w2_partitioned_min",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice - MIN(l_extendedprice) OVER (PARTITION BY l_orderkey) AS above_min
    FROM lineitem
    """,
)
def w2_partitioned_min(spark, sf_dir):
    """W2 partitioned min (GK inference distance): kloppy_polars.py:685-716."""
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") - F.min("l_extendedprice").over(w)).alias("above_min"),
    )


@query(
    "w3_rank_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
    WHERE rn <= 3
    """,
)
def w3_rank_topk(spark, sf_dir):
    """W3 rank-over-partition top-k: graph_converter.py:895-903, efpi.py:626-643."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "w4_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS session_start_ms
    FROM sess GROUP BY user_id, session_id
    """,
)
def w4_sessionize(spark, sf_dir):
    """W4 lag-change sessionization (possession ids): efpi.py:553-571."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = ms("ts") / 1000
    gap = secs - F.lag(secs).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wc))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            ms(F.min("ts")).alias("session_start_ms"),
        )
    )


@query(
    "w5_tumbling_window",
    oracle="""
    SELECT event_type,
           CAST(epoch_ms(time_bucket(INTERVAL 5 MINUTE, ts)) AS BIGINT) AS window_start_ms,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type, time_bucket(INTERVAL 5 MINUTE, ts)
    """,
)
def w5_tumbling_window(spark, sf_dir):
    """W5 tumbling time window (EFPI dt.truncate '5m'): efpi.py:575-585.
    Same F.window() works unchanged under Structured Streaming."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), dsum("value", 6).alias("sum_value"))
        .select(
            "event_type",
            ms(F.col("w.start")).alias("window_start_ms"),
            "cnt",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / set ops / reshaping
# ---------------------------------------------------------------------------


@query(
    "o5_top_k_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def o5_top_k_limit(spark, sf_dir):
    """O1/O5 multi-key sort + limit: kloppy_polars.py:388-392, tests limit=500.
    Spark executes this as TakeOrderedAndProject — no global sort at scale."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@query(
    "o6_union_all",
    oracle="""
    SELECT src, COUNT(*) AS cnt FROM (
      SELECT 'high' AS src FROM orders WHERE o_totalprice > 300000
      UNION ALL
      SELECT 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    ) t GROUP BY src
    """,
)
def o6_union_all(spark, sf_dir):
    """O6 vertical concat (players+ball recombine): kloppy_polars.py:439,539."""
    o = read_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 300000).select(F.lit("high").alias("src"))
    ur = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.lit("urgent").alias("src"))
    return hi.unionByName(ur).groupBy("src").agg(F.count("*").alias("cnt"))


@query(
    "o8_unpivot",
    oracle="""
    SELECT metric, COUNT(*) AS cnt, MIN(val) AS min_val, MAX(val) AS max_val,
           CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
    FROM (
      SELECT 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT 'p_retailprice' AS metric, p_retailprice AS val FROM part
    ) t GROUP BY metric
    """,
)
def o8_unpivot(spark, sf_dir):
    """O8 unpivot/melt wide→long: kloppy_polars.py:293-311,493-544."""
    p = read_table(spark, sf_dir, "part")
    long = p.select(
        F.expr(
            "stack(2, 'p_size', cast(p_size as double), 'p_retailprice', p_retailprice) as (metric, val)"
        )
    )
    return long.groupBy("metric").agg(
        F.count("*").alias("cnt"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        dsum("val").alias("sum_val"),
    )


@query(
    "o9_explode_tokens",
    oracle="""
    SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents) t
    WHERE tok <> ''
    GROUP BY lang
    """,
)
def o9_explode_tokens(spark, sf_dir):
    """O9 explode list→rows: kloppy_polars.py:374, efpi.py:511."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("lang")
        .agg(F.count("*").alias("n_tokens"), F.countDistinct("tok").alias("n_distinct"))
    )


@query(
    "o11_concat_key",
    oracle="""
    SELECT DISTINCT n_name || '-' || r_name AS nation_key
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def o11_concat_key(spark, sf_dir):
    """O11 string concat graph_id key: unravel/utils/utils.py:73-78."""
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.concat_ws("-", "n_name", "r_name").alias("nation_key"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# §2.7 scalar functions
# ---------------------------------------------------------------------------


@query(
    "f1_string_ops",
    oracle="""
    SELECT regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS prio_num,
           upper(substr(o_orderstatus, 1, 1)) AS status_u,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2
    """,
)
def f1_string_ops(spark, sf_dir):
    """F1 regexp extract/replace: kloppy_polars.py:307-310, dataset.py:358-371."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1).alias("prio_num"),
            F.upper(F.substring("o_orderstatus", 1, 1)).alias("status_u"),
        )
        .groupBy("prio_num", "status_u")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "f2_temporal_trunc",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY 1, 2
    """,
)
def f2_temporal_trunc(spark, sf_dir):
    """F2 temporal truncate/extract: efpi.py:575-585, kloppy_polars.py:399."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            "o_totalprice",
        )
        .groupBy("yr", "mo")
        .agg(F.count("*").alias("cnt"), dsum("o_totalprice").alias("sum_price"))
    )


@query(
    "f3_math_ops",
    oracle="""
    SELECT l_partkey % 7 AS bucket,
           CAST(SUM(CAST(sqrt(l_quantity) + l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_partkey % 7
    """,
)
def f3_math_ops(spark, sf_dir):
    """F3 sqrt/pow/modulo in-expression math: kloppy_polars.py:570-578.
    sqrt is IEEE correctly-rounded (identical across engines); x*x likewise."""
    li = read_table(spark, sf_dir, "lineitem")
    expr = F.sqrt("l_quantity") + F.col("l_discount") * F.col("l_discount")
    return (
        li.withColumn("bucket", F.col("l_partkey") % 7)
        .groupBy("bucket")
        .agg(F.sum(dec(expr, 6)).cast("double").alias("s"), F.count("*").alias("cnt"))
    )


@query(
    "w7_row_index",
    oracle="""
    SELECT s_suppkey, s_name,
           CAST(ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rn
    FROM supplier
    """,
)
def w7_row_index(spark, sf_dir):
    """W7 row index (utils.py:59-65) with a deterministic global ordering.

    r14 (guide §2.4/§2.5): a ``Window.orderBy`` with no partition pulls the
    whole table through ONE reducer. Since ``rn`` over the total order
    (acctbal DESC, suppkey) decomposes as (# rows with a strictly larger
    acctbal) + (rank by suppkey within the acctbal tie-group), compute it
    as: a map-side-combinable per-acctbal count, a cumulative window over
    the acctbal LEVELS only (s_acctbal is a 2-decimal value in
    [-999.99, 9999.99] — ≤ 1.1M levels at ANY scale factor, so the
    single-reducer pass is domain-bounded, not data-bounded), and a
    per-level row_number window (acctbal-keyed → parallel) after joining
    the level offsets back (AQE broadcasts the level table). Pure integer
    arithmetic over the identical total order — bit-identical rn."""
    s = read_table(spark, sf_dir, "supplier")
    lvl = s.groupBy("s_acctbal").agg(F.count("*").alias("_c"))
    w_lvl = (
        Window.orderBy(F.col("s_acctbal").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lvl = lvl.select(
        "s_acctbal", (F.sum("_c").over(w_lvl) - F.col("_c")).alias("_off")
    )
    w_in = Window.partitionBy("s_acctbal").orderBy("s_suppkey")
    # null-SAFE join-back (VERDICT r14 #5): s_acctbal is NOT NULL in TPC-H
    # so this is the identity here, but the naive window KEEPS null-key
    # rows — a plain equi-join would silently drop them if this level
    # decomposition is ever copied onto nullable data. eqNullSafe keys are
    # still hash-joinable, so the AQE broadcast of the level side survives
    # (plan guard re-verified).
    lvl = lvl.select(F.col("s_acctbal").alias("_lvl_bal"), "_off")
    return (
        s.select("s_suppkey", "s_name", "s_acctbal")
        .join(lvl, F.col("s_acctbal").eqNullSafe(F.col("_lvl_bal")))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("_off") + F.row_number().over(w_in)).cast("long").alias("rn"),
        )
    )


@query(
    "f6_array_ops",
    oracle="""
    SELECT vec_id, len(embedding) AS dim,
           ROUND(embedding[1]::DOUBLE, 6) AS first_val,
           ROUND(list_max(embedding::DOUBLE[]), 6) AS max_val
    FROM embeddings
    """,
)
def f6_array_ops(spark, sf_dir):
    """F6 list/array element access (kloppy_polars.py:601-606)."""
    e = read_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_val"),
        F.round(F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 6).alias("max_val"),
    )


@query(
    "f4_null_handling",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(coalesce(value, 0.0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_props
    FROM events GROUP BY event_type
    """,
)
def f4_null_handling(spark, sf_dir):
    """F4 fill_null/coalesce: kloppy_polars.py:413-420,665."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(dec(F.coalesce(F.col("value"), F.lit(0.0)), 6)).cast("double").alias("sum_v"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("n_null_props"),
    )


@query(
    "f5_casts",
    oracle="""
    SELECT CAST(l_linenumber AS VARCHAR) AS line_str,
           CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS qty_trunc,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY 1, 2
    """,
)
def f5_casts(spark, sf_dir):
    """F5 schema-wide casts: kloppy_polars.py:532, graph_converter.py:392-397."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_linenumber").cast("string").alias("line_str"),
            F.col("l_quantity").cast("long").cast("double").alias("qty_trunc"),
        )
        .groupBy("line_str", "qty_trunc")
        .agg(F.count("*").alias("cnt"))
    )
