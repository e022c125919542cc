"""Bucketed co-located joins — the 100 TB shuffle-elimination pattern.

At scale, the dominant cost of a fact-fact join is shuffling both sides on
the join key. Spark's table bucketing (`bucketBy` + `sortBy` on write) makes
the join a zip of pre-hashed buckets: neither side exchanges at read time.
This test writes lineitem and orders bucketed by the join key into a temp
warehouse and asserts the join plan contains NO Exchange — the physical
proof the pattern works, mirrored from the reference's single-node world
where no shuffle exists to begin with."""

import pytest
from pyspark.sql import functions as F

from unravelsports_spark.session import read_table

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def warehouse_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = read_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = read_table(spark, SF_CORRECT, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(wh / "b_lineitem"))
       .mode("overwrite").format("parquet").saveAsTable("b_lineitem"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(wh / "b_orders"))
       .mode("overwrite").format("parquet").saveAsTable("b_orders"))
    yield spark.table("b_lineitem"), spark.table("b_orders")
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, warehouse_tables):
    li, orders = warehouse_tables
    joined = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    # at sf0.01 the planner would broadcast (test data is tiny); disable it
    # to exercise the fact-fact path the pattern exists for at 100 TB
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: both sides pre-hashed into matching buckets → no shuffle
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        got = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    expected = (
        read_table(spark, SF_CORRECT, "lineitem")
        .join(
            read_table(spark, SF_CORRECT, "orders").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
        )
        .count()
    )
    assert got == expected


def test_bucketed_aggregation_has_no_exchange(spark, warehouse_tables):
    li, _ = warehouse_tables
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # groupBy on the bucket key reuses the write-time hash partitioning
    assert "Exchange" not in plan
