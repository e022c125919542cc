"""Salted aggregation / join equivalence with their unsalted forms."""

from pyspark.sql import functions as F

from unravelsports_spark.operators.skew import salted_agg, salted_explode_join, with_salt

from .conftest import SF_CORRECT


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): (r["cnt"], r["qty"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["cnt"], r["qty"])
        for r in salted_agg(
            li,
            keys=["l_returnflag"],
            partial_aggs=[
                F.count("*").alias("c"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
            ],
            final_aggs=[F.sum("c").alias("cnt"), F.sum("q").alias("qty")],
            n_salts=8,
            unique_col="l_orderkey",
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    cust = spark.read.parquet(f"{SF_CORRECT}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, ["o_custkey"]).groupBy("c_mktsegment").count()
    salted = salted_explode_join(orders, cust, on=["o_custkey"], n_salts=4).groupBy(
        "c_mktsegment"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_distribution(spark):
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet").limit(10000)
    counts = [
        r["count"]
        for r in with_salt(li, 8, unique_col="l_orderkey").groupBy("_salt").count().collect()
    ]
    assert len(counts) == 8
    # hash salt spreads the hot key roughly uniformly
    assert max(counts) < 2.5 * min(counts)
