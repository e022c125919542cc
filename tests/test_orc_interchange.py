"""ORC interchange (engine §2.1 surface, round 10): the corpus tables
round-trip through Spark's built-in ORC datasource with predicate pushdown
intact — the migration checkbox for users whose existing lake is ORC.
Deliberately NO wrapper module: `spark.read/write.orc` IS the
implementation; what needs proving is lossless round-trip against the
parquet originals and that filters still reach the ORC scan."""

from pyspark.sql import functions as F

from .conftest import SF_CORRECT


def test_orc_roundtrip_matches_parquet_originals(spark, duck, tmp_path):
    from unravelsports_spark.session import read_table

    docs = read_table(spark, SF_CORRECT, "documents").select(
        "doc_id", "source", "text"
    )
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = spark.read.orc(path)
    got = sorted(
        map(
            tuple,
            back.groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).alias("total_chars"),
                F.sum("doc_id").alias("sum_ids"),
            )
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            duck.execute(
                """
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM documents GROUP BY source
        """
            ).fetchall(),
        )
    )
    assert got == want and len(got) == 20


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    """The 100 TB property: a selective predicate lands in the ORC
    reader's PushedFilters and a 2-column projection reads a 2-column
    schema — same discipline the parquet plan guards pin."""
    from unravelsports_spark.session import read_table

    lineitem = read_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate", "l_returnflag"
    )
    path = str(tmp_path / "li_orc")
    lineitem.write.orc(path)
    df = (
        spark.read.orc(path)
        .where(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan
    assert df.count() > 0
