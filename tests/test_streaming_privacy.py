"""Incremental k-anonymity ledger (streaming/privacy_stream.py) — built
round 10. The merged report must equal the certified batch audit
(a23_k_anonymity's operator) on the union of the ingested batches,
exactly, and replays must not double-count."""

from pyspark.sql import functions as F

from .conftest import SF_CORRECT


def test_streaming_k_anonymity_equals_batch_report(spark, tmp_path):
    """Customer rows split across 3 micro-batches: the ledger-summed
    class-size histogram is BIT-identical to k_anonymity_report over the
    whole table (class counts are associative integer sums)."""
    from unravelsports_spark.operators.filtering import k_anonymity_report
    from unravelsports_spark.session import read_table
    from unravelsports_spark.streaming.privacy_stream import (
        k_anonymity_from_ledger,
        streaming_k_anonymity,
    )

    quasi = ["c_nationkey", "c_mktsegment"]
    c = read_table(spark, SF_CORRECT, "customer").select("c_custkey", *quasi)
    src = str(tmp_path / "src")
    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    schema = "c_custkey bigint, c_nationkey int, c_mktsegment string"

    for part in range(3):
        c.where(F.pmod("c_custkey", F.lit(3)) == part).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = streaming_k_anonymity(stream, quasi, ledger, ckpt).start()
        q.awaitTermination(120)

    got = sorted(
        map(tuple, k_anonymity_from_ledger(spark, ledger, quasi, k=5).collect())
    )
    want = sorted(map(tuple, k_anonymity_report(c, quasi, k=5).collect()))
    assert got == want and len(got) > 0


def test_streaming_k_anonymity_replay_idempotent(spark, tmp_path):
    """A replayed batch overwrites its own batch_id partition — class
    counts never double. Simulated by re-running the foreachBatch body for
    an already-written batch id (the crash-between-commit-and-checkpoint
    case every ledger twin here guards)."""
    from unravelsports_spark.streaming.privacy_stream import (
        k_anonymity_from_ledger,
        streaming_k_anonymity,
    )

    quasi = ["region", "gender"]
    rows = [(i, "NY", "M") for i in range(5)] + [(99, "ZZ", "F")]
    df = spark.createDataFrame(rows, ["id", "region", "gender"])
    src = str(tmp_path / "src")
    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    df.write.parquet(src)
    stream = spark.readStream.schema("id bigint, region string, gender string").parquet(src)
    q = streaming_k_anonymity(stream, quasi, ledger, ckpt).start()
    q.awaitTermination(120)

    # replay batch 0 by hand: identical delta lands on the same partition
    df.groupBy("region", "gender").agg(F.count("*").alias("n")).write.mode(
        "overwrite"
    ).parquet(f"{ledger}/batch_id=0")

    got = {
        r["class_size"]: (r["n_classes"], r["at_risk"])
        for r in k_anonymity_from_ledger(spark, ledger, quasi, k=5).collect()
    }
    assert got == {1: (1, True), 5: (1, False)}


def test_streaming_k_anonymity_gate_flips_as_classes_grow(spark, tmp_path):
    """The release-gate story: a class below k after batch 1 leaves the
    at-risk row once later batches grow it past k (new rows only ever GROW
    classes)."""
    from unravelsports_spark.streaming.privacy_stream import (
        k_anonymity_from_ledger,
        streaming_k_anonymity,
    )

    quasi = ["region"]
    src = str(tmp_path / "src")
    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    schema = "id bigint, region string"

    spark.createDataFrame([(1, "NY"), (2, "NY")], ["id", "region"]).write.mode(
        "append"
    ).parquet(src)
    q = streaming_k_anonymity(
        spark.readStream.schema(schema).parquet(src), quasi, ledger, ckpt
    ).start()
    q.awaitTermination(120)
    first = {
        r["class_size"]: r["at_risk"]
        for r in k_anonymity_from_ledger(spark, ledger, quasi, k=3).collect()
    }
    assert first == {2: True}

    spark.createDataFrame([(3, "NY"), (4, "NY")], ["id", "region"]).write.mode(
        "append"
    ).parquet(src)
    q = streaming_k_anonymity(
        spark.readStream.schema(schema).parquet(src), quasi, ledger, ckpt
    ).start()
    q.awaitTermination(120)
    second = {
        r["class_size"]: r["at_risk"]
        for r in k_anonymity_from_ledger(spark, ledger, quasi, k=3).collect()
    }
    assert second == {4: False}
