"""CDX-style WARC index (sources/warc.py, r14: write_warc(index=True) →
read_warc_index → fetch_warc_record / read_warc_by_index) — built round
14, driver registration queued r15 (`o21_warc_index_fetch`).
O21_WARC_INDEX_SQL verified here is the r15 oracle; `_warc_index_query`
is the query shape that moves to the plans registry at registration (the
corpus10 discipline). The oracle is the o18/o19 boundary style: the
rollup is recomputed from the ORIGINAL parquet — offsets/lengths exist
only between the writer's sidecars and the seek-reader, so putting the
FETCHED-VIA-INDEX text fingerprints in the driver hash makes every
offset load-bearing; fp_surt additionally pins the index's SURT keys
(closed-form derivable from the synthesis arithmetic)."""

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from .conftest import SF_CORRECT

O21_WARC_INDEX_SQL = """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_sum,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(CAST(('0x' || substring(md5(
             'example,' || source || ')/doc' || doc_id), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_surt
    FROM documents GROUP BY source
"""


def _warc_index_query(spark, sf_dir):
    """The r15 o21_warc_index_fetch query shape: documents → indexed
    per-record-gzip WARC export → read_warc_index (SURT-keyed) →
    read_warc_by_index re-reads EVERY record by its (shard, offset,
    length) span → per-source rollup equal to DuckDB on the ORIGINAL
    parquet. The text fingerprints ride through the seek-reader, so one
    wrong offset/length flips the driver hash; fp_surt pins the index
    keys themselves."""
    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.session import read_table
    from unravelsports_spark.sources.warc import (
        read_warc_by_index,
        read_warc_index,
        write_warc,
    )

    tmp = tempfile.mkdtemp(prefix="spark_graft_cdx_")
    try:
        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.concat(
                F.lit("http://"), "source", F.lit(".example/doc"), "doc_id"
            ).alias("target_uri"),
            F.encode("text", "UTF-8").alias("payload"),
        )
        write_warc(docs, tmp, gzip_records=True, index=True).collect()
        idx = read_warc_index(spark, tmp)
        fetched = read_warc_by_index(idx, tmp).select(
            F.regexp_extract("target_uri", r"^http://([^.]+)\.", 1).alias("source"),
            F.regexp_extract("target_uri", r"/doc(\d+)$", 1).cast("long").alias(
                "doc_id"
            ),
            F.col("payload").cast("string").alias("text"),
        )
        surt_fp = F.conv(F.substring(F.md5("surt"), 1, 8), 16, 10).cast("long")
        surt_by_source = (
            idx.select(
                F.regexp_extract("uri", r"^http://([^.]+)\.", 1).alias("source"),
                surt_fp.alias("sfp"),
            )
            .groupBy("source")
            .agg(F.sum("sfp").alias("fp_surt"))
        )
        fp = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
        rollup = (
            fetched.groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).alias("total_chars"),
                F.sum(fp).alias("fp_sum"),
                F.sum("doc_id").alias("id_sum"),
            )
            .join(surt_by_source, "source")
        )
        rows = rollup.collect()
        return spark.createDataFrame(rows, rollup.schema)
    finally:
        release_tracked()
        shutil.rmtree(tmp, ignore_errors=True)


def test_warc_index_fetch_matches_duckdb(spark, duck):
    got = sorted(map(tuple, _warc_index_query(spark, SF_CORRECT).collect()))
    want = sorted(map(tuple, duck.execute(O21_WARC_INDEX_SQL).fetchall()))
    assert got == want and len(got) == 20


def _export(spark, tmp, gzip_records, n=12):
    from unravelsports_spark.sources.warc import write_warc

    rows = [
        (f"http://h{i % 3}.example/p{i}", f"payload {i} body".encode(), f"<id{i}>")
        for i in range(n)
    ]
    # ONE shard: span tests rely on multiple records per file
    df = spark.createDataFrame(
        rows, "target_uri string, payload binary, record_id string"
    ).coalesce(1)
    return write_warc(df, tmp, gzip_records=gzip_records, index=True).collect()


@pytest.mark.parametrize("gz", [False, True])
def test_single_record_fetch_roundtrip(spark, tmp_path, gz):
    """Every index row fetches back exactly its record — both layouts
    (plain record span / gzip member span)."""
    from unravelsports_spark.sources.warc import fetch_warc_record, read_warc_index

    tmp = str(tmp_path / f"arch_{gz}")
    manifest = _export(spark, tmp, gz)
    assert all(m["index_shard"] for m in manifest)
    idx = read_warc_index(spark, tmp).collect()
    assert len(idx) == 12
    for r in idx:
        rec = fetch_warc_record(tmp, r["shard"], r["offset"], r["length"])
        assert rec["_corrupt_record"] is None
        assert rec["target_uri"] == r["uri"]
        num = r["uri"].rsplit("p", 1)[1]
        assert rec["payload"] == f"payload {num} body".encode()
        # the SURT key is the canonical reversed-host form
        host = r["uri"].split("/")[2].split(".")[0]
        assert r["surt"] == f"example,{host})/p{num}"


def test_fetch_bad_span_is_loud(spark, tmp_path):
    from unravelsports_spark.sources.warc import fetch_warc_record, read_warc_index

    tmp = str(tmp_path / "arch")
    _export(spark, tmp, False)
    r = read_warc_index(spark, tmp).collect()[0]
    with pytest.raises(ValueError, match="outside shard"):
        fetch_warc_record(tmp, r["shard"], r["offset"], 10_000_000)
    with pytest.raises(ValueError, match="expected exactly 1"):
        # a span covering two records decodes to 2 -> index mismatch
        fetch_warc_record(tmp, r["shard"], 0, r["length"] * 2)


def test_bulk_fetch_quarantines_stale_span(spark, tmp_path):
    """read_warc_by_index: a tampered span quarantines (the bulk-reader
    contract) instead of crashing the fetch job; clean spans in the same
    batch still decode."""
    from unravelsports_spark.sources.warc import read_warc_by_index, read_warc_index

    tmp = str(tmp_path / "arch")
    _export(spark, tmp, True)
    idx = read_warc_index(spark, tmp)
    tampered = idx.withColumn(
        "offset",
        # full-uri equality: endswith("p0") would also catch .../p10
        F.when(
            F.col("uri") == "http://h0.example/p0", F.col("offset") + 3
        ).otherwise(F.col("offset")),
    )
    out = read_warc_by_index(tampered, tmp).collect()
    bad = [r for r in out if r["_corrupt_record"] is not None]
    good = [r for r in out if r["_corrupt_record"] is None]
    assert len(bad) == 1 and len(good) == 11


def test_index_off_by_default(spark, tmp_path):
    from unravelsports_spark.sources.warc import write_warc

    df = spark.createDataFrame(
        [("http://h.example/p", b"x", "<i>")],
        "target_uri string, payload binary, record_id string",
    )
    tmp = str(tmp_path / "arch")
    manifest = write_warc(df, tmp).collect()
    assert all(m["index_shard"] is None for m in manifest)
    assert not [f for f in os.listdir(tmp) if f.endswith(".cdx")]


def test_sidecar_not_swept_by_record_readers(spark, tmp_path):
    """The .cdx sidecars must never match the record readers' *.warc*
    glob — an indexed export reads back with ZERO quarantines."""
    from unravelsports_spark.sources.jsonl import quarantine_counts
    from unravelsports_spark.sources.warc import read_warc

    tmp = str(tmp_path / "arch")
    _export(spark, tmp, True)
    qc = quarantine_counts(read_warc(spark, tmp)).first()
    assert qc["n_quarantined"] == 0 and qc["n_clean"] == 12


def test_index_determinism(spark, tmp_path):
    """Re-export with fixed record_ids publishes byte-identical sidecars
    (the retry/speculation idempotency contract extends to the index)."""
    tmp = str(tmp_path / "arch")
    m1 = _export(spark, tmp, True)
    sidecars1 = {
        m["index_shard"]: open(m["index_shard"], "rb").read() for m in m1
    }
    m2 = _export(spark, tmp, True)
    for m in m2:
        assert open(m["index_shard"], "rb").read() == sidecars1[m["index_shard"]]


def test_bulk_fetch_survives_missing_shard_and_bad_rows(spark, tmp_path):
    """The r14 review contract: a stale index (deleted shard), a negative
    offset, and a malformed sidecar line (all-NULL permissive-JSON row)
    each quarantine; clean spans in the same run still decode."""
    from unravelsports_spark.sources.warc import read_warc_by_index, read_warc_index

    tmp = str(tmp_path / "arch")
    _export(spark, tmp, True)
    # malformed sidecar line -> all-NULL row from the permissive reader
    cdx = [f for f in os.listdir(tmp) if f.endswith(".cdx")][0]
    with open(os.path.join(tmp, cdx), "ab") as fh:
        fh.write(b"this is not json\n")
    idx = read_warc_index(spark, tmp)
    assert idx.count() == 13  # 12 records + the malformed line
    doctored = (
        idx.withColumn(
            "offset",
            F.when(
                F.col("uri") == "http://h0.example/p0", F.lit(-7)
            ).otherwise(F.col("offset")),
        )
        .withColumn(
            "shard",
            F.when(
                F.col("uri") == "http://h1.example/p1", F.lit("gone.warc.gz")
            ).otherwise(F.col("shard")),
        )
    )
    out = read_warc_by_index(doctored, tmp).collect()
    bad = [r for r in out if r["_corrupt_record"] is not None]
    good = [r for r in out if r["_corrupt_record"] is None]
    assert len(good) == 10 and len(bad) == 3
    reasons = " | ".join(r["_corrupt_record"] for r in bad)
    assert "bad index row" in reasons and "missing shard" in reasons
