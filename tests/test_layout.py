"""Storage-layout maintenance: compaction reduces file count losslessly;
Z-ordered writes measurably tighten parquet row-group statistics (the
data-skipping proof, read straight from the parquet footers)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from unravelsports_spark.session import read_table
from unravelsports_spark.sources.layout import (
    compact_parquet,
    parquet_files,
    write_zordered,
)

from .conftest import SF_CORRECT


def test_compact_parquet_lossless(spark, tmp_path):
    path = str(tmp_path / "frag")
    li = read_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    li.repartition(40).write.parquet(path)
    assert len(parquet_files(path)) == 40
    before = li.count()
    n_after = compact_parquet(spark, path, target_file_mb=128)
    assert n_after < 5
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    # value-lossless, not just count-lossless
    assert (
        after_df.agg(F.sum("l_quantity")).head()[0]
        == li.agg(F.sum("l_quantity")).head()[0]
    )


def _rowgroup_avg_range(path_dir, column):
    """Mean (max-min) width of `column` across all row groups of all files."""
    widths, total = [], 0
    for f in parquet_files(path_dir):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            col = next(
                meta.row_group(rg).column(i)
                for i in range(meta.num_columns)
                if meta.row_group(rg).column(i).path_in_schema == column
            )
            st = col.statistics
            widths.append(st.max - st.min)
            total += 1
    return sum(widths) / len(widths)


def test_zorder_tightens_rowgroup_stats(spark, tmp_path):
    # 256x256 key grid: each of the 16 z-ranges fixes the top 2 bits of BOTH
    # dimensions, so each file's x and y ranges shrink to ~1/4 of the domain.
    # (With a lopsided domain — e.g. lineitem's 2000x100 keys — the z-curve
    # spends its top bits on the wide dimension first; same math, less tidy.)
    df = (
        spark.range(100_000)
        .selectExpr(
            "cast(hash(id) % 256 + 256 as bigint) % 256 as x",
            "cast(hash(id + 7) % 256 + 256 as bigint) % 256 as y",
            "id as payload",
        )
    )
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(16).write.parquet(plain)  # arrival order: stats are useless
    write_zordered(df, zord, "x", "y", n_files=16)

    assert spark.read.parquet(zord).count() == df.count()
    # BOTH dimensions' per-row-group ranges shrink substantially vs arrival order
    for col in ("x", "y"):
        plain_w = _rowgroup_avg_range(plain, col)
        z_w = _rowgroup_avg_range(zord, col)
        assert z_w < plain_w * 0.55, (col, plain_w, z_w)


def test_compact_empty_dir_raises(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(ValueError):
        compact_parquet(spark, str(d))


def test_surt_clustering_prunes_hosts(spark, tmp_path):
    """The SURT layout proof, read straight from the parquet footers: with
    range-partitioning on the SURT key, a single host's prefix intersects
    few files' [min, max] ranges; a hash-shuffled write spans every file
    with every host."""
    from unravelsports_spark.sources.layout import write_surt_clustered

    docs = read_table(spark, SF_CORRECT, "documents")
    urls = docs.select(
        F.concat(
            F.lit("http://"), "source", F.lit(".example/d"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "doc_id",
    )

    clustered = str(tmp_path / "clustered")
    write_surt_clustered(urls, clustered, n_files=8)

    def files_possibly_holding(path_dir, prefix):
        n = 0
        for f in parquet_files(path_dir):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                col = next(
                    meta.row_group(rg).column(i)
                    for i in range(meta.num_columns)
                    if meta.row_group(rg).column(i).path_in_schema == "surt"
                )
                st = col.statistics
                lo, hi = st.min, st.max
                if lo <= prefix + "￿" and hi >= prefix:
                    n += 1
                    break
        return n

    # one host's subtree: SURT prefix 'example,src7)' (host src7.example)
    prefix = "example,src7)"
    n_clustered = files_possibly_holding(clustered, prefix)
    assert 1 <= n_clustered <= 2  # range boundary may split one host

    # control: a hash-shuffled write spans the host across every file
    shuffled = str(tmp_path / "shuffled")
    from unravelsports_spark.operators.urlnorm import surt_key

    urls.withColumn("surt", surt_key(F.col("url"))).repartition(8).write.parquet(
        shuffled
    )
    assert files_possibly_holding(shuffled, prefix) == 8

    # lossless: every row survives, every key lands where stats claim
    assert spark.read.parquet(clustered).count() == urls.count()


def test_bloom_indexed_write_and_membership(spark, tmp_path):
    """Bloom layout proof, read from the same footer the scan consults
    (parquet-java via the JVM): the filter exists only on the requested
    column, answers present-key probes positively, and rejects absent
    keys — the 'definitely not in this row group' point-lookup layout."""
    from unravelsports_spark.sources.layout import (
        parquet_bloom_offsets,
        write_bloom_indexed,
    )

    docs = read_table(spark, SF_CORRECT, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("content_hash")
    )
    path = str(tmp_path / "bloomed")
    write_bloom_indexed(
        docs.coalesce(1), path, ["content_hash"], expected_ndv=1000
    )
    f = parquet_files(path)[0]
    offsets = parquet_bloom_offsets(spark, f)
    assert offsets["content_hash"] >= 0  # filter written
    assert offsets["doc_id"] == -1  # only where asked

    # membership through parquet-java — evidence the scan-side filter
    # discriminates, not just that bytes were appended
    jvm = spark._jvm
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(f), spark._jsc.hadoopConfiguration()
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        block = reader.getFooter().getBlocks().get(0)
        cols = block.getColumns()
        col = next(
            cols.get(i)
            for i in range(cols.size())
            if cols.get(i).getPath().toDotString() == "content_hash"
        )
        bf = reader.getBloomFilterDataReader(block).readBloomFilter(col)
        Binary = jvm.org.apache.parquet.io.api.Binary
        present = docs.select("content_hash").limit(5).collect()
        for r in present:
            h = bf.hash(Binary.fromString(r["content_hash"]))
            assert bf.findHash(h)
        absent_hits = sum(
            bool(bf.findHash(bf.hash(Binary.fromString(f"nope-{i}"))))
            for i in range(200)
        )
        assert absent_hits <= 2  # FPP well under the default 1%-ish
    finally:
        reader.close()

    # the layout never changes query RESULTS — equality probe identical
    probe = docs.limit(1).collect()[0]["content_hash"]
    got = (
        spark.read.parquet(path)
        .where(F.col("content_hash") == probe)
        .collect()
    )
    assert len(got) >= 1 and all(r["content_hash"] == probe for r in got)


def test_bloom_guards(spark, tmp_path):
    """r14 review: a typo'd bloom column fails loud (parquet would
    silently skip it); a zero-row-group shard audits to {}."""
    import pytest

    from unravelsports_spark.sources.layout import (
        parquet_bloom_offsets,
        write_bloom_indexed,
    )

    docs = read_table(spark, SF_CORRECT, "documents").select("doc_id")
    with pytest.raises(ValueError, match="bloom_cols not in the frame"):
        write_bloom_indexed(docs, str(tmp_path / "x"), ["doc_idd"])
    empty = str(tmp_path / "empty")
    docs.where(F.lit(False)).coalesce(1).write.parquet(empty)
    f = parquet_files(empty)[0]
    assert parquet_bloom_offsets(spark, f) == {}
