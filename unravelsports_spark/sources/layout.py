"""Storage-layout maintenance: small-file compaction and Z-ordered writes.

Both are table-maintenance operations a 100 TB lakehouse runs continuously:

- `compact_parquet`: the small-files problem — streaming/batch appends leave
  thousands of tiny files whose per-file open/footer costs dominate scans.
  Rewrite to ~target-sized files, atomically (write to a sibling temp dir,
  swap on success; readers never see a partial state on a posix FS — object
  stores would use a manifest/catalog swap instead).
- `write_zordered`: sort by the Morton-interleaved key of two columns before
  writing, so parquet row-group min/max statistics become selective for
  range predicates on EITHER (or both) dimensions — the multi-dimensional
  data-skipping layout (`o15_morton_key` is the key itself;
  `tests/test_layout.py` measures the row-group stat tightening with
  pyarrow metadata).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ceil(bytes/target) files; returns the
    new file count. Size-based (not count-based): the right file count falls
    out of the data volume, so the same call works at any scale."""
    files = parquet_files(path)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, (total + target_file_mb * 1024 * 1024 - 1) // (target_file_mb * 1024 * 1024))
    tmp = f"{path.rstrip('/')}._compact_{uuid.uuid4().hex[:8]}"
    # coalesce (no shuffle) is correct here: we only reduce file count
    spark.read.parquet(path).coalesce(int(n_out)).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}._old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(parquet_files(path))


def morton_key(col_a: str, col_b: str, bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of two integer columns' low ``bits``."""

    def spread(c: F.Column) -> F.Column:
        v = c.cast("bigint") % (1 << bits)
        for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
            v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
        return v

    return spread(F.col(col_a)).bitwiseOR(F.shiftleft(spread(F.col(col_b)), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered by the Z-order of (col_a, col_b): range-
    partition on the Morton key (so each FILE owns a key range), then sort
    within partitions (so each ROW GROUP's min/max stats are tight). Range
    predicates on either column then skip most row groups at scan time."""
    (
        df.withColumn("_z", morton_key(col_a, col_b))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_embeddings_by_cell(
    df,
    coarse_cb,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Write an embedding table partitioned by its IVF coarse cell — the
    storage layout that turns ANN probe filters into partition pruning (the
    scan reads only the probed cells' directories, so a 2-of-64-cell probe
    touches ~3 % of a 100 TB vector corpus before any operator runs).

    ``coarse_cb`` is a 1-subspace integer codebook from
    ``operators.pq.pq_train_codebook(m_subspaces=1)``; the cell assignment
    is the same exact-int projection the query path uses, so reader and
    writer can never disagree about a vector's cell."""
    from ..operators.pq import _cell_and_residual

    cells = _cell_and_residual(df, coarse_cb, vec_col, id_col).select(
        F.col("_id").alias(id_col), "cell"
    )
    df.join(cells, id_col).write.partitionBy("cell").mode("overwrite").parquet(path)


def read_probed_cells(spark, path: str, cells) -> "F.DataFrame":
    """Read only the probed cells of a cell-partitioned embedding table —
    pairs with :func:`write_embeddings_by_cell`; the ``cell`` filter is a
    partition filter (directory pruning), never a data scan."""
    return spark.read.parquet(path).filter(F.col("cell").isin([int(c) for c in cells]))


def write_surt_clustered(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    n_files: int = 8,
    surt_col: str = "surt",
) -> None:
    """Write ``df`` clustered by the SURT key of ``url_col`` (r14): range-
    partition on the key (each FILE owns a contiguous SURT range — and the
    reversed-host form makes a domain's whole subtree contiguous), then
    sort within partitions (tight per-row-group min/max). A host- or
    domain-scoped read then prunes to the files whose [min, max] straddle
    that prefix — the web-archive layout (CDX convention) expressed as
    parquet data skipping. The key is WRITTEN as ``surt_col`` (skipping
    needs the column present; StringStartsWith pushes to the parquet
    footer stats); rows whose URL does not canonicalize (NULL key) sort
    into the first range rather than vanishing."""
    from ..operators.urlnorm import surt_key

    if surt_col in df.columns:
        raise ValueError(f"surt_col {surt_col!r} is already a column of the input")
    (
        df.withColumn(surt_col, surt_key(F.col(url_col)))
        .repartitionByRange(n_files, surt_col)
        .sortWithinPartitions(surt_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bloom_indexed(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    expected_ndv: int | None = None,
) -> None:
    """Write parquet with a BLOOM FILTER per row group on ``bloom_cols``
    (r14): the point-lookup complement to the range layouts above. Sorted
    min/max stats (Z-order, SURT clustering) prune RANGE predicates; an
    equality probe on a high-cardinality key (exact URL, doc_id, content
    hash) still touches every row group whose [min, max] happens to
    straddle the value — the bloom filter answers "definitely not in
    this row group" from the footer, no column data read. Spark's
    vectorized reader consumes them automatically for `=` / IN
    predicates under the default parquet filter pushdown.

    ``expected_ndv`` sizes the filter (distinct values per ROW GROUP —
    overshooting wastes footer bytes, undershooting raises the false-
    positive rate; parquet's default block size self-sizes when None).
    Cost is footer-only: ~1.2 MB per 1M ndv per row group at the default
    FPP. Audit the result with :func:`parquet_bloom_offsets`.

    At 100 TB: a decontamination / takedown / targeted-refetch probe
    ("is THIS url/hash in the corpus?") over bloom-indexed shards reads
    footers + the rare candidate row groups, not the key column of every
    shard — the same IO shape the CDX sidecars give the WARC archive,
    expressed natively in parquet."""
    # fail LOUD at call time (r14 review #2): parquet silently ignores a
    # bloom option naming a column the schema lacks, so a typo would
    # write a filterless table the advertised probe then full-scans
    missing = [c for c in bloom_cols if c not in df.columns]
    if missing:
        raise ValueError(f"bloom_cols not in the frame: {missing}")
    w = df.write
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if expected_ndv is not None:
            w = w.option(
                f"parquet.bloom.filter.expected.ndv#{c}", str(int(expected_ndv))
            )
    w.mode("overwrite").parquet(path)


def parquet_bloom_offsets(spark: SparkSession, file_path: str) -> dict:
    """Footer audit for :func:`write_bloom_indexed`: per-column bloom
    filter offset of the FIRST row group of one parquet file (-1 = no
    filter written), read through parquet-java via the session JVM — the
    same footer the scan consults, so this is evidence, not inference.
    A zero-row-group file (an empty partition's shard) returns {} —
    nothing to audit, not an error (r14 review #3)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(file_path), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        blocks = reader.getFooter().getBlocks()
        if blocks.size() == 0:
            return {}
        cols = blocks.get(0).getColumns()
        return {
            cols.get(i).getPath().toDotString(): cols.get(i).getBloomFilterOffset()
            for i in range(cols.size())
        }
    finally:
        reader.close()
