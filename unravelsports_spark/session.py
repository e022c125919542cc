"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the config below is chosen so the same code
is correct and fast on a real multi-executor cluster:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting)
- Arrow on (every model kernel is an Arrow grouped-map pandas UDF)
- shuffle partitions sized for the local test harness; on a cluster AQE
  re-plans the number at runtime from map-output statistics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "unravelsports-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce to the target advisory size rather than keeping max
        # parallelism — fewer, fuller reducers (recommended production
        # setting; also trims task-scheduling overhead on local[N])
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local test files are ~10 MB — split them so scans parallelize across
        # cores; on a real cluster with many files this setting is harmless
        # (AQE coalesces small partitions back together)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str, refresh: bool = False):
    """Parquet scan of one synthetic table; Catalyst handles predicate
    pushdown + column pruning from whatever plan is built on top.

    ``refresh=True`` bypasses and replaces this path's cached analyzed
    DataFrame (ADVICE r8 #3): callers that REWRITE a parquet dir
    mid-session can re-read in place instead of remembering the global
    ``read_table_cache_clear()`` — the stale-entry failure mode is silent
    wrong data, so the local escape hatch is worth the parameter.

    The events table has shipped as TIMESTAMP(NANOS) (which Spark 4 refuses
    to read natively — it surfaces as long under the legacy conf) and as
    TIMESTAMP(MICROS) (read natively) in different testdata generations; we
    sniff the loaded dtype and rebuild a microsecond timestamp from nanos
    with integer division (`div`, no double round-trip → no precision loss)
    only when needed.

    Both confs here are runtime-settable on purpose: the driver harness runs
    queries on ITS OWN SparkSession, so anything the engine needs must be set
    at query time, not at session build. UTC makes `unix_millis` over the
    parquet TIMESTAMP_NTZ columns match DuckDB's epoch_ms on naive
    timestamps regardless of the host timezone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if _TABLE_CACHE and _TABLE_CACHE_SESSION[0] is not spark:
        # single-generation cache: a new/recreated session evicts the old
        # session's entries wholesale (DataFrames strongly reference their
        # session, so keeping them would pin the dead session's state)
        _TABLE_CACHE.clear()
    _TABLE_CACHE_SESSION[0] = spark
    key = (sf_dir, name)
    if refresh:
        _TABLE_CACHE.pop(key, None)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark.read.parquet(table_path(sf_dir, name)))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    _TABLE_CACHE[key] = df
    return df


#: analyzed-DataFrame reuse per (dir, table) for ONE session generation:
#: parquet schema inference launches a footer-read JOB at DataFrame
#: creation, so a registry sweep that re-reads the same ten tables per
#: query pays hundreds of footer jobs. DataFrames are immutable lazy plans
#: — reusing one across queries changes nothing downstream. The cache
#: holds the CURRENT session's entries only (a different session object
#: clears it first — see read_table), so stopped sessions and their plans
#: are never pinned. Tests that rewrite a parquet path mid-session must
#: call ``read_table_cache_clear()``.
_TABLE_CACHE: dict = {}
_TABLE_CACHE_SESSION: list = [None]


def read_table_cache_clear() -> None:
    _TABLE_CACHE.clear()
    _TABLE_CACHE_SESSION[0] = None


def normalize_events_ts(df):
    """Events ``ts`` → TIMESTAMP_LTZ regardless of how the parquet shipped.

    TIMESTAMP(NANOS) surfaces as bigint under the legacy conf — rebuild
    microseconds with integer division (``div``, no double round-trip → no
    precision loss). TIMESTAMP(MICROS) reads natively as timestamp_ntz —
    the NTZ→LTZ cast under the UTC session is the identity instant and
    keeps ``unix_millis`` / ``F.window`` downstream happy. Shared by
    ``read_table`` and the streaming readers so batch and stream paths
    cannot drift."""
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def widen_narrow_scan(df):
    """Round-robin repartition to cluster parallelism — ONLY when the scan
    is narrower than the cluster.

    For expression-heavy per-row chains (interpreted HOF lambdas, per-doc
    md5 grams) a compressed-parquet scan of a small/hot table can land in
    fewer splits than there are cores (sf0.1 documents.parquet is 580 KB →
    one split even at maxPartitionBytes=4m), serializing CPU-bound work on
    one core. At production scale the scan already yields >= parallelism
    splits and this is a structural NO-OP — no shuffle is ever added to a
    wide scan, so the 100 TB plan is unchanged.

    ``getNumPartitions`` compiles the plan to an RDD but launches no job.
    Classic-API only (ADVICE r7 #2): ``df.rdd`` and ``sparkContext`` are
    unsupported under Spark Connect, so a Connect session degrades to the
    identity pass-through — correctness is unaffected (this helper is a
    pure parallelism hint) and a Connect deployment is a real multi-node
    cluster where the scan is already wide.
    """
    try:
        sc = df.sparkSession.sparkContext
        par = sc.defaultParallelism
        narrow = df.rdd.getNumPartitions() < par
    except Exception:  # Spark Connect: no sparkContext / RDD bridge
        return df
    if narrow:
        return df.repartition(par)
    return df


def repartition_for_kernel(df, keys):
    """Pin an explicit hash partitioning on the grouped-map kernel keys.

    Python kernel stages are CPU-bound per group, not byte-bound; AQE's
    byte-based partition coalescing would happily pack a few-MB shuffle into
    one task and serialize all kernel work. An explicit numPartitions is
    exempt from AQE coalescing, and hash-partitioning on exactly the groupBy
    keys means the following groupBy reuses the exchange (no second shuffle).
    On a cluster defaultParallelism is the executor-core total, so the same
    call scales out unchanged.
    """
    from pyspark.sql import functions as F

    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *[F.col(k) for k in keys])
