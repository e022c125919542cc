"""Structured-Streaming veneer (SURVEY §2.9).

The reference is batch-only; its temporal semantics (EFPI tumbling windows,
possession sessionization) map onto Structured Streaming as below. These
wrappers work identically on batch DataFrames and on `readStream` inputs —
the same plan runs in both modes, which is the whole point of expressing the
segmentation relationally.

- tumbling/sliding: `F.window` (EFPI dt.truncate '5m' ↔ efpi.py:575-585)
- session_window: gap-based sessions (Spark-native; note the reference's
  possession segmentation is change-based, not gap-based — that one stays the
  lag+cumsum formulation in batch, or `applyInPandasWithState` in streaming)
- with_watermark: late-data bound for stateful streaming aggs
- stateful_running_counts: `applyInPandasWithState` example operator — the
  mechanism EFPI's cross-frame hysteresis (K13) needs under streaming.

Ledger-twin caveat (VERDICT r10 #7): every foreachBatch ledger writer here
(streaming_incremental_dedup, streaming_semdedup, streaming_neardup_dedup,
streaming_shard_append, streaming_term_stats, streaming_user_days,
streaming_ann_ingest) keys its output by batch_id from the CHECKPOINT's
numbering — the ledger and checkpoint lifetimes are coupled (wipe both or
neither). Restarting with a fresh checkpoint against a surviving ledger
re-numbers batches from 0 and double-counts history in any ledger sum.
These writers carry no runtime guard (privacy_stream.py's batch-0 guard is
a best-effort local-FS glob that object-store listing semantics defeat);
the coupling is the caller contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def with_watermark(df: DataFrame, ts_col: str, delay: str = "10 minutes") -> DataFrame:
    return df.withWatermark(ts_col, delay)


def tumbling_agg(
    df: DataFrame, ts_col: str, duration: str, keys: Sequence[str], aggs: Sequence
) -> DataFrame:
    return df.groupBy(*keys, F.window(ts_col, duration).alias("window")).agg(*aggs)


def sliding_agg(
    df: DataFrame, ts_col: str, duration: str, slide: str, keys: Sequence[str], aggs: Sequence
) -> DataFrame:
    return df.groupBy(*keys, F.window(ts_col, duration, slide).alias("window")).agg(*aggs)


def session_agg(
    df: DataFrame, ts_col: str, gap: str, keys: Sequence[str], aggs: Sequence
) -> DataFrame:
    return df.groupBy(*keys, F.session_window(ts_col, gap).alias("session")).agg(*aggs)


def stateful_running_counts(df: DataFrame, key_col: str, ts_col: str):
    """Streaming stateful operator: per-key running event count + last-seen
    timestamp carried in GroupState across micro-batches. The template for
    porting K13-style sequential state to streaming."""
    import pandas as pd

    out_schema = f"{key_col} string, n_events long, batch_events long"
    state_schema = "n long"

    def fn(key, pdfs, state):
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        (n,) = state.get if state.exists else (0,)
        n += batch
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "batch_events": [batch]})

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first row per key wins, state bounded by the
    watermark (`dropDuplicatesWithinWatermark` — keys older than the delay
    are evicted, so state never grows unboundedly; the batch twin is plain
    dropDuplicates). The streaming face of `operators/dedup.exact_dedup`
    for document-id / fingerprint dedup on live ingest."""
    if ts_col is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def streaming_incremental_dedup(
    stream_df,
    ledger_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Exactly-once corpus ingestion dedup via ``foreachBatch``: every
    micro-batch anti-joins the durable fingerprint ledger (parquet, keyed by
    fingerprint), writes the survivors to ``out_dir`` and appends their
    fingerprints to the ledger — the streaming twin of
    `operators.dedup.incremental_dedup`, and the standard shape for
    continuously ingesting a 100 TB corpus: the ledger is the only state,
    it lives in storage (not executor memory), and replaying a batch is a
    no-op because its fingerprints are already present.

    foreachBatch is the right tool (vs dropDuplicatesWithinWatermark) when
    the dedup horizon is ALL history, not a watermark window.

    Exactly-once across failures (ADVICE r3): both writes are keyed by
    ``batch_id`` — survivors go to ``{out_dir}/batch_id=N`` and ledger rows
    to ``{ledger_dir}/batch_id=N``, each with overwrite semantics — so a
    replay after a crash between the two writes overwrites its own partition
    instead of appending duplicates. The replayed batch excludes its *own*
    ledger partition when reading ``seen`` (otherwise a partially-committed
    ledger write would make the batch dedup against itself and emit
    nothing). Readers of ``out_dir`` see an extra ``batch_id`` partition
    column."""
    from ..operators.dedup import incremental_dedup

    def _process(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        seen = _read_ledger(spark, ledger_dir, exclude_batch=batch_id)
        kept = incremental_dedup(batch_df, seen, text_col=text_col, id_col=id_col)
        kept.persist()
        try:
            kept.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
            kept.select("fingerprint").write.mode("overwrite").parquet(
                f"{ledger_dir}/batch_id={batch_id}"
            )
        finally:
            kept.unpersist()

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def streaming_semdedup(
    stream_df,
    planes,
    ledger_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.4,
    n_tables: int = 4,
    bits_per_table: int = 4,
    id_col: str = "vec_id",
    v_col: str = "v",
    ledger_mode: str = "all",
):
    """Exactly-once EMBEDDING near-dup ingestion via ``foreachBatch`` — the
    SemDeDup twin of :func:`streaming_incremental_dedup`: every micro-batch
    buckets its vectors with the pipeline's fixed hyperplane model
    (``planes`` — chosen once, so all batches bucket identically),
    verifies candidates against the durable bucketed-vector ledger plus
    lower-id in-batch vectors (operators/similarity.py:
    incremental_semdedup), writes the surviving vectors to ``out_dir`` and
    ledger-format rows (vec_id, tbl, bucket, v, n2, kept) to the ledger.

    ``ledger_mode`` picks the chaining semantics (see incremental_semdedup):
    ``"all"`` (default) persists every row — removed vectors stay removal
    witnesses, so output is EXACTLY the one-shot batch removal set for
    id-ordered arrival, independent of micro-batch boundaries; ``"kept"``
    persists survivors only — smaller ledger, greedy kept-only semantics
    (batch-boundary-dependent when a removed vector is the sole witness
    for a later one).

    Same exactly-once discipline as the text dedup: both writes are keyed
    by ``batch_id`` with overwrite semantics, and a replayed batch excludes
    its own ledger partition. The ledger is stored BY the (tbl, bucket)
    join key it is probed on — at 100 TB the per-batch verify touches only
    the buckets the new vectors hash into, never the full history."""
    from ..operators.similarity import incremental_semdedup

    if ledger_mode not in ("all", "kept"):
        raise ValueError(f"ledger_mode must be 'all' or 'kept', got {ledger_mode!r}")

    def _process(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        seen = _read_ledger(spark, ledger_dir, exclude_batch=batch_id)
        flagged = incremental_semdedup(
            batch_df,
            planes,
            seen=seen,
            threshold=threshold,
            n_tables=n_tables,
            bits_per_table=bits_per_table,
            id_col=id_col,
            v_col=v_col,
        )
        flagged.persist()
        try:
            ledger_rows = flagged if ledger_mode == "all" else flagged.filter("kept")
            ledger_rows.write.mode("overwrite").parquet(
                f"{ledger_dir}/batch_id={batch_id}"
            )
            flagged.filter("kept").select("vec_id", "v").dropDuplicates(
                ["vec_id"]
            ).write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        finally:
            flagged.unpersist()

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _read_ledger(spark, ledger_dir: str, exclude_batch: int | None = None):
    """Read a batch-partitioned dedup ledger, excluding ``exclude_batch``'s
    own partition (replay self-exclusion). Returns None if the ledger doesn't
    exist yet (first batch)."""
    import os

    # plain-path existence probe avoids a noisy AnalysisException on the
    # first batch; object-store URIs fall through to the read-and-catch
    if "://" not in ledger_dir and not os.path.isdir(ledger_dir):
        return None
    try:
        seen = spark.read.parquet(ledger_dir)
    except Exception:
        return None
    if exclude_batch is not None and "batch_id" in seen.columns:
        from pyspark.sql import functions as F

        seen = seen.filter(F.col("batch_id") != exclude_batch)
    return seen


def compact_dedup_ledger(spark, ledger_dir: str, key_cols: Sequence[str]) -> int:
    """Compact an append-only batch-partitioned dedup ledger into one
    distinct-keyed partition ``batch_id=-1`` (the "historic" sentinel — never
    equal to a real replayed batch id, so replay self-exclusion keeps working)
    and drop the per-batch partitions. Returns the compacted row count.

    Run only while the stream is stopped and its checkpoint committed (the
    normal maintenance window). Crash-safe and idempotent: the historic
    partition is written before the per-batch partitions are removed, and a
    crash in between merely leaves redundant rows whose extra copies change
    no anti-join/semi-join outcome — re-running compaction converges."""
    import os
    import shutil

    from pyspark.sql import functions as F  # noqa: F401  (parity with callers)

    ledger = spark.read.parquet(ledger_dir)
    compacted = ledger.select(*key_cols).distinct()
    compacted.persist()
    try:
        n = compacted.count()
        # stage to a sibling dir first: batch_id=-1 may itself be an input
        staged = f"{ledger_dir}.compact.tmp"
        compacted.coalesce(max(1, n // 4_000_000 + 1)).write.mode(
            "overwrite"
        ).parquet(staged)
        old = [
            e for e in os.listdir(ledger_dir)
            if e.startswith("batch_id=") and os.path.isdir(f"{ledger_dir}/{e}")
        ]
        spark.read.parquet(staged).write.mode("overwrite").parquet(
            f"{ledger_dir}/batch_id=-1"
        )
        for e in old:
            if e != "batch_id=-1":
                shutil.rmtree(f"{ledger_dir}/{e}", ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
    finally:
        compacted.unpersist()
    return n


def streaming_neardup_dedup(
    stream_df,
    ledger_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
):
    """Near-duplicate streaming ingestion — the MinHash/LSH twin of
    :func:`streaming_incremental_dedup`. Every micro-batch:

    1. computes MinHash band keys for its documents;
    2. drops documents with ANY band key already in the durable band ledger
       (first-seen-wins across batches);
    3. self-dedups the batch — a document with an LSH candidate pair to a
       lower-id batch document is dropped;
    4. appends the survivors' band keys to the ledger and the survivors to
       ``out_dir``.

    The ledger is (band, key) pairs — bands × n_docs rows of small strings,
    orders of magnitude smaller than the corpus, and the anti-join is a
    co-keyed hash join on exactly the ledger's storage key. Documents too
    short to shingle carry no bands and are always kept (they can't be
    near-anything).

    Exactly-once across failures (ADVICE r3): survivors and band rows are
    written to ``batch_id=N``-keyed partitions with overwrite semantics, and
    a replayed batch excludes its own ledger partition when reading ``seen``
    — see :func:`streaming_incremental_dedup`. Compact the ledger between
    runs with :func:`compact_dedup_ledger` (``key_cols=("band", "key")``)."""
    from ..operators.dedup import (
        band_keys,
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    def _process(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        sigs = minhash_signatures(
            doc_shingles(batch_df, id_col=id_col, text_col=text_col), id_col=id_col
        )
        bk = band_keys(sigs, id_col=id_col, bands=bands, rows_per_band=rows_per_band)
        bk.persist()
        try:
            seen = _read_ledger(spark, ledger_dir, exclude_batch=batch_id)
            if seen is not None:
                hit = (
                    bk.join(seen.select("band", "key"), ["band", "key"], "left_semi")
                    .select(id_col)
                    .distinct()
                )
                survivors = batch_df.join(hit, id_col, "anti")
            else:
                survivors = batch_df
            # within-batch: any doc with a candidate pair to a lower id goes
            pairs = lsh_candidate_pairs(
                sigs, bands=bands, rows_per_band=rows_per_band, single_pass=False
            )
            dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
            survivors = survivors.join(dropped, id_col, "anti")
            survivors.persist()
            try:
                survivors.write.mode("overwrite").parquet(
                    f"{out_dir}/batch_id={batch_id}"
                )
                bk.join(survivors.select(id_col), id_col, "left_semi").select(
                    "band", "key"
                ).write.mode("overwrite").parquet(f"{ledger_dir}/batch_id={batch_id}")
            finally:
                survivors.unpersist()
        finally:
            bk.unpersist()

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stateful_running_counts_tws(df: DataFrame, key_col: str):
    """`stateful_running_counts` on Spark 4's transformWithStateInPandas —
    the successor stateful API (typed value/list/map state handles, timers,
    initial-state support; RocksDB-backed on a real cluster). Semantically
    identical to the applyInPandasWithState version above.

    Environment gate: the transformWithState runtime speaks protobuf to its
    state server; without `google.protobuf` installed the query would crash
    mid-stream, so raise a clear ImportError up front instead. The
    applyInPandasWithState twin has no such dependency and is the covered
    path in this container."""
    import pandas as pd

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf (state-server "
            "protocol); use stateful_running_counts (applyInPandasWithState)"
        ) from exc

    from pyspark.sql.streaming import StatefulProcessor

    class RunningCount(StatefulProcessor):
        def init(self, handle):
            self._count = handle.getValueState("n", "n long")

        def handleInputRows(self, key, rows, timerValues):
            batch = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            n = prev + batch
            self._count.update((n,))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "batch_events": [batch]}
            )

        def close(self):
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        RunningCount(),
        outputStructType=f"{key_col} string, n_events long, batch_events long",
        outputMode="Update",
        timeMode="None",
    )


def streaming_shard_append(
    stream_df,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_ranges: int = 64,
):
    """Continuous training-shard production via ``foreachBatch``: each
    micro-batch is packed onto the tail of the shard sequence the previous
    batches built — the streaming twin of
    :func:`~unravelsports_spark.operators.sharding.shard_assignments`, and
    the shape of a live pretraining-data pipeline (filtered docs stream in,
    fixed-token-budget shards stream out; a loader can start consuming shard
    k while shard k+1 is still filling).

    The only state is one number — the cumulative token total — persisted as
    a batch-keyed parquet ledger, so executors hold nothing between batches.
    Within a batch, documents pack in the deterministic ``(md5(text), id)``
    order via the same two-level distributed prefix sum as the batch
    operator (no single-reducer window); *across* batches, arrival order is
    preserved — the streaming semantics: a shard never reorders history.

    Exactly-once across failures (the ``streaming_incremental_dedup``
    contract): assignments go to ``{out_dir}/batch_id=N`` and the post-batch
    token total to ``{state_dir}/batch_id=N``, both overwrite-keyed by
    ``batch_id``; a replayed batch re-reads the total of the latest batch
    *before* it, so it reproduces identical shard ids and overwrites its own
    partitions instead of appending drift."""
    from ..operators.sharding import shard_assignments

    def _process(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        state = _read_ledger(spark, state_dir, exclude_batch=batch_id)
        if state is not None:
            state = state.filter(F.col("batch_id") < batch_id)
            row = state.orderBy(F.desc("batch_id")).limit(1).collect()
            base = int(row[0]["total_tokens"]) if row else 0
        else:
            base = 0
        assigned = shard_assignments(
            batch_df, budget, text_col=text_col, id_col=id_col,
            n_ranges=n_ranges, base_tokens=base,
        )
        assigned.persist()
        try:
            assigned.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
            total = assigned.agg(F.sum("n_tokens")).collect()[0][0] or 0
            spark.createDataFrame(
                [(int(base + total),)], "total_tokens bigint"
            ).write.mode("overwrite").parquet(f"{state_dir}/batch_id={batch_id}")
        finally:
            assigned.unpersist()

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


# -- incremental retrieval index: streaming BM25 corpus statistics -----------


def streaming_term_stats(
    stream_df,
    ledger_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Maintain the BM25 corpus statistics incrementally over a document
    stream: every micro-batch appends its MERGEABLE per-term deltas to a
    durable parquet ledger — one row per distinct term (term, df, tf:
    documents containing it and total occurrences in the batch) plus one
    corpus row (term NULL: df = batch doc count, tf = batch token total).
    ``term_stats_from_ledger`` sums the partitions into (n_docs, sum_dl,
    {term: df}) — exactly what ``bm25_scores(corpus_stats=...)`` consumes —
    so fresh documents score against an always-current index without EVER
    re-scanning the corpus: the 100 TB retrieval-index shape (stats are
    associative integer sums, so they merge across batches, shards, and
    clusters alike). Assumes each document arrives in exactly one batch
    (dedup upstream via streaming_incremental_dedup).

    Exactly-once: the single write is keyed by ``batch_id`` with overwrite
    semantics — a replayed batch overwrites its own partition, so deltas
    can never double-count."""
    from ..operators.retrieval import TOKEN_RE

    def _process(batch_df, batch_id: int):
        arr = F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)
        )
        # per-term df from exploded DISTINCT-per-doc tokens and tf from the
        # raw explode — no synthetic row ids (monotonically_increasing_id
        # next to a generator evaluates per GENERATED row, silently turning
        # a doc count into an occurrence count); every df>0 term has tf>0,
        # so the inner join loses nothing. Corpus row counts empty docs too.
        df_rows = (
            batch_df.select(F.explode(F.array_distinct(arr)).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
        tf_rows = (
            batch_df.select(F.explode(arr).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("tf"))
        )
        per_term = df_rows.join(tf_rows, "term")
        corpus = batch_df.select(F.size(arr).alias("dl")).agg(
            F.count("*").cast("long").alias("df"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("tf"),
        ).select(F.lit(None).cast("string").alias("term"), "df", "tf")
        out = per_term.select("term", "df", "tf").unionByName(corpus)
        out.write.mode("overwrite").parquet(f"{ledger_dir}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def term_stats_from_ledger(
    spark, ledger_dir: str, terms: Sequence[str]
) -> tuple[int, int, dict[str, int]]:
    """Sum the term-stats ledger into ``(n_docs, sum_dl, {term: df})`` for
    ``bm25_scores(corpus_stats=...)``. One combinable aggregation over the
    ledger; only the requested terms' rows leave the executors."""
    led = _read_ledger(spark, ledger_dir)
    if led is None:
        return 0, 0, {t: 0 for t in terms}
    corpus = led.filter(F.col("term").isNull()).agg(
        F.coalesce(F.sum("df"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.sum("tf"), F.lit(0)).alias("sum_dl"),
    ).first()
    rows = (
        led.filter(F.col("term").isin([str(t) for t in terms]))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .collect()
    )
    dfs = {t: 0 for t in terms}
    dfs.update({r["term"]: int(r["df"]) for r in rows})
    return int(corpus["n_docs"]), int(corpus["sum_dl"]), dfs


def rolling_active_users(ud: DataFrame, window_days: int = 7) -> DataFrame:
    """Distinct (user_id, day) activity → (day_ms, active_users_7d): exact
    rolling-window distinct users per observed day. The ONE definition of
    the rewrite the certified `w12_sliding_distinct_users` query and the
    streaming ledger path share: each user-day explodes into the ≤window
    window-end days it contributes to (a bounded fan-out of the already-
    reduced activity table — never a range self-join), then one
    distinct-count aggregate keyed by day; output days are observed
    activity days only."""
    from ..plans.relational import ms

    days = ud.select("day").distinct()
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("win_day"),
    )
    return (
        fan.join(days, fan.win_day == days.day, "left_semi")
        .groupBy("win_day")
        .agg(F.count_distinct("user_id").alias(f"active_users_{window_days}d"))
        .select(
            ms("win_day").alias("day_ms"),
            f"active_users_{window_days}d",
        )
        # r15: terminal sort removed (order-insensitive comparator; §2.4)
    )


def retention_cohorts(ud: DataFrame) -> DataFrame:
    """Distinct (user_id, day) activity → (cohort_week_ms, week_offset,
    n_users): the ONE definition of the cohort matrix, shared by the
    certified `a20_retention_cohorts` batch query and the streaming ledger
    path. Cohort week = Monday-truncated week of the user's first active
    day (identical to the week of their first event); offsets divide a
    day-diff of week-truncated dates by 7 — exact integers."""
    from ..plans.relational import ms

    firsts = ud.groupBy("user_id").agg(
        F.date_trunc("week", F.min("day")).alias("cohort_week")
    )
    j = ud.join(firsts, "user_id").select(
        "user_id",
        "cohort_week",
        (
            F.datediff(F.date_trunc("week", F.col("day")), F.col("cohort_week"))
            / F.lit(7)
        )
        .cast("bigint")
        .alias("week_offset"),
    )
    return (
        j.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            ms("cohort_week").alias("cohort_week_ms"), "week_offset", "n_users"
        )
        # r15: terminal sort removed (order-insensitive comparator; §2.4)
    )


def streaming_user_days(
    stream_df,
    ledger_dir: str,
    checkpoint_dir: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Maintain the (user_id, day) activity SET incrementally over an event
    stream: each micro-batch appends its distinct user-days to a durable
    parquet ledger keyed by ``batch_id`` (overwrite semantics — a replayed
    batch rewrites its own partition, so the set union can never
    double-count). Set union is idempotent and associative, so the ledger
    merges across batches, shards, and clusters; rolling engagement over
    an event firehose then never re-scans the event log — only the tiny
    user-day set (`rolling_active_users_from_ledger`)."""

    def _process(batch_df, batch_id: int):
        out = batch_df.select(
            F.col(user_col).alias("user_id"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
        ).distinct()
        out.write.mode("overwrite").parquet(f"{ledger_dir}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def rolling_active_users_from_ledger(
    spark, ledger_dir: str, window_days: int = 7
) -> DataFrame:
    """(day_ms, active_users_Nd) from the streaming user-day ledger — the
    incremental twin of the certified w12 batch query: distinct across the
    batch partitions (a user-day seen in several batches collapses), then
    the shared rolling_active_users rewrite."""
    ud = (
        spark.read.parquet(ledger_dir)
        .select("user_id", "day")
        .distinct()
    )
    return rolling_active_users(ud, window_days=window_days)


def retention_cohorts_from_ledger(spark, ledger_dir: str) -> DataFrame:
    """(cohort_week_ms, week_offset, n_users) from the streaming user-day
    ledger — the incremental twin of the certified a20_retention_cohorts
    batch query. The cohort matrix is a pure function of the user-day SET
    (first activity day per user determines the cohort week; each active
    week contributes one offset cell), so the same batch-id-keyed ledger
    `streaming_user_days` maintains for rolling actives serves retention
    with no event-log re-scan: min(day) per user is the day of the user's
    earliest event, hence the same Monday-truncated cohort week a20
    derives from raw timestamps."""
    return retention_cohorts(
        spark.read.parquet(ledger_dir).select("user_id", "day").distinct()
    )


def streaming_funnel(df: DataFrame):
    """Stateful streaming ordered funnel: per-user GroupState carries the
    three chained stage timestamps (first view, first click AFTER that
    view, first purchase AFTER that click) across micro-batches, emitting
    the user's current stage row each batch it appears in. Within a batch
    events sort by (ts, event_id); ACROSS batches the chain is exact when
    each user's events arrive in event-time order (the watermark-buffered
    ingest discipline — same assumption the batch a21 query discharges by
    seeing all history at once). Exactly-once replays are handled by the
    streaming checkpoint, not user code.

    The ordering assumption is ENFORCED observably (ADVICE r7 #1): state
    also carries the last-processed event timestamp, and every event that
    arrives with ts at or before a PRIOR batch's maximum — an event an
    earlier micro-batch should have seen first, or a tie whose event_id
    ordering a later batch cannot replay — increments the emitted
    ``ooo_events`` counter. A nonzero count marks exactly the users whose funnel may
    diverge from the batch a21 twin, so divergence is detectable
    (``SUM(ooo_events) == 0`` certifies the run exact) instead of silent.
    Late events still fold into the chain when the chain state allows it
    (e.g. a late view for a user with no view yet), so the flag is a
    may-diverge marker, not an exactness refutation.

    State is five scalars per user — bounded regardless of event volume —
    which is what makes the funnel streamable at firehose scale; the batch
    twin (a21_ordered_funnel) recomputes from scratch instead."""
    import pandas as pd

    out_schema = (
        "user_id long, stage int, t1_ms long, t2_ms long, t3_ms long, "
        "ooo_events long"
    )
    # state carries NANOSECONDS: the chain comparisons must run at full
    # timestamp resolution to match the batch a21 semantics (a click 500µs
    # after the first view converts in batch; an ms-truncated compare
    # would tie and reject it); ms only on emit
    state_schema = "t1 long, t2 long, t3 long, last_ns long, ooo long"

    def fn(key, pdfs, state):
        t1, t2, t3, last_ns, ooo = (
            state.get if state.exists else (None, None, None, None, 0)
        )
        # a group's micro-batch slice arrives as MULTIPLE Arrow chunks with
        # no cross-chunk ordering guarantee — concatenate before the single
        # sort or a >maxRecordsPerBatch user processes out of event-time
        # order and corrupts the chained state
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            # snapshot BEFORE the batch: ties against a PRIOR batch's max
            # (ns == prior_ns) are flagged too — the batch twin orders ties
            # by event_id across the whole history, which a later batch
            # cannot replay, so a cross-batch tie MAY diverge. Same-ts
            # events within THIS batch sort correctly and are not flagged.
            prior_ns = last_ns
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                ns = int(ts.value)
                if prior_ns is not None and ns <= prior_ns:
                    # a PRIOR batch already processed an event at or after
                    # this timestamp: the in-order contract is broken (or
                    # tie-broken unreplayably) for this user
                    ooo += 1
                if et == "view" and t1 is None:
                    t1 = ns
                elif et == "click" and t1 is not None and t2 is None and ns > t1:
                    t2 = ns
                elif et == "purchase" and t2 is not None and t3 is None and ns > t2:
                    t3 = ns
            # batch slice is sorted, so its max ts is the last row's
            last_ns = ns if last_ns is None else max(last_ns, ns)
        state.update((t1, t2, t3, last_ns, ooo))
        stage = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        to_ms = lambda v: None if v is None else v // 1_000_000  # noqa: E731
        yield pd.DataFrame(
            {"user_id": [key[0]], "stage": [stage],
             "t1_ms": [to_ms(t1)], "t2_ms": [to_ms(t2)], "t3_ms": [to_ms(t3)],
             "ooo_events": [ooo]}
        )

    return df.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_touch_attribution(df: DataFrame):
    """Stateful streaming first/last-touch attribution: per-user GroupState
    tracks the first and last touch (view/click/signup) seen strictly
    BEFORE the user's first purchase, across micro-batches — the streaming
    twin of the certified batch a22_touch_attribution. Emits the user's
    current attribution row each batch they appear in; in update mode the
    final write per user carries their converted-state matrix cell.

    Exactness contract (same as streaming_funnel): events must arrive in
    event-time order across batches; within a batch rows sort by
    (ts, event_id) — identical to the batch query's min_by/max_by key.
    The contract is ENFORCED observably via the emitted ``ooo_events``
    counter (events arriving with ts at or before a prior batch's
    maximum — strict late arrivals AND cross-batch same-ts ties, whose
    event_id ordering a later batch cannot replay).
    The one subtlety the batch rule forces: a touch at exactly
    the purchase timestamp does NOT attribute (batch: ts < p_ts strictly),
    but stream order may process it first — so state also keeps the
    PREVIOUS last touch (strictly earlier ns than the current last), and
    the purchase event demotes a tied last touch to it. A tied FIRST touch
    means the user had no strictly-earlier touch at all → no attribution.

    State is eight scalars per user — bounded at firehose scale; the batch
    twin recomputes from the full log instead."""
    import pandas as pd

    out_schema = (
        "user_id long, converted boolean, first_touch string, "
        "last_touch string, first_ms long, p_ms long, ooo_events long"
    )
    # nanosecond state for full-resolution comparisons (ms only on emit)
    state_schema = (
        "p_ns long, f_type string, f_ns long, l_type string, l_ns long, "
        "pl_type string, pl_ns long, last_seen long, ooo long"
    )
    touches = {"view", "click", "signup"}

    def fn(key, pdfs, state):
        (p_ns, f_t, f_ns, l_t, l_ns, pl_t, pl_ns, seen, ooo) = (
            state.get if state.exists
            else (None, None, None, None, None, None, None, None, 0)
        )
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            # snapshot BEFORE the batch (same discipline as the funnel):
            # an event tied with a PRIOR batch's max timestamp is flagged —
            # the batch twin breaks same-ts ties by event_id across the
            # whole history, which a later batch cannot replay. Same-ts
            # events within this batch sort correctly and are not flagged.
            prior_ns = seen
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                ns = int(ts.value)
                if prior_ns is not None and ns <= prior_ns:
                    ooo += 1
                seen = ns if seen is None else max(seen, ns)
                if p_ns is not None:
                    continue  # attribution frozen at first purchase
                if et == "purchase":
                    p_ns = ns
                    # ts < p_ts is STRICT in the batch twin: demote/drop
                    # touches tied with the purchase timestamp
                    if l_ns is not None and l_ns == p_ns:
                        if pl_ns is not None:
                            l_t, l_ns = pl_t, pl_ns
                        else:
                            # pl unset means the last touch never strictly
                            # advanced past the first, so l_ns == f_ns ==
                            # p_ns here: the tied first touch drops below
                            l_t, l_ns = None, None
                    if f_ns is not None and f_ns == p_ns:
                        f_t, f_ns, l_t, l_ns = None, None, None, None
                elif et in touches:
                    if f_ns is None:
                        f_t, f_ns = et, ns
                        l_t, l_ns = et, ns
                    elif ns > l_ns:
                        pl_t, pl_ns = l_t, l_ns
                        l_t, l_ns = et, ns
                    elif ns == l_ns:  # later event_id wins the max_by tie
                        l_t = et
                    # ns < l_ns: a strictly-late out-of-order touch (l_ns
                    # can come from a prior batch). Ignore it rather than
                    # overwrite the newer last-touch type — the ooo counter
                    # above already flagged it, and a flagged state must
                    # stay internally consistent (ADVICE r8 #1)
        state.update((p_ns, f_t, f_ns, l_t, l_ns, pl_t, pl_ns, seen, ooo))
        converted = p_ns is not None and f_ns is not None
        to_ms = lambda v: None if v is None else v // 1_000_000  # noqa: E731
        yield pd.DataFrame(
            {"user_id": [key[0]], "converted": [converted],
             "first_touch": [f_t if converted else None],
             "last_touch": [l_t if converted else None],
             "first_ms": [to_ms(f_ns) if converted else None],
             "p_ms": [to_ms(p_ns)], "ooo_events": [ooo]}
        )

    return df.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_daily_anomalies(
    df: DataFrame,
    window_days: int = 7,
    threshold: float = 2.0,
    min_history: int = 3,
    key_col: str = "event_type",
):
    """Stateful streaming rolling-z-score anomaly detection — the streaming
    twin of the certified batch ``w14_daily_anomalies`` query
    (operators/mining.py:rolling_zscore_anomalies). Per key, GroupState
    carries the trailing ``window_days`` finalized daily counts plus the
    accumulating current day; each batch emits the rows of every day that
    CLOSED in it (final — a closed day's stats depend only on earlier,
    already-final days) plus the provisional current day (re-emitted with
    a growing count until a later day's event closes it; in update mode
    the last write per (key, day) is the final cell). State is
    ``window_days + 3`` scalars per key — bounded at firehose scale.

    Exactness contract: each key's events arrive in event-DAY order across
    batches. Within-day disorder is HARMLESS (a daily count is
    order-independent), so unlike the funnel twins only a genuinely
    divergence-causing event — one landing on an already-CLOSED day —
    increments ``ooo_events``; it is then ignored, not folded, so flagged
    state stays internally consistent (the ADVICE r8 #1 discipline).

    Bit-exactness with the batch twin: the trailing mean accumulates
    sequentially in day order (Spark's Average), stddev_samp replicates
    Spark's Welford-form CentralMomentAgg update (n == 1 → the batch
    query's COALESCE(NULL, 0.0) → 0.0), and round-6 replicates Spark's
    BigDecimal.valueOf HALF_UP (Decimal over the shortest-repr string,
    not the raw binary expansion) — pinned by the multi-batch equivalence
    test against the certified query."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    out_schema = (
        f"{key_col} string, day_ms long, n_events long, mean_prev double, "
        "std_prev double, zscore double, is_anomaly boolean, ooo_events long"
    )
    state_schema = "counts array<long>, cur_day long, cur_count long, ooo long"
    DAY_NS = 86_400_000_000_000
    W = int(window_days)

    def rnd6(x):
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    def row_for(day_ns, cnt, trail):
        n_prev = len(trail)
        if n_prev == 0:
            mean = None
            std = 0.0
        else:
            s = 0.0
            for v in trail:
                s += float(v)
            mean = rnd6(s / n_prev)
            if n_prev >= 2:
                k = 0
                avg = 0.0
                m2 = 0.0
                for v in trail:
                    k += 1
                    d = float(v) - avg
                    avg += d / k
                    m2 += d * (float(v) - avg)
                std = rnd6(math.sqrt(m2 / (k - 1)))
            else:
                std = 0.0
        z = (
            rnd6((float(cnt) - mean) / std)
            if n_prev >= int(min_history) and std > 0
            else None
        )
        anom = bool(abs(z) > float(threshold)) if z is not None else False
        return (day_ns // 1_000_000, int(cnt), mean, std, z, anom)

    def fn(key, pdfs, state):
        counts, cur_day, cur_count, ooo = (
            state.get if state.exists else ([], None, 0, 0)
        )
        counts = list(counts)
        emitted = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                day = (int(ts.value) // DAY_NS) * DAY_NS
                if cur_day is None:
                    cur_day, cur_count = day, 1
                elif day == cur_day:
                    cur_count += 1
                elif day > cur_day:
                    emitted.append(row_for(cur_day, cur_count, counts[-W:]))
                    counts = (counts + [cur_count])[-W:]
                    cur_day, cur_count = day, 1
                else:  # an already-closed day: unreplayable — flag + ignore
                    ooo += 1
        state.update((counts, cur_day, cur_count, ooo))
        if cur_day is not None:
            emitted.append(row_for(cur_day, cur_count, counts[-W:]))
        if emitted:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(emitted),
                    "day_ms": [e[0] for e in emitted],
                    "n_events": [e[1] for e in emitted],
                    "mean_prev": [e[2] for e in emitted],
                    "std_prev": [e[3] for e in emitted],
                    "zscore": [e[4] for e in emitted],
                    "is_anomaly": [e[5] for e in emitted],
                    "ooo_events": [ooo] * len(emitted),
                }
            )

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_ann_ingest(
    stream_df,
    centroids,
    index_dir: str,
    checkpoint_dir: str,
    emb_col: str = "embedding",
):
    """Exactly-once IVF index maintenance via ``foreachBatch`` — the
    similarity-search twin of the dedup/shard ledgers: every micro-batch
    assigns its vectors to their coarse cell with the pipeline's FIXED
    centroid model (literal projection, zero shuffles — all batches
    assign identically) and lands them in a cell-partitioned parquet
    layout under ``{index_dir}/batch_id=N/cell=C/``. The batch-keyed
    overwrite makes replays rewrite their own partition instead of
    appending drift (the streaming_user_days contract), and the ``cell``
    partition directory is what lets every later search prune to its
    probed cells at the SCAN — the streamed index serves queries without
    ever re-clustering or re-reading unprobed data.

    At 100 TB this is the standard freshness path for an IVF index: the
    expensive part (centroid training) happens once offline; ingest is a
    stateless per-batch projection + partitioned append."""
    import numpy as np

    from ..operators.similarity import with_nearest_centroid

    C = np.asarray(centroids, dtype=float)

    def _process(batch_df, batch_id: int):
        out = with_nearest_centroid(batch_df, C, emb_col=emb_col).drop("d2")
        out.write.mode("overwrite").partitionBy("cell").parquet(
            f"{index_dir}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def ann_search_from_index(
    spark,
    index_dir: str,
    centroids,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dedup_updates: bool = True,
):
    """IVF top-k over the STREAMED index: rank the ``n_probe`` nearest
    cells driver-side (O(model)), scan only those cell partitions
    (PartitionFilters prune the rest at the parquet reader — plan-guard
    tested), exact-cosine rank within the candidates. Returns EXACTLY what
    the batch ``ivf_topk`` returns on the union of all ingested batches:
    the cell assignment is the identical literal-centroid fold with the
    identical lowest-index tie-break, so index layout and batch query
    cannot diverge (pinned by the multi-batch equivalence test).

    UPDATE semantics (r9 review finding): a vector RE-ingested in a later
    batch leaves its old row under the old batch_id partition (the ingest
    is append-only by design). With ``dedup_updates`` (default) the search
    joins its candidates against the per-id LATEST batch_id — derived from
    a NARROW (id, batch_id) scan of the whole index, which parquet column
    pruning keeps tiny while the wide embedding column stays
    partition-pruned — so a stale version can never rank, and a vector
    whose updated embedding moved to an unprobed cell is (correctly for
    IVF) absent rather than served stale. Disable it only for
    append-only-id pipelines, where the narrow scan is pure overhead."""
    import numpy as np

    from ..operators.similarity import cosine_topk

    q = np.asarray(query_vec, dtype=float)
    C = np.asarray(centroids, dtype=float)
    # rank probe cells by the SAME left-to-right dim-ascending d2 fold the
    # SQL oracle's list_reduce uses (np.linalg.norm's pairwise summation
    # can order near-equidistant centroids differently by ~1 ulp — r10
    # review finding); stable argsort = lowest-index tie-break, matching
    # ORDER BY d2, cell
    d2 = np.zeros(len(C))
    for d in range(C.shape[1]):
        diff = C[:, d] - q[d]
        d2 = d2 + diff * diff
    order = np.argsort(d2, kind="stable")
    cells = [int(c) for c in order[: int(n_probe)]]
    idx = spark.read.parquet(index_dir).filter(F.col("cell").isin(cells))
    if dedup_updates:
        latest = (
            spark.read.parquet(index_dir)
            .groupBy(id_col)
            .agg(F.max("batch_id").alias("batch_id"))
        )
        idx = idx.join(latest, [id_col, "batch_id"], "left_semi")
    return cosine_topk(idx, [float(v) for v in q], k, id_col, emb_col)


def streaming_scd2(
    stream_df,
    ledger_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
):
    """Exactly-once incremental SCD2 (type-2 dimension) maintenance via
    ``foreachBatch`` — the streaming twin of the certified
    ``w11_scd2_intervals`` batch query. Each micro-batch recomputes, for
    the keys it touches, the OPEN tail of their version history: the
    key's current open row (from the ledger) joins the batch's events as
    a synthetic leading event, the same lag-collapse/lead-interval
    transformation the batch query applies produces the new tail rows,
    and the tail lands in ``{ledger_dir}/batch_id=N`` (overwrite — a
    replayed batch rewrites its own partition). Versions merge by
    ``(key, valid_from_ms, state)`` with the highest batch winning, so
    closing a previously-open row is a SUPERSEDING write, never an
    in-place update — parquet stays append-only and the merged view
    (:func:`scd2_from_ledger`) is always consistent.

    Event-time-ordered arrival per key is the exactness contract (the
    same one the funnel/attribution twins enforce): a batch's events must
    not predate the key's open-row ``valid_from_ms``, and a same-ts tie
    straddling a batch boundary resolves in arrival order rather than the
    batch query's global (ts, event_id) order — the ledger carries no
    per-key last-seen scalar, so unlike the GroupState twins this
    foreachBatch twin does not flag such ties. Unchanged-state
    events collapse into the open row (no new version — the property that
    makes SCD2 maintenance O(changes), not O(events), at 100 TB: closed
    history is immutable and never rewritten; each batch touches only the
    open rows of the keys it contains)."""
    _SENTINEL_OPEN = 9223372036854775807

    def _process(batch_df, batch_id: int):
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        ev = batch_df.select(
            F.col(key_col).alias("_k"),
            F.col(state_col).alias("_s"),
            F.unix_millis(F.col(ts_col).cast("timestamp")).alias("_ts"),
            F.col(id_col).cast("bigint").alias("_id"),
        )
        led = _read_ledger(spark, ledger_dir, exclude_batch=batch_id)
        if led is not None:
            led = led.filter(F.col("batch_id") < batch_id)
            vw = Window.partitionBy("_k", "_vf", "_s2").orderBy(
                F.desc("batch_id")
            )
            merged = (
                led.select(
                    F.col(key_col).alias("_k"),
                    F.col(state_col).alias("_s2"),
                    F.col("valid_from_ms").alias("_vf"),
                    F.col("valid_to_ms").alias("_vt"),
                    "batch_id",
                )
                .withColumn("_rn", F.row_number().over(vw))
                .filter(F.col("_rn") == 1)
            )
            open_rows = (
                merged.filter(F.col("_vt") == _SENTINEL_OPEN)
                .join(ev.select("_k").distinct(), "_k", "left_semi")
                .select(
                    "_k",
                    F.col("_s2").alias("_s"),
                    F.col("_vf").alias("_ts"),
                    F.lit(-1).cast("bigint").alias("_id"),
                )
            )
            ev = ev.unionByName(open_rows)
        w1 = Window.partitionBy("_k").orderBy("_ts", "_id")
        seq = ev.withColumn("_prev", F.lag("_s").over(w1))
        changes = seq.filter(
            F.col("_prev").isNull() | (F.col("_prev") != F.col("_s"))
        )
        w2 = Window.partitionBy("_k").orderBy("_ts", "_id")
        out = changes.select(
            F.col("_k").alias(key_col),
            F.col("_s").alias(state_col),
            F.col("_ts").alias("valid_from_ms"),
            F.coalesce(
                F.lead("_ts").over(w2), F.lit(_SENTINEL_OPEN)
            ).alias("valid_to_ms"),
            F.lead("_ts").over(w2).isNull().alias("is_current"),
        )
        out.write.mode("overwrite").parquet(f"{ledger_dir}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def scd2_from_ledger(
    spark,
    ledger_dir: str,
    key_col: str = "user_id",
    state_col: str = "event_type",
):
    """The merged SCD2 dimension from the streaming ledger: per
    ``(key, valid_from_ms, state)`` version the highest-batch write wins
    (a batch that closes a formerly-open row supersedes it). Output
    schema matches the certified w11 batch query: (key, state,
    valid_from_ms, valid_to_ms, is_current)."""
    from pyspark.sql import Window

    led = spark.read.parquet(ledger_dir)
    vw = Window.partitionBy(key_col, "valid_from_ms", state_col).orderBy(
        F.desc("batch_id")
    )
    return (
        led.withColumn("_rn", F.row_number().over(vw))
        .filter(F.col("_rn") == 1)
        .select(
            key_col,
            F.col(state_col).alias("state"),
            "valid_from_ms",
            "valid_to_ms",
            "is_current",
        )
    )
