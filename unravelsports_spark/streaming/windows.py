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
    the dedup horizon is ALL history, not a watermark window."""
    from ..operators.dedup import incremental_dedup

    def _process(batch_df, batch_id: int):
        import os

        spark = batch_df.sparkSession
        # plain-path existence probe avoids a noisy AnalysisException on the
        # first batch; object-store URIs fall through to the read-and-catch
        local = "://" not in ledger_dir
        if local and not os.path.isdir(ledger_dir):
            seen = None
        else:
            try:
                seen = spark.read.parquet(ledger_dir)
            except Exception:
                seen = None
        kept = incremental_dedup(batch_df, seen, text_col=text_col, id_col=id_col)
        kept.persist()
        try:
            kept.write.mode("append").parquet(out_dir)
            kept.select("fingerprint").write.mode("append").parquet(ledger_dir)
        finally:
            kept.unpersist()

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
