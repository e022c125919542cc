"""Warehouse event-analytics walk on the synthetic event log: sessionize →
ordered funnel → weekly retention cohorts → rolling 7-day active users —
the product-analytics rollups the engine serves next to its corpus
pipelines, each backed by a driver-certified query.

Run: python examples/event_analytics.py  [SPARK_GRAFT_SF_DIR overrides the
default /root/testdata/sf0.001]. Every step is the same certified plan the
driver checks against DuckDB (a20/a21/w4/w12 in __spark_entry__.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark, sf_dir: str) -> dict:
    from unravelsports_spark.plans import QUERIES

    # 1. sessions: 30-minute-gap sessionization (w4) — the base unit
    sessions = QUERIES["w4_sessionize"](spark, sf_dir)
    n_sessions = sessions.count()

    # 2. ordered funnel (a21): view → click-after-view → purchase-after-click
    funnel = {
        r["stage"]: r["n_users"]
        for r in QUERIES["a21_ordered_funnel"](spark, sf_dir).collect()
    }

    # 3. weekly retention cohorts (a20): cohort_week × week_offset matrix
    cohorts = QUERIES["a20_retention_cohorts"](spark, sf_dir).collect()
    week0 = sum(r["n_users"] for r in cohorts if r["week_offset"] == 0)
    later = sum(r["n_users"] for r in cohorts if r["week_offset"] > 0)

    # 4. rolling engagement (w12): exact 7-day sliding distinct users
    rolling = QUERIES["w12_sliding_distinct_users"](spark, sf_dir).collect()
    peak_7d = max(r["active_users_7d"] for r in rolling)

    # 5. the same metrics INCREMENTALLY: stream the event log in two
    # micro-batches into the user-day ledger; retention and rolling
    # actives then come from the tiny ledger, never a log re-scan —
    # and must equal the batch answers exactly
    import tempfile

    from pyspark.sql import functions as F

    from unravelsports_spark.session import read_table
    from unravelsports_spark.streaming.windows import (
        retention_cohorts_from_ledger,
        rolling_active_users_from_ledger,
        streaming_user_days,
    )

    work = tempfile.mkdtemp(prefix="event_ledger_")
    src, ledger, ckpt = f"{work}/src", f"{work}/ledger", f"{work}/ckpt"
    events = read_table(spark, sf_dir, "events").select("user_id", "ts")
    for half in (events.filter(F.col("user_id") % 2 == 0),
                 events.filter(F.col("user_id") % 2 == 1)):
        half.write.mode("append").parquet(src)
        stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
        q = streaming_user_days(stream, ledger, ckpt).start()
        q.awaitTermination(120)
    led_rolling = rolling_active_users_from_ledger(spark, ledger).collect()
    led_cohorts = retention_cohorts_from_ledger(spark, ledger).collect()
    streaming_matches = (
        sorted(map(tuple, led_rolling)) == sorted(map(tuple, rolling))
        and sorted(map(tuple, led_cohorts)) == sorted(map(tuple, cohorts))
    )

    # 6. first/last-touch attribution (a22, r8): which touch combination
    # converts — and the SAME matrix incrementally from the stateful
    # streaming twin (8 scalars of state per user), streamed in two
    # event-time-ordered micro-batches
    attribution = QUERIES["a22_touch_attribution"](spark, sf_dir).collect()
    top_cell = max(attribution, key=lambda r: (r["n_users"], r["first_touch"]))

    from unravelsports_spark.streaming.windows import streaming_touch_attribution

    asrc, ackpt = f"{work}/attr_src", f"{work}/attr_ckpt"
    full = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    cut = full.selectExpr(
        "timestamp_millis(CAST(percentile_cont(0.5) WITHIN GROUP "
        "(ORDER BY unix_millis(ts)) AS BIGINT)) AS m"
    )
    mid = cut.collect()[0]["m"]
    final = {}

    def _sink(batch_df, batch_id):
        for r in batch_df.collect():
            final[r["user_id"]] = r

    for half in (full.filter(F.col("ts") <= mid), full.filter(F.col("ts") > mid)):
        half.write.mode("append").parquet(asrc)
        q = (
            streaming_touch_attribution(
                spark.readStream.schema(
                    "event_id bigint, ts timestamp, user_id bigint, event_type string"
                ).parquet(asrc)
            )
            .writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ackpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    led_matrix = {}
    for r in final.values():
        if r["converted"]:
            k = (r["first_touch"], r["last_touch"])
            n, tot = led_matrix.get(k, (0, 0))
            led_matrix[k] = (n + 1, tot + (r["p_ms"] - r["first_ms"]))
    batch_matrix = {
        (r["first_touch"], r["last_touch"]): (r["n_users"], r["total_ms_to_convert"])
        for r in attribution
    }
    attribution_streaming_matches = (
        led_matrix == batch_matrix
        and all(r["ooo_events"] == 0 for r in final.values())
    )

    return {
        "streaming_matches_batch": streaming_matches,
        "attribution_streaming_matches": attribution_streaming_matches,
        "n_sessions": n_sessions,
        "funnel": funnel,
        "cohort_week0_users": week0,
        "cohort_return_cells": later,
        "peak_7d_active": peak_7d,
        "days_observed": len(rolling),
        "top_conversion_path": (
            top_cell["first_touch"], top_cell["last_touch"], top_cell["n_users"]
        ),
    }


if __name__ == "__main__":
    from unravelsports_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("event-analytics-example")
    spark.sparkContext.setLogLevel("ERROR")
    out = main(spark, sf)
    for k, v in out.items():
        print(f"{k}: {v}")
    spark.stop()
