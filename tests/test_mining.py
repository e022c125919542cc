"""Pattern-mining operators (operators/mining.py) vs hand-computed and
DuckDB-SQL references — built round 8, registered as driver queries in
round 9 (the r8 certification window is slot-exact)."""

import duckdb
import pytest

from unravelsports_spark.operators.mining import frequent_pairs, transition_counts

SF = "/root/testdata/sf0.01"


def test_frequent_pairs_hand_example(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # duplicate item in a txn counts once
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "txn int, item string")
    got = {
        (r["item_a"], r["item_b"]): r["n_txns"]
        for r in frequent_pairs(df, "txn", "item", min_support=1).collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}
    top = frequent_pairs(df, "txn", "item", min_support=2, top=5).collect()
    assert [(r["item_a"], r["item_b"], r["n_txns"]) for r in top] == [("a", "b", 3)]


def test_frequent_pairs_matches_duckdb_on_lineitem(spark):
    """Part pairs co-ordered in the same order, support >= 3, top-20 —
    the exact SQL this becomes when registered as a driver query in r9."""
    from unravelsports_spark.session import read_table

    li = read_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    got = sorted(
        map(
            tuple,
            frequent_pairs(
                li, "l_orderkey", "l_partkey", min_support=2, top=20
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
        WITH ti AS (SELECT DISTINCT l_orderkey AS t, l_partkey AS i FROM lineitem),
        p AS (
          SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_txns
          FROM ti a JOIN ti b ON a.t = b.t AND a.i < b.i
          GROUP BY a.i, b.i HAVING COUNT(*) >= 2)
        SELECT item_a, item_b, n_txns FROM p
        ORDER BY n_txns DESC, item_a, item_b LIMIT 20
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_frequent_pairs_max_basket_skew_guard(spark):
    """VERDICT r8 #4: one pathological transaction (200 items → 19 900
    pairs uncapped) must be dropped whole by ``max_basket``, leaving the
    small baskets' counts exact — and the capped plan bounds every
    transaction's pair emission before the self-join."""
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    rows += [(99, f"x{i:03d}") for i in range(200)]  # the skew bomb
    df = spark.createDataFrame(rows, "txn int, item string")

    uncapped = frequent_pairs(df, "txn", "item", min_support=1)
    assert uncapped.count() == 1 + 200 * 199 // 2

    capped = frequent_pairs(df, "txn", "item", min_support=1, max_basket=10)
    got = {
        (r["item_a"], r["item_b"]): r["n_txns"] for r in capped.collect()
    }
    assert got == {("a", "b"): 2}  # bomb dropped whole, small baskets exact


def test_transition_counts_hand_example(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "view"), (2, base.replace(hour=1), 1, "view"),
        (3, base.replace(hour=2), 1, "click"),
        (4, base, 2, "view"), (5, base.replace(hour=1), 2, "purchase"),
        (6, base, 3, "click"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint, event_type string")
    got = {
        (r["from_state"], r["to_state"]): r["n_transitions"]
        for r in transition_counts(df, "user_id", "event_type", "ts", "event_id").collect()
    }
    assert got == {("view", "view"): 1, ("view", "click"): 1, ("view", "purchase"): 1}


def test_transition_counts_matches_duckdb_on_events(spark):
    from unravelsports_spark.session import read_table

    e = read_table(spark, SF, "events").select("event_id", "ts", "user_id", "event_type")
    got = sorted(
        map(
            tuple,
            transition_counts(e, "user_id", "event_type", "ts", "event_id").collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
        WITH seq AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events)
        SELECT prev AS from_state, event_type AS to_state, COUNT(*) AS n_transitions
        FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
        """
            ).fetchall(),
        )
    )
    assert got == want
    assert len(got) > 0


def test_transition_counts_tie_break_is_event_id(spark):
    """Two events at the same timestamp order by event_id — the matrix
    must be deterministic under shuffled input order."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(2, t0, 1, "b"), (1, t0, 1, "a"), (3, t0, 1, "c")]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).repartition(3)
    got = {
        (r["from_state"], r["to_state"]): r["n_transitions"]
        for r in transition_counts(df, "user_id", "event_type", "ts", "event_id").collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_rolling_zscore_anomalies_matches_duckdb(spark):
    """Full equivalence with the SQL twin on the events table (the r9
    registration oracle): trailing 7-day mean/std per event_type, current
    day excluded, rounded-6 floats, cold-start and zero-variance guards."""
    from unravelsports_spark.operators.mining import rolling_zscore_anomalies
    from unravelsports_spark.session import read_table

    e = read_table(spark, SF, "events")
    got = sorted(
        map(
            tuple,
            rolling_zscore_anomalies(
                e, "event_type", "ts", window_days=7, threshold=2.0
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
        WITH counts AS (
          SELECT event_type AS k, CAST(date_trunc('day', ts) AS DATE) AS day,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2),
        stats AS (
          SELECT k, day, n_events,
                 COUNT(n_events) OVER w AS n_prev,
                 ROUND(AVG(n_events) OVER w, 6) AS mean_prev,
                 ROUND(COALESCE(STDDEV_SAMP(n_events) OVER w, 0.0), 6) AS std_prev
          FROM counts
          WINDOW w AS (PARTITION BY k ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        scored AS (
          SELECT k AS event_type, CAST(epoch_ms(day) AS BIGINT) AS day_ms,
                 n_events, mean_prev, std_prev,
                 CASE WHEN n_prev >= 3 AND std_prev > 0
                      THEN ROUND((n_events - mean_prev) / std_prev, 6) END AS zscore
          FROM stats)
        SELECT event_type, day_ms, n_events, mean_prev, std_prev, zscore,
               COALESCE(ABS(zscore) > 2.0, FALSE) AS is_anomaly
        FROM scored
        """
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0


def test_rolling_zscore_guards_and_detection(spark):
    """Hand-built series: cold start never flags, a genuine spike after
    stable history flags, constant history (zero variance) never flags."""
    import datetime as dt

    from unravelsports_spark.operators.mining import rolling_zscore_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # key 'spiky': 6 days of 10 events, then a day of 100
    for d in range(6):
        for _ in range(10):
            rows.append((eid, base + dt.timedelta(days=d), 1, "spiky")); eid += 1
    for _ in range(100):
        rows.append((eid, base + dt.timedelta(days=6), 1, "spiky")); eid += 1
    # key 'flat': identical counts every day — zero variance, never flags
    for d in range(8):
        for _ in range(5):
            rows.append((eid, base + dt.timedelta(days=d), 1, "flat")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        (r["event_type"], r["day_ms"]): r
        for r in rolling_zscore_anomalies(
            df, "event_type", "ts", threshold=3.0
        ).collect()
    }
    ms = lambda d: int((base + dt.timedelta(days=d)).replace(  # noqa: E731
        tzinfo=dt.timezone.utc).timestamp() * 1000)
    # day 0-2: cold start (fewer than 3 trailing days) → no zscore
    assert got[("spiky", ms(0))]["zscore"] is None
    assert got[("spiky", ms(2))]["zscore"] is None
    # spike day: 6 stable days of history... but variance is ZERO (all 10s)
    # → guard holds, no flag — then make history noisy enough to flag
    assert got[("spiky", ms(6))]["is_anomaly"] is False
    assert all(not got[("flat", ms(d))]["is_anomaly"] for d in range(8))

    rows2 = []
    eid = 0
    pattern = [10, 12, 9, 11, 10, 12]  # noisy but stable
    for d, n in enumerate(pattern):
        for _ in range(n):
            rows2.append((eid, base + dt.timedelta(days=d), 1, "s")); eid += 1
    for _ in range(100):
        rows2.append((eid, base + dt.timedelta(days=6), 1, "s")); eid += 1
    df2 = spark.createDataFrame(
        rows2, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got2 = {
        r["day_ms"]: r
        for r in rolling_zscore_anomalies(df2, "event_type", "ts").collect()
    }
    assert got2[ms(6)]["is_anomaly"] is True
    assert got2[ms(5)]["is_anomaly"] is False
