"""Hand-traced semantics for the event-analytics queries (a20 retention
cohorts, a21 ordered funnel) on a tiny synthetic events table — the oracle
suite (test_relational_oracle.py) pins engine parity at sf0.01; these pin
the SEMANTICS against a by-hand trace."""

import datetime as dt

import pytest

from unravelsports_spark.plans import QUERIES


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ts(day, h=0):
    # 2024-01-01 is a Monday: week arithmetic below is trivially traceable
    return dt.datetime(2024, 1, day, h, 0, 0)


def test_ordered_funnel_ordering_semantics(spark, tmp_path):
    """A converts fully; B clicked BEFORE its first view (stage 2 not
    reached); C purchased BEFORE its post-view click (stage 3 not
    reached); D never viewed (no stage)."""
    rows = [
        (1, _ts(1, 1), 1, "view", 0.0, ""),
        (2, _ts(1, 2), 1, "click", 0.0, ""),
        (3, _ts(1, 3), 1, "purchase", 0.0, ""),
        (4, _ts(2, 1), 2, "click", 0.0, ""),
        (5, _ts(2, 2), 2, "view", 0.0, ""),
        (6, _ts(3, 1), 3, "view", 0.0, ""),
        (7, _ts(3, 2), 3, "purchase", 0.0, ""),
        (8, _ts(3, 3), 3, "click", 0.0, ""),
        (9, _ts(4, 1), 4, "error", 0.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in QUERIES["a21_ordered_funnel"](spark, sf).collect()]
    assert got == [(1, "view", 3), (2, "click", 2), (3, "purchase", 1)]


def test_ordered_funnel_strict_gt_excludes_ties(spark, tmp_path):
    """A click at EXACTLY the first-view timestamp does not advance the
    funnel (strict > — simultaneous events can't witness an ordering)."""
    rows = [
        (1, _ts(1, 1), 1, "view", 0.0, ""),
        (2, _ts(1, 1), 1, "click", 0.0, ""),
        (3, _ts(1, 2), 1, "purchase", 0.0, ""),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in QUERIES["a21_ordered_funnel"](spark, sf).collect()]
    assert got == [(1, "view", 1), (2, "click", 0), (3, "purchase", 0)]


def test_retention_cohorts_hand_traced(spark, tmp_path):
    """u1 first active week of Jan 1 (Mon), returns week of Jan 8 (+1) and
    Jan 15 (+2); u2 first active week of Jan 8, returns week of Jan 22
    (+2); u3 active only in week 0. Sunday Jan 7 belongs to u1's cohort
    week (Monday truncation)."""
    rows = [
        (1, _ts(2), 1, "view", 0.0, ""),    # week of Jan 1
        (2, _ts(7), 1, "click", 0.0, ""),   # still week of Jan 1 (Sunday)
        (3, _ts(9), 1, "view", 0.0, ""),    # week of Jan 8 -> offset 1
        (4, _ts(16), 1, "view", 0.0, ""),   # week of Jan 15 -> offset 2
        (5, _ts(8), 2, "view", 0.0, ""),    # cohort week of Jan 8
        (6, _ts(22), 2, "view", 0.0, ""),   # week of Jan 22 -> offset 2
        (7, _ts(3), 3, "view", 0.0, ""),    # week 0 only
    ]
    sf = _write_events(spark, tmp_path, rows)
    # sorted(): r15 removed the query's terminal cosmetic sort (the driver
    # comparator is order-insensitive), so canonicalize here instead
    got = sorted(tuple(r) for r in QUERIES["a20_retention_cohorts"](spark, sf).collect())
    w1 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    w2 = int(dt.datetime(2024, 1, 8, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert got == [
        (w1, 0, 2),  # u1, u3 in cohort week 1 at offset 0
        (w1, 1, 1),  # u1 returns in +1
        (w1, 2, 1),  # u1 returns in +2
        (w2, 0, 1),  # u2 cohort
        (w2, 2, 1),  # u2 returns in +2
    ]


@pytest.mark.parametrize("seed", [3, 11])
def test_ordered_funnel_matches_python_reference(spark, tmp_path, seed):
    """Random event logs vs a brute-force per-user Python trace."""
    import random

    rng = random.Random(seed)
    types = ["view", "click", "purchase", "error"]
    rows = []
    eid = 0
    for u in range(1, 30):
        for _ in range(rng.randrange(0, 12)):
            eid += 1
            rows.append(
                (eid, _ts(rng.randrange(1, 28), rng.randrange(0, 24)), u,
                 rng.choice(types), 0.0, "")
            )
    if not rows:
        pytest.skip("empty draw")
    sf = _write_events(spark, tmp_path / f"f{seed}", rows)

    by_user = {}
    for _eid, ts, u, et, _v, _p in rows:
        by_user.setdefault(u, []).append((ts, et))
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        evs.sort()
        t1 = min((t for t, e in evs if e == "view"), default=None)
        t2 = (
            min((t for t, e in evs if e == "click" and t > t1), default=None)
            if t1 else None
        )
        t3 = (
            min((t for t, e in evs if e == "purchase" and t > t2), default=None)
            if t2 else None
        )
        n1 += t1 is not None
        n2 += t2 is not None
        n3 += t3 is not None
    got = {r["stage"]: r["n_users"] for r in QUERIES["a21_ordered_funnel"](spark, sf).collect()}
    assert got == {"view": n1, "click": n2, "purchase": n3}


@pytest.mark.parametrize("seed", [5, 17])
def test_sliding_distinct_matches_python_reference(spark, tmp_path, seed):
    """Random activity vs a brute-force 7-day window count in Python."""
    import random

    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(1, 25):
        for _ in range(rng.randrange(0, 8)):
            eid += 1
            rows.append((eid, _ts(rng.randrange(1, 28)), u, "view", 0.0, ""))
    if not rows:
        pytest.skip("empty draw")
    sf = _write_events(spark, tmp_path / f"s{seed}", rows)

    ud = {(u, ts.date()) for _e, ts, u, *_ in rows}
    days = sorted({d for _u, d in ud})
    expect = {}
    for d in days:
        expect[d] = len(
            {u for u, ad in ud if 0 <= (d - ad).days <= 6}
        )
    got = {
        dt.datetime.fromtimestamp(r["day_ms"] / 1000, dt.timezone.utc).date():
        r["active_users_7d"]
        for r in QUERIES["w12_sliding_distinct_users"](spark, sf).collect()
    }
    assert got == expect
