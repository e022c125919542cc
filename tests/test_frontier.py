"""URL-frontier politeness planning (operators/frontier.py) — built round
13, REGISTERED round 14 as `t_frontier_plan`. The canonical oracle SQL and
query shape now live in plans/corpus10.py (the corpus7/8/9 registration
discipline); this suite imports them, so twin and oracle cannot drift.
The oracle re-derives the identical (wave, slot) assignment with the same
window arithmetic — both engines sort by md5(url), which is
engine-independent."""

from pyspark.sql import functions as F

from unravelsports_spark.plans.corpus10 import (
    FRONTIER_SQL,
    t_frontier_plan as _frontier_query,
)

from .conftest import SF_CORRECT


def test_frontier_plan_matches_duckdb(spark, duck):
    got = sorted(map(tuple, _frontier_query(spark, SF_CORRECT).collect()))
    want = sorted(map(tuple, duck.execute(FRONTIER_SQL).fetchall()))
    assert got == want and len(got) > 1  # several waves at sf0.01
    # politeness invariant lands in the certified hash: no wave exceeds
    # the limit anywhere
    assert all(max_slot <= 2 for _, _, _, max_slot, _ in got)


def test_frontier_invariants_and_determinism(spark):
    """Per-(host, wave) cell never exceeds the limit; waves are dense
    from 0 per host; the assignment is identical across runs and
    partitionings (content-keyed order)."""
    from unravelsports_spark.operators.frontier import (
        frontier_plan,
        frontier_summary,
    )

    urls = spark.createDataFrame(
        [(f"http://h{i % 4}.example/p{i}",) for i in range(40)], "url string"
    )
    planned = frontier_plan(urls, per_host_limit=3)
    rows = planned.collect()
    cells = {}
    for r in rows:
        cells.setdefault((r["host"], r["wave"]), []).append(r["slot"])
    for (h, wv), slots in cells.items():
        assert sorted(slots) == list(range(len(slots))), (h, wv)
        assert len(slots) <= 3
    # dense waves per host: 10 urls / limit 3 -> waves 0..3
    waves = {r["wave"] for r in rows}
    assert waves == {0, 1, 2, 3}
    # determinism across a different input partitioning
    again = {
        (r["url"], r["wave"], r["slot"])
        for r in frontier_plan(urls.repartition(7), per_host_limit=3).collect()
    }
    assert again == {(r["url"], r["wave"], r["slot"]) for r in rows}
    summ = {r["wave"]: (r["n_urls"], r["max_slot"])
            for r in frontier_summary(planned).collect()}
    assert summ == {0: (12, 2), 1: (12, 2), 2: (12, 2), 3: (4, 0)}


def test_frontier_priority_and_contracts(spark):
    """priority_col schedules high-priority URLs into earlier waves; NULL
    and non-URL rows group under host ''; per_host_limit and column
    collisions fail loud."""
    import pytest

    from unravelsports_spark.operators.frontier import frontier_plan

    urls = spark.createDataFrame(
        [("http://h.example/low1", 1), ("http://h.example/low2", 1),
         ("http://h.example/hi", 9), (None, 5), ("not a url", 5)],
        "url string, prio int",
    )
    planned = {r["url"]: r for r in
               frontier_plan(urls, 1, priority_col="prio").collect()}
    assert planned["http://h.example/hi"]["wave"] == 0  # priority first
    assert {planned["http://h.example/low1"]["wave"],
            planned["http://h.example/low2"]["wave"]} == {1, 2}
    assert planned[None]["host"] == "" and planned["not a url"]["host"] == ""
    with pytest.raises(ValueError):
        frontier_plan(urls, 0)
    with pytest.raises(ValueError):
        frontier_plan(urls.withColumn("wave", F.lit(1)), 3)


def test_frontier_plan_shape(spark):
    """Scale shape: ONE exchange (the host window); no join, no
    cartesian — the planner is a pure window projection."""
    plan = (
        _frontier_query(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    # the dup tripwire's (host, url) count window REUSES the rank
    # window's host exchange (subset clustering): one host exchange, and
    # NO url-keyed exchange anywhere (the wave rollup's own exchange is
    # the only other one)
    assert plan.count("Exchange hashpartitioning(host") == 1
    assert "Exchange hashpartitioning(url" not in plan
    assert plan.count("Exchange hashpartitioning") == 2  # + the wave rollup


def test_duplicate_urls_fail_loud(spark):
    """r13 review pass 14 #1 pin: duplicate url rows (or multiple NULLs)
    tie on every sort key — the assignment would be nondeterministic, so
    the precondition tripwire fails loud instead."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from unravelsports_spark.operators.frontier import frontier_plan

    dup = spark.createDataFrame(
        [("http://h.example/p",), ("http://h.example/p",)], "url string"
    )
    with pytest.raises((PySparkException, Py4JJavaError),
                       match="nondeterministic"):
        frontier_plan(dup, 3).collect()
    nulls = spark.createDataFrame([(None,), (None,)], "url string")
    with pytest.raises((PySparkException, Py4JJavaError),
                       match="nondeterministic"):
        frontier_plan(nulls, 3).collect()


def _alloc(spark, rows, b, **kw):
    from unravelsports_spark.operators.frontier import allocate_crawl_budget

    df = spark.createDataFrame(rows, "host string, weight long")
    got = allocate_crawl_budget(df, b, **kw).collect()
    return {r["host"]: r["budget"] for r in got}


def test_budget_hand_cases(spark):
    """Hamilton apportionment: exact division, largest-remainder +1s,
    host-name tie-break, zero-weight hosts provably get zero."""
    # exact division - no leftover
    assert _alloc(spark, [("a", 1), ("b", 1)], 4) == {"a": 2, "b": 2}
    # B=7 over weights 2:3:5 -> exact shares 1.4/2.1/3.5, bases 1/2/3,
    # leftover 1 goes to the largest remainder (a: .4 -> rem 4/10 vs
    # c: .5) -> c
    assert _alloc(spark, [("a", 2), ("b", 3), ("c", 5)], 7) == {
        "a": 1, "b": 2, "c": 4,
    }
    # remainder tie: equal weights, B=1 -> host-name order wins
    assert _alloc(spark, [("b", 1), ("a", 1)], 1) == {"a": 1, "b": 0}
    # a zero-weight host never takes a leftover unit
    got = _alloc(spark, [("a", 1), ("b", 1), ("z", 0)], 3)
    assert got["z"] == 0 and got["a"] + got["b"] == 3


def test_budget_caps_clip_without_redistribution(spark):
    from unravelsports_spark.operators.frontier import allocate_crawl_budget

    df = spark.createDataFrame(
        [("a", 9, 2), ("b", 1, 100)], "host string, weight long, cap long"
    )
    got = {
        r["host"]: r["budget"]
        for r in allocate_crawl_budget(df, 10, cap_col="cap").collect()
    }
    # a deserves 9 but caps at 2; the surplus is NOT redistributed
    assert got == {"a": 2, "b": 1}


def test_budget_matches_reference_apportionment(spark):
    """Property vs a naive Python largest-remainder reference on 500
    hosts with pseudo-random weights: identical allocation, exact sum."""
    from unravelsports_spark.operators.frontier import allocate_crawl_budget

    rows = [(f"h{i:04d}", (i * 7919) % 97) for i in range(500)]
    B = 12345
    W = sum(w for _, w in rows)
    base = {h: B * w // W for h, w in rows}
    rem = {h: (B * w) % W for h, w in rows}
    R = B - sum(base.values())
    order = sorted(rows, key=lambda hw: (-rem[hw[0]], hw[0]))
    want = dict(base)
    for h, _ in order[:R]:
        want[h] += 1
    df = spark.createDataFrame(rows, "host string, weight long")
    got = {
        r["host"]: r["budget"] for r in allocate_crawl_budget(df, B).collect()
    }
    assert got == want
    assert sum(got.values()) == B


def test_budget_preconditions(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    from unravelsports_spark.operators.frontier import allocate_crawl_budget

    df = spark.createDataFrame([("a", 1)], "host string, weight long")
    with pytest.raises(ValueError, match="total_budget"):
        allocate_crawl_budget(df, -1)
    with pytest.raises(ValueError, match="total weight must be positive"):
        allocate_crawl_budget(
            spark.createDataFrame([("a", 0)], "host string, weight long"), 5
        )
    with pytest.raises((PySparkException, Py4JJavaError), match="non-negative"):
        allocate_crawl_budget(
            spark.createDataFrame([("a", -2), ("b", 5)], "host string, weight long"), 5
        ).collect()
    with pytest.raises((PySparkException, Py4JJavaError), match="one row per host"):
        allocate_crawl_budget(
            spark.createDataFrame(
                [("a", 1), ("a", 2)], "host string, weight long"
            ),
            5,
        ).collect()


def test_budget_cap_validation_and_overflow_guard(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    from unravelsports_spark.operators.frontier import allocate_crawl_budget

    neg_cap = spark.createDataFrame(
        [("a", 1, -3), ("b", 1, None)], "host string, weight long, cap long"
    )
    with pytest.raises((PySparkException, Py4JJavaError), match="caps must be"):
        allocate_crawl_budget(neg_cap, 2, cap_col="cap").collect()
    # NULL cap = uncapped, documented semantic
    ok = spark.createDataFrame(
        [("a", 1, None)], "host string, weight long, cap long"
    )
    got = allocate_crawl_budget(ok, 3, cap_col="cap").collect()
    assert got[0]["budget"] == 3
    # huge-but-individually-legal weights trip the W bound loudly
    huge = spark.createDataFrame(
        [("a", 2**60), ("b", 2**60)], "host string, weight long"
    )
    with pytest.raises(ValueError, match="rescale weights"):
        allocate_crawl_budget(huge, 2)
