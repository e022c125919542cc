"""Driver-contract invariants: the certification window arithmetic that
each round's rotation edits by hand (memory: one slip under- or
over-fills the 50-slot window and silently drops a certification)."""

import importlib.util
from pathlib import Path

WINDOW = 50

_ENTRY_PATH = Path(__file__).resolve().parents[1] / "__spark_entry__.py"


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(_ENTRY_PATH)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_certification_window_filled_no_oracle_check_dropped():
    """The driver checks the first 50 queries. Two invariants: every
    priority-0 (never-certified, oracle-backed) query must FIT in the
    window (an oracle-backed check past slot 50 is silently skipped), and
    the window must be FULL (an under-filled window wastes certification
    slots on already-green queries). Rows-only model checks (priority 1)
    MAY overflow past slot 50 in a round whose stale-rotation debt fills
    priority 0 — each carries a hash-certified m_*_cells twin and a
    recent rows-green, so one skipped round loses nothing."""
    mod = _load_entry()
    from unravelsports_spark.plans import ORACLE_SQL, QUERIES

    p0 = [n for n in QUERIES if n not in mod._CERTIFIED and n in ORACLE_SQL]
    p1 = [n for n in QUERIES if n not in mod._CERTIFIED and n not in ORACLE_SQL]
    assert len(p0) <= WINDOW, (len(p0), "oracle-backed check pushed out of window")
    assert len(p0) + len(p1) >= WINDOW, (len(p0), len(p1), "window under-filled")


def test_certified_names_exist_and_oracles_align():
    """Every _CERTIFIED key names a registered query (a typo'd key would
    silently rotate the real query forever), and every oracle belongs to a
    registered query."""
    mod = _load_entry()
    from unravelsports_spark.plans import ORACLE_SQL, QUERIES

    unknown = mod._CERTIFIED - set(QUERIES)
    assert not unknown, unknown
    assert set(ORACLE_SQL) <= set(QUERIES)


def test_queries_order_puts_uncertified_first():
    """queries() must enumerate never-certified oracle-backed entries
    before rows-only checks before certified ones — the property the
    driver's bounded-prefix check depends on."""
    mod = _load_entry()
    from unravelsports_spark.plans import ORACLE_SQL

    names = list(mod.queries())
    osql = mod.oracle_sql()
    assert set(osql) == set(ORACLE_SQL)

    def prio(n):
        if n not in mod._CERTIFIED and n in ORACLE_SQL:
            return 0
        if n not in mod._CERTIFIED:
            return 1
        return 2

    prios = [prio(n) for n in names]
    assert prios == sorted(prios)
    assert prios[:WINDOW].count(2) == 0  # window holds no already-certified


def test_stale_rows_only_checks_lead_the_tail():
    """The six rows-only model checks overflow one 50-slot window, so they
    alternate rounds (VERDICT r10 #1): the _ROWS_ONLY_STALE trio (last
    driver-run two rounds ago) must precede the fresh trio in queries()
    order, and when priority-0 leaves exactly 3 free slots they are the
    ones that run."""
    mod = _load_entry()
    from unravelsports_spark.plans import ORACLE_SQL, QUERIES

    names = list(mod.queries())
    stale = [names.index(n) for n in mod._ROWS_ONLY_STALE]
    fresh = [
        names.index(n)
        for n in QUERIES
        if n not in mod._CERTIFIED
        and n not in ORACLE_SQL
        and n not in mod._ROWS_ONLY_STALE
    ]
    assert fresh, "no fresh rows-only checks — update _ROWS_ONLY_STALE"
    assert max(stale) < min(fresh), (stale, fresh)


def test_read_table_cache_single_generation(spark, tmp_path):
    """read_table reuses the analyzed DataFrame within one session (no
    footer re-read) and read_table_cache_clear() resets it; the cache
    must also serve correct per-(dir, table) entries."""
    from unravelsports_spark.session import (
        read_table,
        read_table_cache_clear,
    )

    read_table_cache_clear()
    a1 = read_table(spark, "/root/testdata/sf0.001", "region")
    a2 = read_table(spark, "/root/testdata/sf0.001", "region")
    assert a1 is a2  # same analyzed plan object: no footer job re-paid
    b = read_table(spark, "/root/testdata/sf0.01", "region")
    assert b is not a1  # different dir → different entry
    assert a1.count() != b.count() or a1.count() > 0
    read_table_cache_clear()
    a3 = read_table(spark, "/root/testdata/sf0.001", "region")
    assert a3 is not a1  # cleared: a fresh DataFrame
    assert sorted(map(tuple, a3.collect())) == sorted(map(tuple, a1.collect()))


def test_read_table_refresh_rereads_rewritten_dir(spark, tmp_path):
    """refresh=True (ADVICE r8 #3): a caller that rewrote a parquet dir
    mid-session gets fresh data without the global cache clear — and the
    refreshed entry replaces the stale one for later default reads."""
    from unravelsports_spark.session import read_table

    d = str(tmp_path)
    p = str(tmp_path / "region.parquet")
    spark.createDataFrame([(1, "a")], "r_regionkey long, r_name string").write.parquet(p)
    first = read_table(spark, d, "region")
    assert first.count() == 1
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "r_regionkey long, r_name string"
    ).write.mode("overwrite").parquet(p)
    # without refresh the cached entry is stale by design (it pins the old
    # file listing — executing it now raises FAILED_READ_FILE)
    assert read_table(spark, d, "region") is first
    fresh = read_table(spark, d, "region", refresh=True)
    assert fresh.count() == 2
    assert read_table(spark, d, "region") is fresh  # replaced the entry
