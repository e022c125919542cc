"""Every declared query must match its DuckDB oracle at sf0.01 — exact values
(this is stricter than the driver's hash: zero float tolerance by default)."""

import pytest

from unravelsports_spark.plans import QUERIES, ORACLE_SQL

from .conftest import SF_CORRECT
from .oracle_compare import compare_frames


@pytest.mark.parametrize("name", sorted(ORACLE_SQL.keys()))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_CORRECT)
    rel = duck.execute(ORACLE_SQL[name])
    ok, msg = compare_frames(sdf, rel)
    assert ok, f"{name}: {msg}"


def test_all_queries_have_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_entry_smoke(spark):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql().keys()) <= set(mod.queries().keys())


# Driver-hash-safe DuckDB output types. The r4 postmortem: the four r4 hash
# fails were exactly the four oracles whose SQL emitted un-CAST HUGEINT
# (INT128) columns (SUM(BIGINT) / window-cumsum derived) — the driver's value
# hasher serializes INT128 differently from BIGINT even when numerically
# equal. Arrays hit the same class of issue in r3 (f12_array_agg_sorted).
_HASHABLE_TYPE_RE = (
    r"^(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR|DATE|"
    r"TIME|TIMESTAMP( WITH TIME ZONE)?|DECIMAL\(\d+,\d+\)|BLOB)$"
)


def test_no_oracle_emits_hugeint_or_nested(duck):
    """Every registered oracle must bind to driver-hashable column types —
    no HUGEINT/UHUGEINT, no LIST/STRUCT/MAP. DESCRIBE only binds (no scan),
    so this covers all oracles cheaply."""
    import re

    bad = {}
    for name, sql in sorted(ORACLE_SQL.items()):
        desc = duck.execute(f"DESCRIBE ({sql})").fetchall()
        offending = [
            (col, typ) for col, typ, *_ in desc
            if not re.match(_HASHABLE_TYPE_RE, typ)
        ]
        if offending:
            bad[name] = offending
    assert not bad, f"oracles emitting non-hashable types: {bad}"
