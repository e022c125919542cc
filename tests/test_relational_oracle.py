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
