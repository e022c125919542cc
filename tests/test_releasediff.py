"""Corpus release diff (operators/releasediff.py) — built round 12,
driver registration queued r13 (`d_release_diff`). RELEASE_DIFF_SQL
verified here moves to the plans registry at registration, per the
corpus7/corpus8 discipline."""

from pyspark.sql import functions as F

from .conftest import SF_CORRECT

# the exact SQL twin for the r13 `d_release_diff` registration: release
# N+1 is derived from the documents table in closed form — doc_id%7==0
# removed, doc_id%5==0 (of the survivors) modified with a ' v2' suffix,
# one added doc per doc_id%11==0 under id+1000000 — so the expected
# (source, status) rollup is fully recomputable by DuckDB
RELEASE_DIFF_SQL = """
    WITH old AS (SELECT doc_id, source, text FROM documents),
    survivors AS (SELECT * FROM old WHERE doc_id % 7 <> 0),
    new_ AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      FROM survivors
      UNION ALL
      SELECT doc_id + 1000000, source, 'new doc ' || CAST(doc_id AS VARCHAR)
      FROM old WHERE doc_id % 11 = 0),
    o AS (SELECT doc_id AS id, source AS src_o,
                 CASE WHEN text IS NULL THEN 'null' ELSE md5(text) END AS fp_o,
                 length(COALESCE(text, '')) AS ch_o FROM old),
    n AS (SELECT doc_id AS id, source AS src_n,
                 CASE WHEN text IS NULL THEN 'null' ELSE md5(text) END AS fp_n,
                 length(COALESCE(text, '')) AS ch_n FROM new_),
    j AS (SELECT COALESCE(o.id, n.id) AS id,
                 COALESCE(n.src_n, o.src_o) AS source,
                 CASE WHEN fp_o IS NULL THEN 'added'
                      WHEN fp_n IS NULL THEN 'removed'
                      WHEN fp_o = fp_n THEN 'unchanged'
                      ELSE 'modified' END AS status,
                 COALESCE(ch_o, 0) AS chars_old, COALESCE(ch_n, 0) AS chars_new
          FROM o FULL OUTER JOIN n ON o.id = n.id)
    SELECT source, status, COUNT(*) AS n_docs,
           CAST(SUM(chars_old) AS BIGINT) AS chars_old,
           CAST(SUM(chars_new) AS BIGINT) AS chars_new,
           CAST(SUM(chars_new - chars_old) AS BIGINT) AS chars_delta
    FROM j GROUP BY source, status ORDER BY source, status
"""


def _diff_query(spark, sf_dir):
    """The r13 d_release_diff query shape."""
    from unravelsports_spark.operators.releasediff import release_diff_report
    from unravelsports_spark.session import read_table

    old = read_table(spark, sf_dir, "documents")
    survivors = old.where(F.col("doc_id") % 7 != 0)
    modified = survivors.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    added = old.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "source",
        F.concat(F.lit("new doc "), F.col("doc_id").cast("string")).alias("text"),
    )
    new = modified.unionByName(added)
    return release_diff_report(old.select("doc_id", "source", "text"), new)


def test_release_diff_matches_duckdb(spark, duck):
    got = sorted(map(tuple, _diff_query(spark, SF_CORRECT).collect()))
    want = sorted(map(tuple, duck.execute(RELEASE_DIFF_SQL).fetchall()))
    assert got == want and len(got) > 20
    # every status class genuinely present in the certified output
    assert {s for _, s, *_ in got} == {"added", "removed", "modified", "unchanged"}


def test_release_diff_per_doc_contracts(spark):
    """Status semantics pinned per doc: added/removed/modified/unchanged;
    NULL text fingerprints as a NON-md5 sentinel, so text→NULL AND the
    ''↔NULL transition both report modified (r12 review: a plain
    coalesce-to-'' fingerprint made ''↔NULL invisible); a source change
    alone is NOT a modification (the join is by id, source is an
    attribute — new wins)."""
    from unravelsports_spark.operators.releasediff import release_diff

    old = spark.createDataFrame(
        [(1, "a", "same"), (2, "a", "will change"), (3, "a", "goes away"),
         (4, "a", "text to null"), (5, "b", "moves source"), (7, "a", "")],
        "doc_id long, source string, text string",
    )
    new = spark.createDataFrame(
        [(1, "a", "same"), (2, "a", "changed!"), (6, "a", "brand new"),
         (4, "a", None), (5, "c", "moves source"), (7, "a", None)],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r for r in release_diff(old, new).collect()}
    assert got[1]["status"] == "unchanged"
    assert got[2]["status"] == "modified"
    assert got[3]["status"] == "removed" and got[3]["chars_new"] == 0
    assert got[4]["status"] == "modified" and got[4]["chars_new"] == 0
    assert got[5]["status"] == "unchanged" and got[5]["source"] == "c"
    assert got[6]["status"] == "added" and got[6]["chars_old"] == 0
    assert got[7]["status"] == "modified"  # '' → NULL is a change


def test_release_diff_duplicate_or_null_id_fails_loud(spark):
    """The PRECONDITION (unique non-null ids per release) is SELF-ENFORCED
    since r13 (VERDICT r12 #4): a duplicated id — which previously fanned
    out through the full-outer join and silently inflated counts — and a
    NULL id both fail the query loudly via the assert_true tripwire, with
    the violating side named in the message. Clean inputs are unaffected
    (every other test in this file)."""
    import pytest
    from pyspark.errors import PySparkException

    from unravelsports_spark.operators.releasediff import release_diff

    clean = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, source string, text string"
    )
    dup = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "x")], "doc_id long, source string, text string"
    )
    with pytest.raises(PySparkException, match="new-release"):
        release_diff(clean, dup).collect()
    with pytest.raises(PySparkException, match="old-release"):
        release_diff(dup, clean).collect()
    nulled = spark.createDataFrame(
        [(None, "a", "x")], "doc_id long, source string, text string"
    )
    with pytest.raises(PySparkException, match="duplicate or NULL"):
        release_diff(clean, nulled).collect()


def test_release_diff_plan_shape(spark):
    """Scale shape: ONE exchange pair feeding a co-partitioned
    SortMergeJoin on the id (never broadcast — both releases are
    corpus-sized), fingerprints projected below the join so text never
    shuffles, no cartesian."""
    plan = (
        _diff_query(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both sides shuffle on the id key, and BOTH fingerprint at the scan
    # (md5 appears in each side's pre-exchange projection, so raw text
    # never rides the exchange)
    assert plan.count("Exchange hashpartitioning(_id") == 2
    # every scan-side branch fingerprints BEFORE its exchange (the old
    # side once, the new side once per union branch), so raw text never
    # rides an exchange
    assert plan.count("md5(cast(text") == 3
