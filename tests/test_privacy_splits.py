"""l-diversity audit (operators/privacy.py) and leakage-safe cluster splits
(operators/corpus_splits.py) — built round 10, driver registration round 11
(the r10 certification window is slot-exact). The DuckDB twins verified here
are the r11 oracles."""

from pyspark.sql import functions as F

from .conftest import SF_CORRECT

# the exact SQL twin for the r11 `a24_l_diversity` registration
L_DIVERSITY_SQL = """
    WITH tagged AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket
      FROM customer),
    per_value AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket, COUNT(*) AS cnt
      FROM tagged GROUP BY 1, 2, 3),
    per_class AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS l_distinct, SUM(cnt) AS class_rows
      FROM per_value GROUP BY 1, 2)
    SELECT l_distinct, COUNT(*) AS n_classes,
           CAST(SUM(class_rows) AS BIGINT) AS n_rows,
           l_distinct < 3 AS at_risk
    FROM per_class GROUP BY l_distinct ORDER BY l_distinct
"""


def test_l_diversity_matches_duckdb(spark, duck):
    """Distinct-l-diversity histogram over customer quasi-identifiers with
    the account-balance thousand-bucket as the sensitive attribute, exact
    vs the SQL twin."""
    from unravelsports_spark.operators.privacy import l_diversity_report
    from unravelsports_spark.session import read_table

    c = read_table(spark, SF_CORRECT, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    got = sorted(
        map(
            tuple,
            l_diversity_report(
                c, ["c_nationkey", "c_mktsegment"], "bal_bucket", l=3
            ).collect(),
        )
    )
    want = sorted(map(tuple, duck.execute(L_DIVERSITY_SQL).fetchall()))
    assert got == want and len(got) > 0
    # row conservation: the histogram accounts for every customer row
    assert sum(r[2] for r in got) == c.count()


def test_l_diversity_flags_homogeneous_class(spark):
    """A class that passes k-anonymity (size 5) but has ONE sensitive value
    must appear at l=1/at_risk; a diverse class of the same size must not."""
    from unravelsports_spark.operators.privacy import l_diversity_report

    rows = [(i, "NY", "M", "flu") for i in range(5)] + [
        (10 + i, "CA", "F", s) for i, s in enumerate("abcde")
    ]
    df = spark.createDataFrame(rows, ["id", "region", "gender", "diagnosis"])
    got = {
        r["l_distinct"]: (r["n_classes"], r["n_rows"], r["at_risk"])
        for r in l_diversity_report(df, ["region", "gender"], "diagnosis").collect()
    }
    assert got == {1: (1, 5, True), 5: (1, 5, False)}


def test_l_diversity_null_sensitive_is_one_value(spark):
    """NULL sensitive values form one distinct value (an all-NULL class is
    still homogeneous — the leak is 'the value is whatever NULL encodes')."""
    from unravelsports_spark.operators.privacy import l_diversity_report

    df = spark.createDataFrame(
        [(0, "NY", None), (1, "NY", None), (2, "CA", "x"), (3, "CA", None)],
        ["id", "region", "diag"],
    )
    got = {
        r["l_distinct"]: r["n_classes"]
        for r in l_diversity_report(df, ["region"], "diag").collect()
    }
    assert got == {1: 1, 2: 1}


# the exact SQL twin for the r11 `d_cluster_safe_split` registration —
# the recursive-CTE closure is the certified d_dup_clusters shape
def _split_audit_sql() -> str:
    from unravelsports_spark.plans.pipeline import _lsh_sql

    return (
        "WITH RECURSIVE pairs AS (" + _lsh_sql() + """),
    sym AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (SELECT a, b FROM sym
                    UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
    comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a),
    assigned AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c USING (doc_id)),
    tagged AS (
      SELECT *, CASE WHEN pct < 80 THEN 'train'
                     WHEN pct < 90 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT *,
                   CAST(('0x' || substring(md5(CAST(component AS VARCHAR)), 1, 4))
                        AS INT) % 100 AS pct
            FROM assigned)),
    per_comp AS (SELECT component, split, COUNT(*) AS n
                 FROM tagged GROUP BY 1, 2),
    comp_splits AS (SELECT component, COUNT(*) AS ns FROM per_comp GROUP BY 1)
    SELECT split, CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_clusters,
           CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
             AS n_docs_in_dup_clusters,
           CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddling
    FROM per_comp JOIN comp_splits USING (component)
    GROUP BY split ORDER BY split
    """
    )


def _assigned(spark):
    from unravelsports_spark.operators.corpus_splits import cluster_safe_split
    from unravelsports_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from unravelsports_spark.session import read_table

    docs = read_table(spark, SF_CORRECT, "documents")
    sigs = minhash_signatures(doc_shingles(docs, distinct=False), num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    return cluster_safe_split(docs.select("doc_id"), pairs)


def test_cluster_safe_split_audit_matches_duckdb(spark, duck):
    """Split audit over the LSH near-dup graph, exact vs the recursive-CTE
    twin — cluster counts, dup-cluster membership, and the structural
    zero-straddle invariant all inside the hash."""
    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.operators.corpus_splits import split_audit

    got = sorted(map(tuple, split_audit(_assigned(spark)).collect()))
    release_tracked()
    want = sorted(map(tuple, duck.execute(_split_audit_sql()).fetchall()))
    assert got == want and len(got) > 0
    assert all(r[4] == 0 for r in got)  # nothing straddles, certified


def test_cluster_safe_split_no_near_dup_straddles(spark):
    """Every near-dup pair lands in ONE split (the property random per-doc
    splits violate), and the split is stable under repartitioning."""
    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.operators.corpus_splits import cluster_safe_split

    docs = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(0, 7), (7, 9), (2, 3)], ["id_a", "id_b"]
    )
    a = cluster_safe_split(docs, pairs)
    rows = {r["doc_id"]: (r["component"], r["split"]) for r in a.collect()}
    assert rows[0] == rows[7] == rows[9]  # transitive closure shares a split
    assert rows[2] == rows[3]
    assert rows[1][0] == 1  # singleton is its own component
    b = cluster_safe_split(docs.repartition(7), pairs)
    assert {r["doc_id"]: r["split"] for r in b.collect()} == {
        k: v[1] for k, v in rows.items()
    }
    release_tracked()


def test_cluster_safe_split_rejects_bad_pcts(spark):
    import pytest

    from unravelsports_spark.operators.corpus_splits import cluster_safe_split

    docs = spark.createDataFrame([(1,)], ["doc_id"])
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError):
        cluster_safe_split(docs, pairs, pcts=(80, 10, 5))
