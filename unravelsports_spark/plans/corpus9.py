"""Round-13 registrations (VERDICT r12 #1): the four r12-built,
test-oracled queries — the CSV corpus boundary (queued since r11), the
t-closeness privacy audit, the WARC crawl-container boundary, and the
corpus release diff. Canonical oracle SQL moves HERE from the r12 tests at
registration time per the corpus7/corpus8 discipline (the tests now import
these strings, so twin and oracle cannot drift).

Oracle styles (the corpus5/6/7 taxonomy): all four are exact SQL. The two
boundary round-trips (o18/o19) recompute the rollup from the ORIGINAL
parquet plus the same injection arithmetic — the CSV/WARC bytes exist only
between Spark's writer and Spark's reader, and the md5-prefix fingerprint
sums certify the exact round-tripped bytes; the injected corrupt shard
makes quarantine semantics load-bearing in the hash (excluded from the
rollup AND counted exactly once).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import read_table
from .relational import query

# ---------------------------------------------------------------------------
# o18_csv_roundtrip (sources/csvio.py — built r11, registered r13)
# ---------------------------------------------------------------------------

#: quoting-hazard suffixes keyed by (doc_id // 20) % 4 — source IS
#: doc_id % 20, so plain %4 would be constant per source (the
#: boilerplate-test lesson); ASCII only, newlines deliberately absent so
#: the certified path stays line-splittable (see the csvio module caveat);
#: every class NON-EMPTY (r11 pass 5 finding #4): Spark reads an empty CSV
#: field back as NULL (the documented lossy cell), so non-empty suffixes
#: make empty fields impossible by construction at ANY scale factor
CSV_SUFFIXES = [
    " plain tail",
    ', "quoted, with commas",',
    ' say ""twice"" done',
    "  padded ends  ",
]

#: canonical SQL twin (verified in tests/test_csvio.py since r11): the
#: rollup recomputed from the original parquet + the same injection
#: arithmetic; n_quarantined pins the one injected malformed line
CSV_ROUNDTRIP_SQL = """
    WITH aug AS (
      SELECT doc_id, source,
             text || (LIST_VALUE(' plain tail',
               ', "quoted, with commas",',
               ' say ""twice"" done',
               '  padded ends  '
             ))[CAST((doc_id // 20) % 4 AS INT) + 1] AS text
      FROM documents)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_sum,
           CAST(1 AS BIGINT) AS n_quarantined
    FROM aug GROUP BY source
"""


@query("o18_csv_roundtrip", oracle=CSV_ROUNDTRIP_SQL)
def o18_csv_roundtrip(spark, sf_dir):
    """CSV corpus boundary certified end to end (engine §2.1 surface;
    reference parity: the reference's CSV scan boundary, datasets/bdb.py
    cites reference big_data_bowl/graph_converter.py — this is the
    GENERAL corpus-table variant with RFC-4180 quoting + quarantine):
    quoting-hazard suffixes injected in Catalyst (embedded commas, doubled
    quotes, boundary spaces — each must survive the write/read
    byte-exactly or fp_sum flips), sharded RFC-4180 write, PERMISSIVE
    schema'd CHECKED read with one injected malformed line (unparseable
    doc_id), per-source rollup. The CHECKED read is load-bearing (r11
    pass 5 #2): the rollup prunes doc_id, and on a raw CSV frame the
    parser would pass the corrupt row as clean (a 21st group). Result is
    materialized before the per-invocation tmpdir is removed (the o17
    discipline)."""
    import os
    import shutil
    import tempfile

    from ..cache import release_tracked
    from ..sources.csvio import read_csv_checked, write_csv
    from ..sources.jsonl import quarantine_counts

    tmp = tempfile.mkdtemp(prefix="spark_graft_csv_")
    try:
        path = os.path.join(tmp, "docs")
        docs = read_table(spark, sf_dir, "documents")
        sfx = F.element_at(
            F.array(*[F.lit(s) for s in CSV_SUFFIXES]),
            F.expr("cast((doc_id div 20) % 4 as int) + 1"),
        )
        aug = docs.select(
            "doc_id", "source", F.concat(F.col("text"), sfx).alias("text")
        )
        write_csv(aug, path)
        # injected before the first read of the brand-new dir (no
        # FileStatusCache refresh needed): doc_id is not a number ->
        # PERMISSIVE quarantines the whole line
        with open(os.path.join(path, "part-corrupt.csv"), "w") as fh:
            fh.write("doc_id,source,text\nnotanumber,srcX,hello\n")
        back = read_csv_checked(spark, path)
        fp = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
        rollup = (
            back.where(F.col("_corrupt_record").isNull())
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).alias("total_chars"),
                F.sum(fp).alias("fp_sum"),
            )
            .crossJoin(quarantine_counts(back).select("n_quarantined"))
        )
        rows = rollup.collect()
        return spark.createDataFrame(rows, rollup.schema)
    finally:
        # mirror o19 (ADVICE r13 #2): quarantine_counts tracked-persists
        # the checked CSV frame; outside the driver's evicting wrapper the
        # cached relation (backed by the just-deleted tmpdir) would linger
        release_tracked()
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# a25_t_closeness (operators/privacy.py — built r12, registered r13)
# ---------------------------------------------------------------------------

#: canonical SQL twin (verified in tests/test_tcloseness.py since r12) —
#: same quasi-identifiers and sensitive bucket as the certified
#: a24_l_diversity, so the three privacy audits (k-anon, l-div,
#: t-closeness) read one release surface. HUGEINT cross-products mirror
#: the operator's decimal(38,0); `//` and Spark's `div` agree on
#: positive operands, so the ppm floor is bit-identical across engines.
T_CLOSENESS_SQL = """
    WITH rows_ AS (
      SELECT c_nationkey AS q1, c_mktsegment AS q2,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS v
      FROM customer WHERE c_acctbal IS NOT NULL),
    pv AS (SELECT q1, q2, v, COUNT(*) AS c FROM rows_ GROUP BY 1, 2, 3),
    per_class AS (SELECT q1, q2, SUM(c) AS cc FROM pv GROUP BY 1, 2),
    gcnt AS (SELECT v, SUM(c) AS g FROM pv GROUP BY 1),
    gdist AS (SELECT v, SUM(g) OVER (ORDER BY v) AS cumg FROM gcnt),
    gtot AS (SELECT SUM(g) AS gg, COUNT(*) AS m FROM gcnt),
    grid AS (
      SELECT pc.q1, pc.q2, pc.cc, g.v, g.cumg, t.gg, t.m,
             COALESCE(p.c, 0) AS c0
      FROM per_class pc CROSS JOIN gdist g CROSS JOIN gtot t
      LEFT JOIN pv p ON p.q1 IS NOT DISTINCT FROM pc.q1
                    AND p.q2 IS NOT DISTINCT FROM pc.q2 AND p.v = g.v),
    cum AS (SELECT *, SUM(c0) OVER (PARTITION BY q1, q2 ORDER BY v) AS cumc
            FROM grid),
    emd AS (
      SELECT q1, q2, MAX(cc) AS cc, MAX(gg) AS gg, MAX(m) AS m,
             SUM(ABS(CAST(cumc AS HUGEINT) * gg
                     - CAST(cumg AS HUGEINT) * cc)) AS num
      FROM cum GROUP BY 1, 2),
    ppm AS (SELECT cc, CASE WHEN m <= 1 THEN 0
              ELSE CAST((num * 1000000)
                        // (CAST(m - 1 AS HUGEINT) * cc * gg) AS BIGINT)
            END AS emd_ppm
            FROM emd)
    SELECT emd_ppm // 100000 AS emd_decile, emd_ppm > 150000 AS at_risk,
           COUNT(*) AS n_classes, CAST(SUM(cc) AS BIGINT) AS n_rows
    FROM ppm GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("a25_t_closeness", oracle=T_CLOSENESS_SQL)
def a25_t_closeness(spark, sf_dir):
    """t-closeness audit certified end to end (engine addition §2.12;
    completes the k-anonymity → l-diversity → t-closeness privacy trio —
    Li, Li & Venkatasubramanian 2007): per-class EMD against the global
    sensitive distribution in integer ppm arithmetic (decimal(38,0)
    cross-products floored ONCE onto the ppm grid, DuckDB-bit-identical),
    histogrammed per (EMD decile, at_risk). One corpus-sized collapse on
    (quasi…, sensitive); everything downstream is class-sized with the
    global pieces broadcast."""
    from ..operators.privacy import t_closeness_report

    c = read_table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return t_closeness_report(
        c, ["c_nationkey", "c_mktsegment"], "bal_bucket", t_ppm=150_000
    )


# ---------------------------------------------------------------------------
# o19_warc_roundtrip (sources/warc.py — built r12, registered r13)
# ---------------------------------------------------------------------------

#: canonical SQL twin (verified in tests/test_warc.py since r12): clean
#: rows must round-trip byte-exactly through the WARC container (headers,
#: CRLF framing, gzip members), the injected corrupt shard must be
#: excluded from the rollup AND counted exactly once — the o17 discipline
#: at the crawl-container boundary
WARC_ROUNDTRIP_SQL = """
    SELECT source || '.example' AS source, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_sum,
           CAST(1 AS BIGINT) AS n_quarantined
    FROM documents GROUP BY source
"""


def warc_roundtrip_frame(spark, sf_dir, gzip_records=False):
    """The o19 query body, parameterized on the member layout so the
    gzip-members test (the Common Crawl layout) reuses it verbatim:
    documents → sharded WARC export (deterministic shards, one per Arrow
    batch) → binaryFile read + chunked Arrow decode with quarantine →
    per-source rollup equal to DuckDB on the ORIGINAL parquet. One
    garbage shard is injected, so quarantine semantics are load-bearing
    in the hash."""
    import os
    import shutil
    import tempfile

    from ..cache import release_tracked
    from ..sources.jsonl import quarantine_counts
    from ..sources.warc import read_warc, warc_to_documents, write_warc

    tmp = tempfile.mkdtemp(prefix="spark_graft_warc_")
    try:
        docs = read_table(spark, sf_dir, "documents").select(
            F.concat(
                F.lit("http://"), "source", F.lit(".example/"), F.col("doc_id")
            ).alias("target_uri"),
            F.encode("text", "UTF-8").alias("payload"),
        )
        write_warc(docs, tmp, gzip_records=gzip_records).collect()
        with open(os.path.join(tmp, "part-corrupt.warc"), "wb") as fh:
            fh.write(b"not a warc shard at all \x00\xff garbage")
        back = read_warc(spark, tmp)
        rollup = (
            warc_to_documents(back)
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).alias("total_chars"),
                F.sum(
                    F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
                ).alias("fp_sum"),
            )
            .crossJoin(quarantine_counts(back).select("n_quarantined"))
        )
        rows = rollup.collect()
        return spark.createDataFrame(rows, rollup.schema)
    finally:
        release_tracked()  # quarantine_counts' tracked persist
        shutil.rmtree(tmp, ignore_errors=True)


@query("o19_warc_roundtrip", oracle=WARC_ROUNDTRIP_SQL)
def o19_warc_roundtrip(spark, sf_dir):
    """WARC crawl-container boundary certified end to end (engine §2.1
    surface; the format crawls actually ship in — ISO 28500 / Common
    Crawl). Own codec (no external WARC lib), hostile-input-bounded
    decode, shared _corrupt_record quarantine contract, chunked Arrow
    emission (r13) bounding decoded-row materialization per task."""
    return warc_roundtrip_frame(spark, sf_dir, gzip_records=False)


# ---------------------------------------------------------------------------
# d_release_diff (operators/releasediff.py — built r12, registered r13)
# ---------------------------------------------------------------------------

#: canonical SQL twin (verified in tests/test_releasediff.py since r12):
#: release N+1 is derived from the documents table in closed form —
#: doc_id%7==0 removed, doc_id%5==0 (of the survivors) modified with a
#: ' v2' suffix, one added doc per doc_id%11==0 under -(id+1) — so the
#: expected (source, status) rollup is fully recomputable by DuckDB and
#: all four status classes land in the certified hash. Added ids live in
#: the NEGATIVE namespace (r13 review #4: the original +1000000 offset
#: collides with real doc_ids at sf where the table exceeds 1M rows —
#: the tripwire would then abort the certified query at exactly the
#: scales the sweep exists to probe; doc_id >= 0 by construction, so
#: -(id+1) is collision-free at EVERY scale factor)
RELEASE_DIFF_SQL = """
    WITH old AS (SELECT doc_id, source, text FROM documents),
    survivors AS (SELECT * FROM old WHERE doc_id % 7 <> 0),
    new_ AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      FROM survivors
      UNION ALL
      SELECT -(doc_id + 1), source, 'new doc ' || CAST(doc_id AS VARCHAR)
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


@query("d_release_diff", oracle=RELEASE_DIFF_SQL)
def d_release_diff(spark, sf_dir):
    """Corpus release diff certified end to end (engine addition §2.12;
    the release-note audit between two corpus versions): fingerprints
    projected AT THE SCAN so ~50 B/doc rides the one co-partitioned
    full-outer join — text never shuffles (plan-guarded in tests); the
    unique-non-null-id precondition is self-enforced by an assert_true
    tripwire whose window reuses the join's exchange (r13)."""
    from ..operators.releasediff import release_diff_report

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
        (-(F.col("doc_id") + 1)).alias("doc_id"),
        "source",
        F.concat(F.lit("new doc "), F.col("doc_id").cast("string")).alias("text"),
    )
    new = modified.unionByName(added)
    return release_diff_report(old.select("doc_id", "source", "text"), new)
