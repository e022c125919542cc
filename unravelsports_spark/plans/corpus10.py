"""Round-14 registrations (VERDICT r13 #1): the four r13-built,
test-oracled queries — the crawl-planning triad (robots compliance,
frontier politeness, sitemap ingestion) and the TFRecord corpus boundary.
Canonical oracle SQL moves HERE from the r13 tests at registration time
per the corpus7/8/9 discipline (the tests now import these strings, so
twin and oracle cannot drift).

Oracle styles (the corpus5/6/7 taxonomy):

- ``t_robots_filter`` and ``t_sitemap_extract`` are CLOSED-FORM: the
  robots bodies / sitemap XML are synthesized per source inside the
  query, so DuckDB states the hand-derived verdict table / re-derives the
  locs from the same synthesis arithmetic instead of re-implementing the
  parser — a parser bug cannot hide in both engines. Engine behavior of
  the regex machinery is pinned by the hand-case batteries in
  tests/test_robots.py and tests/test_sitemap.py.
- ``t_frontier_plan`` is exact SQL: both engines derive the identical
  (wave, slot) assignment from the same window arithmetic ordered by
  md5(url), which is engine-portable.
- ``o20_tfrecord_roundtrip`` is the o18/o19 boundary style: the rollup is
  recomputed from the ORIGINAL parquet; the TFRecord bytes (framing CRCs
  + tf.Example wire format) exist only between Spark's writer and Spark's
  reader, the md5-prefix fingerprint sums certify the exact round-tripped
  text, id_sum certifies the int64 feature leg, and the injected garbage
  shard makes quarantine semantics load-bearing in the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import read_table
from .relational import query

# ---------------------------------------------------------------------------
# t_robots_filter (operators/robots.py — built r13, registered r14)
# ---------------------------------------------------------------------------

#: per-source robots bodies: even-k sources carry a trainbot group (so the
#: star group MUST be ignored — RFC 9309 §2.2.1 suppression), odd-k sources
#: only a star group (longest-match Allow door); k % 5 == 0 sources have NO
#: robots at all (everything allowed). k = doc_id % 20 = the source index.
ROBOTS_EVEN_BODY = (
    "# crawl policy\n"
    "User-agent: trainbot\n"
    "Disallow: /private\n"
    "Allow: /private/ok*\n"
    "Disallow: /*.pdf$\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /\n"
)
ROBOTS_ODD_BODY = (
    "User-agent: *\n"
    "Disallow: /blocked\n"
    "Allow: /blocked/door\n"
)

#: hand-derived verdicts for agent=trainbot (path class = (doc_id//20)%6):
#: even-k body: class1 /private/doc → Disallow /private (8 octets);
#: class2 /private/okfile → Allow /private/ok* (12) beats Disallow (8);
#: class3 *.pdf → Disallow /*.pdf$ ($-anchored); star group ignored.
#: odd-k body: class4 /blocked/door → Allow (13) beats Disallow /blocked
#: (8); class5 /blocked/room → Disallow. No-robots sources: all allowed.
ROBOTS_FILTER_SQL = """
    WITH u AS (
      SELECT doc_id, source, doc_id % 20 AS k, (doc_id // 20) % 6 AS cls,
             'http://' || source || '.example' ||
             CASE (doc_id // 20) % 6
               WHEN 0 THEN '/public/doc' || doc_id
               WHEN 1 THEN '/private/doc' || doc_id
               WHEN 2 THEN '/private/okfile' || doc_id
               WHEN 3 THEN '/files/doc' || doc_id || '.pdf'
               WHEN 4 THEN '/blocked/door' || doc_id
               ELSE '/blocked/room' || doc_id END AS url
      FROM documents),
    v AS (
      SELECT *, CASE WHEN k % 5 = 0 THEN TRUE
                     WHEN k % 2 = 0 THEN cls NOT IN (1, 3)
                     ELSE cls <> 5 END AS allowed
      FROM u)
    SELECT source, COUNT(*) AS n_urls,
           CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_allowed,
           CAST(SUM(CASE WHEN allowed
             THEN CAST(('0x' || substring(md5(url), 1, 8)) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS fp_sum
    FROM v GROUP BY source
"""


@query("t_robots_filter", oracle=ROBOTS_FILTER_SQL)
def t_robots_filter(spark, sf_dir):
    """RFC 9309 robots compliance at corpus scale: URLs synthesized from
    the documents table (6 path classes keyed (doc_id//20)%6 — independent
    of source, the boilerplate-test lesson), per-source robots bodies
    (three variants incl. a no-robots cohort), robots_filter for
    agent=trainbot, per-source rollup whose fp_sum pins exactly which URLs
    survived. Scale shape: verdicts per DISTINCT (canonical host,
    path?query) key joined back — the corpus never fans out against the
    rule table (plan-guarded in tests/test_robots.py)."""
    from ..operators.robots import robots_filter

    docs = read_table(spark, sf_dir, "documents")
    cls = F.expr("cast((doc_id div 20) % 6 as int)")
    path = (
        F.when(cls == 0, F.concat(F.lit("/public/doc"), F.col("doc_id")))
        .when(cls == 1, F.concat(F.lit("/private/doc"), F.col("doc_id")))
        .when(cls == 2, F.concat(F.lit("/private/okfile"), F.col("doc_id")))
        .when(cls == 3, F.concat(F.lit("/files/doc"), F.col("doc_id"), F.lit(".pdf")))
        .when(cls == 4, F.concat(F.lit("/blocked/door"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("/blocked/room"), F.col("doc_id")))
    )
    urls = docs.select(
        "doc_id",
        "source",
        F.concat(F.lit("http://"), "source", F.lit(".example"), path).alias("url"),
    )
    k = F.expr("cast(substring(source, 4) as int)")
    robots = (
        docs.select("source").distinct()
        .where(k % 5 != 0)  # k%5==0 sources publish no robots.txt
        .select(
            F.concat("source", F.lit(".example")).alias("domain"),
            F.when(k % 2 == 0, F.lit(ROBOTS_EVEN_BODY))
            .otherwise(F.lit(ROBOTS_ODD_BODY))
            .alias("robots_txt"),
        )
    )
    fp = F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long")
    return (
        robots_filter(urls, robots, agent="trainbot")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum(F.col("robots_allowed").cast("bigint")).alias("n_allowed"),
            F.sum(F.when(F.col("robots_allowed"), fp).otherwise(F.lit(0))).alias(
                "fp_sum"
            ),
        )
    )


# ---------------------------------------------------------------------------
# t_frontier_plan (operators/frontier.py — built r13, registered r14)
# ---------------------------------------------------------------------------

#: exact-SQL twin: both engines derive the identical (wave, slot)
#: assignment — ROW_NUMBER over the canonical host ordered by md5(url)
#: (engine-portable), then integer div/mod by the per-host limit.
FRONTIER_SQL = """
    WITH u AS (
      SELECT doc_id, source,
             'http://' || source || '.example/doc' || doc_id AS url
      FROM documents),
    r AS (
      SELECT source, url,
             ROW_NUMBER() OVER (PARTITION BY lower(source) || '.example'
                                ORDER BY md5(url)) - 1 AS rk
      FROM u),
    p AS (SELECT source, url, rk // 3 AS wave, rk % 3 AS slot FROM r)
    SELECT wave, COUNT(*) AS n_urls,
           CAST(COUNT(DISTINCT lower(source)) AS BIGINT) AS n_hosts,
           CAST(MAX(slot) AS BIGINT) AS max_slot,
           CAST(SUM(CASE WHEN slot = 0
             THEN CAST(('0x' || substring(md5(url), 1, 8)) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS fp_slot0
    FROM p GROUP BY wave ORDER BY wave
"""


@query("t_frontier_plan", oracle=FRONTIER_SQL)
def t_frontier_plan(spark, sf_dir):
    """URL-frontier politeness planning: URLs from the documents table,
    per_host_limit=3, per-wave rollup. fp_slot0 pins the exact slot-0 URL
    of every (host, wave) — the full deterministic order, not just the
    counts. Scale shape: ONE host-partitioned row_number window +
    closed-form integer div/mod; the duplicate-url tripwire's (host, url)
    count window REUSES the host exchange (plan-guarded in
    tests/test_frontier.py)."""
    from ..operators.frontier import frontier_plan

    docs = read_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("http://"), "source", F.lit(".example/doc"), F.col("doc_id")
        ).alias("url"),
    )
    planned = frontier_plan(urls, per_host_limit=3)
    fp = F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long")
    return (
        planned.groupBy("wave")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
            F.max("slot").alias("max_slot"),
            F.sum(F.when(F.col("slot") == 0, fp).otherwise(F.lit(0))).alias(
                "fp_slot0"
            ),
        )
        # r15: terminal sort removed (order-insensitive comparator; §2.4)
    )


# ---------------------------------------------------------------------------
# t_sitemap_extract (operators/sitemap.py — built r13, registered r14)
# ---------------------------------------------------------------------------

#: closed-form twin: re-derives locs/lastmods from the same synthesis
#: arithmetic rather than re-running the parser (the robots style — a
#: parser bug cannot hide in both engines). The '&amp;' in every loc makes
#: entity decode load-bearing in the fingerprint.
SITEMAP_SQL = """
    WITH e AS (
      SELECT source, doc_id,
             'http://' || source || '.example/p' || doc_id || '?a=1&b=2'
               AS loc,
             CASE WHEN doc_id % 3 = 0
                  THEN '2026-0' || (1 + doc_id % 9 // 2) || '-01' END AS lastmod
      FROM documents)
    SELECT source, COUNT(*) AS n_locs,
           CAST(SUM(CASE WHEN lastmod IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dated,
           CAST(SUM(CAST(('0x' || substring(md5(loc), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_loc,
           CAST(SUM(CASE WHEN lastmod IS NOT NULL
             THEN CAST(('0x' || substring(md5(lastmod), 1, 8)) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS fp_mod
    FROM e GROUP BY source
"""


@query("t_sitemap_extract", oracle=SITEMAP_SQL)
def t_sitemap_extract(spark, sf_dir):
    """Sitemap ingestion: one synthesized urlset document per source
    (entries from its docs, '&amp;' in every loc so entity decode lands in
    the fingerprint, lastmod on every third entry), parse_sitemaps,
    per-source rollup. Scale shape: pure projection + one explode;
    expensive full-document passes materialized once (plan-verified 3→1
    strips in tests/test_sitemap.py)."""
    from ..operators.sitemap import parse_sitemaps

    docs = read_table(spark, sf_dir, "documents")
    entry = F.concat(
        F.lit("  <url>\n    <loc> http://"),
        "source",
        F.lit(".example/p"),
        F.col("doc_id"),
        F.lit("?a=1&amp;b=2 </loc>\n"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("    <lastmod>2026-0"),
                (1 + F.expr("doc_id % 9 div 2")).cast("string"),
                F.lit("-01</lastmod>\n"),
            ),
        ).otherwise(F.lit("")),
        F.lit("  </url>\n"),
    )
    sitemaps = (
        docs.groupBy("source")
        .agg(F.concat_ws("", F.collect_list(entry)).alias("_body"))
        .select(
            F.col("source").alias("domain"),
            F.concat(
                F.lit('<?xml version="1.0"?>\n<urlset xmlns="http://www.'
                      'sitemaps.org/schemas/sitemap/0.9">\n'),
                F.col("_body"),
                F.lit("</urlset>\n"),
            ).alias("sitemap_xml"),
        )
    )
    parsed = parse_sitemaps(sitemaps)
    fp = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
    return (
        parsed.groupBy(F.col("domain").alias("source"))
        .agg(
            F.count("*").alias("n_locs"),
            F.sum(F.col("lastmod").isNotNull().cast("bigint")).alias("n_dated"),
            F.sum(fp("loc")).alias("fp_loc"),
            F.sum(
                F.when(F.col("lastmod").isNotNull(), fp("lastmod")).otherwise(
                    F.lit(0)
                )
            ).alias("fp_mod"),
        )
    )


# ---------------------------------------------------------------------------
# o20_tfrecord_roundtrip (sources/tfrecord.py — built r13, registered r14)
# ---------------------------------------------------------------------------

#: boundary twin (the o18/o19 style): the rollup recomputed from the
#: original parquet; n_quarantined pins the one injected garbage shard.
TFRECORD_SQL = """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_sum,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(1 AS BIGINT) AS n_quarantined
    FROM documents GROUP BY source
"""


@query("o20_tfrecord_roundtrip", oracle=TFRECORD_SQL)
def o20_tfrecord_roundtrip(spark, sf_dir):
    """documents → sharded tf.Example TFRecord export → binaryFile read +
    framing decode + feature projection → per-source rollup equal to
    DuckDB on the ORIGINAL parquet. One garbage shard injected (excluded
    from the rollup AND counted exactly once); id_sum certifies the int64
    feature leg alongside the text fingerprint. Tiny result materialized
    so the scratch dir can be removed."""
    import os
    import shutil
    import tempfile

    from ..cache import release_tracked
    from ..sources.jsonl import quarantine_counts
    from ..sources.tfrecord import (
        examples_to_columns,
        read_tfrecords,
        write_tfrecords,
    )

    tmp = tempfile.mkdtemp(prefix="spark_graft_tfr_")
    try:
        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        write_tfrecords(docs, tmp).collect()
        with open(os.path.join(tmp, "part-corrupt.tfrecord"), "wb") as fh:
            fh.write(b"definitely not a tfrecord \x00\xff")
        back = read_tfrecords(spark, tmp)
        cols = examples_to_columns(
            back, {"doc_id": "int64", "source": "string", "text": "string"}
        )
        fp = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
        rollup = (
            cols.where(F.col("_corrupt_record").isNull())
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).alias("total_chars"),
                F.sum(fp).alias("fp_sum"),
                F.sum("doc_id").alias("id_sum"),
            )
            .crossJoin(quarantine_counts(back).select("n_quarantined"))
        )
        rows = rollup.collect()
        return spark.createDataFrame(rows, rollup.schema)
    finally:
        release_tracked()
        shutil.rmtree(tmp, ignore_errors=True)
