"""Sitemap ingestion (operators/sitemap.py) — built round 13, driver
registration queued r14 (`t_sitemap_extract`). SITEMAP_SQL verified here
is the r14 oracle; `_sitemap_query` is the query shape that moves to the
plans registry at registration (the corpus9 discipline). The oracle is
CLOSED-FORM (the robots style): it re-derives locs/lastmods from the same
synthesis arithmetic rather than re-running the parser, so a parser bug
cannot hide in both engines; engine behavior of the regex patterns
themselves is pinned by the hand-case battery below."""

from pyspark.sql import functions as F

from .conftest import SF_CORRECT

# DuckDB twin of the synthesized-sitemap rollup: each source publishes one
# urlset whose entries derive from its docs — loc carries an &amp; query
# (entity decode load-bearing in the fingerprint), every third entry has a
# lastmod. The oracle re-derives locs/lastmods in closed form rather than
# re-running the parser (the robots closed-form style: a parser bug
# cannot hide in both engines).
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


def _sitemap_query(spark, sf_dir):
    """The r14 t_sitemap_extract query shape: one synthesized urlset
    document per source (entries from its docs, '&amp;' in every loc so
    entity decode lands in the fingerprint, lastmod on every third
    entry), parse_sitemaps, per-source rollup."""
    from unravelsports_spark.operators.sitemap import parse_sitemaps
    from unravelsports_spark.session import read_table

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


def test_sitemap_extract_matches_duckdb(spark, duck):
    got = sorted(map(tuple, _sitemap_query(spark, SF_CORRECT).collect()))
    want = sorted(map(tuple, duck.execute(SITEMAP_SQL).fetchall()))
    assert got == want and len(got) == 20


def test_urlset_and_index_hand_cases(spark):
    """Semantics pinned: urlset vs sitemapindex kind detection; loc
    entity decode (incl. the &amp;lt; single-level edge); lastmod pairing
    per entry (absent → NULL); attributes on entry tags; whitespace
    inside loc; entries without loc dropped; <urlset> never swallowed as
    a <url> block; CRLF documents."""
    from unravelsports_spark.operators.sitemap import parse_sitemaps

    urlset = (
        '<?xml version="1.0"?>\r\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\r\n'
        "  <url><loc>http://a.example/x?q=1&amp;r=2</loc>"
        "<lastmod>2026-01-02</lastmod></url>\r\n"
        '  <url priority="0.5">\r\n    <loc>\r\n http://a.example/amp&amp;lt;'
        "\r\n</loc>\r\n  </url>\r\n"
        "  <url><lastmod>2026-01-03</lastmod></url>\r\n"  # no loc: dropped
        "</urlset>\r\n"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>http://b.example/s1.xml</loc></sitemap>"
        "<sitemap><loc>http://b.example/s2.xml</loc>"
        "<lastmod>2025-12-31</lastmod></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.example", urlset), ("b.example", index)],
        "domain string, sitemap_xml string",
    )
    rows = parse_sitemaps(df).collect()
    got = {(r["domain"], r["loc"]): (r["kind"], r["lastmod"]) for r in rows}
    assert got == {
        ("a.example", "http://a.example/x?q=1&r=2"): ("urlset", "2026-01-02"),
        # single-level decode: &amp;lt; → &lt;, never <
        ("a.example", "http://a.example/amp&lt;"): ("urlset", None),
        ("b.example", "http://b.example/s1.xml"): ("index", None),
        ("b.example", "http://b.example/s2.xml"): ("index", "2025-12-31"),
    }
    # entry order is preserved via pos
    a_rows = sorted((r["pos"], r["loc"]) for r in rows if r["domain"] == "a.example")
    assert [p for p, _ in a_rows] == [0, 1]


def test_sitemap_feeds_frontier_composition(spark):
    """The crawl-planning triad composes: sitemap discovery → robots
    compliance → frontier scheduling, all pure Catalyst."""
    from unravelsports_spark.operators.frontier import frontier_plan
    from unravelsports_spark.operators.robots import robots_filter
    from unravelsports_spark.operators.sitemap import parse_sitemaps

    xml = (
        "<urlset>"
        + "".join(
            f"<url><loc>http://c.example/p{i}</loc></url>" for i in range(8)
        )
        + "<url><loc>http://c.example/private/secret</loc></url></urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("c.example", xml)], "domain string, sitemap_xml string"
    )
    robots = spark.createDataFrame(
        [("c.example", "User-agent: *\nDisallow: /private\n")],
        "domain string, robots_txt string",
    )
    discovered = parse_sitemaps(sitemaps).select(F.col("loc").alias("url"))
    allowed = robots_filter(discovered, robots, mode="filter")
    planned = frontier_plan(allowed, per_host_limit=4)
    rows = planned.collect()
    assert len(rows) == 8  # the disallowed loc never reaches the frontier
    assert {r["wave"] for r in rows} == {0, 1}
    assert all(r["slot"] < 4 and r["host"] == "c.example" for r in rows)


def test_sitemap_plan_shape(spark):
    """Pure projection + one explode: no shuffle, no join in the parse
    itself (the rollup's exchange is the query's, not the parser's)."""
    from unravelsports_spark.operators.sitemap import parse_sitemaps

    df = spark.createDataFrame(
        [("d.example", "<urlset><url><loc>http://d.example/</loc></url></urlset>")],
        "domain string, sitemap_xml string",
    )
    plan = (
        parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "Generate" in plan  # the one posexplode


def test_comment_cannot_flip_classification(spark):
    """r13 review pin: a '<sitemapindex>' inside an XML comment must not
    reclassify a urlset (which silently dropped every <url> entry) —
    comments strip before classification and extraction, and a commented-
    out <url> block is likewise ignored."""
    from unravelsports_spark.operators.sitemap import parse_sitemaps

    xml = (
        "<!-- <sitemapindex> format retired 2020 -->\n"
        "<urlset>\n"
        "<!-- <url><loc>http://e.example/ghost</loc></url> -->\n"
        "<url><loc>http://e.example/real</loc></url>\n"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("e.example", xml)], "domain string, sitemap_xml string"
    )
    rows = parse_sitemaps(df).collect()
    assert [(r["kind"], r["loc"]) for r in rows] == [
        ("urlset", "http://e.example/real")
    ]


def test_namespace_prefixed_tags_match_local_name(spark):
    """r13 review pass 18 #1 pin: ElementTree-style prefixed serialization
    ('<ns0:url><ns0:loc>…') parses by local name, per the documented
    contract — the unprefixed patterns returned zero rows."""
    from unravelsports_spark.operators.sitemap import parse_sitemaps

    xml = (
        '<ns0:urlset xmlns:ns0="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<ns0:url><ns0:loc>http://n.example/a</ns0:loc>"
        "<ns0:lastmod>2026-02-03</ns0:lastmod></ns0:url>"
        "</ns0:urlset>"
    )
    idx = (
        "<x:sitemapindex><x:sitemap><x:loc>http://n.example/s.xml</x:loc>"
        "</x:sitemap></x:sitemapindex>"
    )
    df = spark.createDataFrame(
        [("n.example", xml), ("m.example", idx)],
        "domain string, sitemap_xml string",
    )
    got = {(r["domain"], r["loc"]): (r["kind"], r["lastmod"])
           for r in parse_sitemaps(df).collect()}
    assert got == {
        ("n.example", "http://n.example/a"): ("urlset", "2026-02-03"),
        ("m.example", "http://n.example/s.xml"): ("index", None),
    }


def test_unterminated_comment_is_dead_text(spark):
    """r13 review pass 21 #1 pin: an UNCLOSED comment (truncated fetch)
    runs to EOF — commented '<sitemapindex' must not flip classification,
    and entries after the unterminated open are dead text; entries BEFORE
    it still parse."""
    from unravelsports_spark.operators.sitemap import parse_sitemaps

    xml = (
        "<urlset><url><loc>http://f.example/keep</loc></url>\n"
        "<!-- <sitemapindex> retired, comment never closed\n"
        "<url><loc>http://f.example/ghost</loc></url></urlset>"
    )
    df = spark.createDataFrame(
        [("f.example", xml)], "domain string, sitemap_xml string"
    )
    rows = parse_sitemaps(df).collect()
    assert [(r["kind"], r["loc"]) for r in rows] == [
        ("urlset", "http://f.example/keep")
    ]


def test_comment_inside_loc_and_null_doc(spark):
    """r13 review pass 22 pins: (1) a comment INSIDE <loc> strips to ''
    (a space would corrupt the URL — XML-value semantics, diverging
    deliberately from htmltext's prose discipline); (2) a NULL document
    yields zero entries, per the documented extractor contract."""
    from unravelsports_spark.operators.sitemap import parse_sitemaps

    df = spark.createDataFrame(
        [("g.example",
          "<urlset><url><loc>http://g.example/x<!--y-->z</loc></url></urlset>"),
         ("h.example", None)],
        "domain string, sitemap_xml string",
    )
    rows = parse_sitemaps(df).collect()
    assert [(r["domain"], r["loc"]) for r in rows] == [
        ("g.example", "http://g.example/xz")
    ]
