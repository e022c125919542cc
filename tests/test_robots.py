"""Robots Exclusion Protocol filtering (operators/robots.py) — built round
13, driver registration queued r14 (`t_robots_filter`). ROBOTS_FILTER_SQL
verified here is the r14 oracle; `_robots_query` is the query shape that
moves to the plans registry at registration (the corpus9 discipline).

The oracle is CLOSED-FORM (the t_closeness hand-example style, certifiable
at any scale): the robots bodies are synthesized per source in the query,
so DuckDB states the hand-derived verdict table directly instead of
re-implementing the parser — a parser bug cannot hide in both engines."""

from pyspark.sql import functions as F

from .conftest import SF_CORRECT

#: per-source robots bodies: even-k sources carry a trainbot group (so the
#: star group MUST be ignored — RFC 9309 §2.2.1 suppression), odd-k sources
#: only a star group (longest-match Allow door); k % 5 == 0 sources have NO
#: robots at all (everything allowed). k = doc_id % 20 = the source index.
_EVEN_BODY = (
    "# crawl policy\n"
    "User-agent: trainbot\n"
    "Disallow: /private\n"
    "Allow: /private/ok*\n"
    "Disallow: /*.pdf$\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /\n"
)
_ODD_BODY = (
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


def _robots_query(spark, sf_dir):
    """The r14 t_robots_filter query shape: URLs synthesized from the
    documents table (6 path classes keyed (doc_id//20)%6 — independent of
    source, the boilerplate-test lesson), per-source robots bodies (three
    variants incl. a no-robots cohort), robots_filter for agent=trainbot,
    per-source rollup whose fp_sum pins exactly which URLs survived."""
    from unravelsports_spark.operators.robots import robots_filter
    from unravelsports_spark.session import read_table

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
            F.when(k % 2 == 0, F.lit(_EVEN_BODY))
            .otherwise(F.lit(_ODD_BODY))
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


def test_robots_filter_matches_duckdb(spark, duck):
    got = sorted(map(tuple, _robots_query(spark, SF_CORRECT).collect()))
    want = sorted(map(tuple, duck.execute(ROBOTS_FILTER_SQL).fetchall()))
    assert got == want and len(got) == 20
    # the filter must genuinely discriminate: some sources fully allowed,
    # some partially blocked — an all-allowed run certifies nothing
    assert {n_urls == n_allowed for _, n_urls, n_allowed, _ in got} == {True, False}


def test_rfc_semantics_hand_cases(spark):
    """RFC 9309 semantics pinned one by one: group merge, specific-agent
    suppression of *, longest-match precedence, allow-wins-octet-ties,
    $ anchor, * wildcard, empty Disallow, rules before the first
    User-agent ignored, consecutive User-agent lines sharing rules,
    case-insensitive directives/agent, comment stripping, query-string
    matching, no-robots and no-matching-group domains allowed."""
    from unravelsports_spark.operators.robots import robots_filter

    body = (
        "Disallow: /orphan\n"            # before any UA: ignored
        "User-Agent: TrainBot\n"         # case-insensitive name + agent
        "user-agent: otherbot\n"         # consecutive UA lines share rules
        "Disallow: /a # trailing comment\n"
        "Allow: /a$\n"                   # same octets as /a after strip? no: 3 vs 2 — longest wins
        "Disallow: /dl/*.zip$\n"
        "Disallow: /q?x=\n"              # query-string matching
        "\n"
        "User-agent: trainbot\n"         # second group, same agent: MERGES
        "Allow: /a/open\n"
        "Disallow:\n"                    # empty value: matches nothing
        "User-agent: *\n"
        "Disallow: /\n"                  # must be IGNORED for trainbot
    )
    urls = [
        ("http://d.example/a", True),           # Allow /a$ (3) beats Disallow /a (2)
        ("http://d.example/a/open/x", True),    # Allow /a/open (7) > Disallow /a (2)
        ("http://d.example/ab", False),         # /a prefix matches /ab
        ("http://d.example/b", True),           # no rule (star group suppressed)
        ("http://d.example/dl/f.zip", False),   # * and $ both engage
        ("http://d.example/dl/f.zipx", True),   # $ anchor prevents match
        ("http://d.example/q?x=1", False),      # pattern matches path?query
        ("http://d.example/q?y=1", True),
        ("http://nobots.example/a", True),      # no robots row
        ("http://empty.example/a", True),       # robots row, no matching group
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    robots = spark.createDataFrame(
        [("d.example", body),
         ("empty.example", "User-agent: elsebot\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in robots_filter(df, robots, agent="trainbot").collect()
    }
    for u, want in urls:
        assert got[u] is want, (u, want, got[u])


def test_allow_wins_true_octet_tie(spark):
    from unravelsports_spark.operators.robots import robots_filter

    body = "User-agent: *\nDisallow: /tie\nAllow: /tie\n"
    df = spark.createDataFrame([("http://t.example/tie/x",)], "url string")
    robots = spark.createDataFrame(
        [("t.example", body)], "domain string, robots_txt string"
    )
    row = robots_filter(df, robots).collect()[0]
    assert row["robots_allowed"] is True  # equal octets → allow wins


def test_mode_filter_and_collision_guard(spark):
    import pytest

    from unravelsports_spark.operators.robots import robots_filter

    df = spark.createDataFrame(
        [("http://d.example/keep",), ("http://d.example/drop/x",)],
        "url string",
    )
    robots = spark.createDataFrame(
        [("d.example", "User-agent: *\nDisallow: /drop\n")],
        "domain string, robots_txt string",
    )
    kept = robots_filter(df, robots, mode="filter").collect()
    assert [r["url"] for r in kept] == ["http://d.example/keep"]
    assert kept[0].asDict().keys() == {"url"}  # columns unchanged
    with pytest.raises(ValueError):
        robots_filter(df, robots, mode="nuke")
    with pytest.raises(ValueError):
        robots_filter(df.withColumn("robots_allowed", F.lit(True)), robots)


def test_robots_plan_shape(spark):
    """Scale shape: verdicts per DISTINCT key joined back (the corpus
    never fans out against the rule table); no cartesian anywhere; the
    rule-side frames are domain-sized."""
    plan = (
        _robots_query(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blank_and_unknown_lines_do_not_split_ua_cluster(spark):
    """r13 review #1 pin: the RFC 9309 ABNF allows empty lines between
    consecutive User-agent lines, and unrecognized directives (Sitemap,
    Crawl-delay) MUST be ignored — neither may sever an agent from the
    group's rules (the lag-based group tracking used to start a new group
    at the second UA line, leaving the first agent an EMPTY group that
    also suppressed the * fallback)."""
    from unravelsports_spark.operators.robots import robots_filter

    body = (
        "User-agent: trainbot\n"
        "\n"                               # blank line inside the cluster
        "# interleaved comment\n"
        "User-agent: otherbot\n"
        "Crawl-delay: 10\n"                # unknown directive: ignored
        "Disallow: /x\n"
        "Sitemap: http://d.example/s.xml\n"
    )
    df = spark.createDataFrame(
        [("http://d.example/x/1",), ("http://d.example/y",)], "url string"
    )
    robots = spark.createDataFrame(
        [("d.example", body)], "domain string, robots_txt string"
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in robots_filter(df, robots, agent="trainbot").collect()
    }
    assert got == {"http://d.example/x/1": False, "http://d.example/y": True}


def test_null_url_survives_annotate_mode(spark):
    """r13 review #3 pin: a NULL url row is annotated with a NULL verdict
    (never silently dropped); filter mode drops it."""
    from unravelsports_spark.operators.robots import robots_filter

    df = spark.createDataFrame(
        [("http://d.example/ok",), (None,)], "url string"
    )
    robots = spark.createDataFrame(
        [("d.example", "User-agent: *\nDisallow: /drop\n")],
        "domain string, robots_txt string",
    )
    rows = robots_filter(df, robots).collect()
    assert len(rows) == 2
    got = {r["url"]: r["robots_allowed"] for r in rows}
    assert got["http://d.example/ok"] is True and got[None] is None
    kept = robots_filter(df, robots, mode="filter").collect()
    assert [r["url"] for r in kept] == ["http://d.example/ok"]
