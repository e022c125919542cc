"""CRAWL pipeline, plan → fetch → content → refresh (rounds 12-14): the
chain a web-corpus team runs BEFORE corpus_pipeline.py's
filter→dedup→select→pack — sitemaps and robots.txt in, clean
deduplicatable text out, plus the next crawl's priorities.

    PLAN   (r13 triad + r14 identity): parse_sitemaps (discovery —
             every page deliberately listed TWICE, clean + messy
             spelling) → with_canonical_url + distinct (the r14
             canonicalizer collapses the spelling variants 2→1)
             → robots_filter (RFC 9309 compliance — disallowed URLs
               never enter the frontier)
             → frontier_plan (per-host politeness waves); surt_key
               uniqueness audits one-resource-one-key
    FETCH  (synthetic): the planned URLs resolve to markup-wrapped pages
    INGEST (r12 chain): WARC (per-record-gzip — the Common Crawl layout)
             → quarantine audit (shared _corrupt_record contract)
             → warc_to_documents (host = the t_url_domains extraction)
             → extract_html_text (blocks/tags/entities)
             → normalize_text    (NFKC + Cc/Cf + ws)
             → strip_boilerplate (template lines)
             → ready for the corpus pipeline
    REFRESH (r14): two fetch epochs' content fingerprints →
             recrawl_schedule (every third page changed week-to-week →
             7-day interval, exactly due at asof; the rest idle at the
             30-day floor) → overdue_pct feeds frontier_plan as
             priority — the due pages fill wave 0 of the next crawl

Run: python examples/crawl_ingest_pipeline.py  [SPARK_GRAFT_SF_DIR
overrides the default /root/testdata/sf0.001]. The synthetic documents
table stands in for the web: each site publishes a sitemap listing its
pages PLUS one /private/admin page its robots.txt disallows; the planned
(allowed) URLs are fetched as markup-wrapped pages, exported as a genuine
WARC shard set (one corrupt shard injected), and must come out the far
end byte-identical to the original text — the whole chain proves itself
by round-trip, and the disallowed URL never appears anywhere downstream.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark, sf_dir: str) -> dict:
    import shutil

    import pyspark.sql.functions as F

    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.operators.boilerplate import (
        boilerplate_flags,
        strip_boilerplate,
    )
    from unravelsports_spark.operators.htmltext import extract_html_text
    from unravelsports_spark.operators.textnorm import normalize_text
    from unravelsports_spark.session import read_table
    from unravelsports_spark.sources.jsonl import quarantine_counts
    from unravelsports_spark.sources.warc import (
        read_warc,
        warc_to_documents,
        write_warc,
    )

    from unravelsports_spark.operators.frontier import frontier_plan
    from unravelsports_spark.operators.robots import robots_filter
    from unravelsports_spark.operators.sitemap import parse_sitemaps

    docs = read_table(spark, sf_dir, "documents")

    # ---- PLAN: sitemap discovery → robots compliance → frontier -------
    # each site publishes one urlset listing its pages + one /private
    # page; its robots.txt disallows /private for everyone
    url = F.concat(
        F.lit("http://"), "source", F.lit(".example/"), F.col("doc_id")
    )
    # every page listed twice — a clean loc and a messy spelling (shouty
    # scheme/host, default port, a dot segment, a tracking param) that
    # with_canonical_url must collapse onto the clean identity
    entry = F.concat(
        F.lit("<url><loc>"), url, F.lit("</loc></url>"),
        F.lit("<url><loc>HTTP://"), F.upper("source"),
        F.lit(".EXAMPLE:80/x/../"), F.col("doc_id"),
        F.lit("?utm_source=sitemap</loc></url>"),
    )
    site_maps = (
        docs.groupBy("source")
        .agg(F.concat_ws("", F.collect_list(entry)).alias("_entries"))
        .select(
            F.concat("source", F.lit(".example")).alias("domain"),
            F.concat(
                F.lit("<urlset>"),
                F.col("_entries"),
                F.lit("<url><loc>http://"),
                "source",
                F.lit(".example/private/admin</loc></url></urlset>"),
            ).alias("sitemap_xml"),
        )
    )
    robots = site_maps.select(
        "domain", F.lit("User-agent: *\nDisallow: /private\n").alias("robots_txt")
    )
    from unravelsports_spark.cache import tracked_persist

    from unravelsports_spark.operators.urlnorm import (
        surt_key,
        with_canonical_url,
    )

    # persisted: the raw-count audit AND the canonical distinct both
    # consume the sitemap synthesis + parse chain — the most expensive
    # per-document regex pass must run once, not once per action
    # (released in the finally with the other tracked persists)
    discovered_raw = tracked_persist(
        parse_sitemaps(site_maps).select(F.col("loc").alias("url"))
    )
    n_discovered_raw = discovered_raw.count()
    # canonical identity collapses the deliberate 2x spelling variants
    discovered = (
        with_canonical_url(discovered_raw)
        .select(F.col("url_canonical").alias("url"))
        .distinct()
    )
    n_discovered = discovered.count()
    allowed = robots_filter(discovered, robots, mode="filter")
    # persisted: the plan feeds the wave audit AND the fetch join below —
    # without it each action recomputes the sitemap/robots/frontier chain
    # (the flags-persist discipline; released in the finally)
    planned = tracked_persist(frontier_plan(allowed, per_host_limit=5))
    plan_agg = planned.agg(
        F.count("*").alias("n"),
        F.max("wave").alias("max_wave"),
        # one resource, one SURT key: the layout key stays unique across
        # the plan (a canonicalization bug would collide or split keys)
        F.countDistinct(surt_key(F.col("url"))).alias("n_surt"),
    ).first()

    # ---- FETCH (synthetic): the planned URLs resolve to pages ---------
    # Synthesize the crawl: markup-wrapped pages with a per-site footer
    # (one template line, CONSTANT per source — sites share a footer
    # across all their pages; the certified t_boilerplate_strip query
    # instead varies injection WITHIN each source to prove threshold
    # selectivity — this example proves end-to-end removal).
    # note: no text inside <title> — title text is CONTENT to the
    # extractor (only script/style/comment blocks are removed whole), and
    # the round-trip proof needs the body to be the only content
    page = F.concat(
        F.lit('<html><head><title></title><style>.x{}</style></head><body><p>'),
        F.col("text"),
        F.lit("</p><script>track()</script><div>site footer for "),
        F.col("source"),
        F.lit("</div></body></html>"),
    )
    # fetch EXACTLY the planned frontier: pages join the plan on the url
    # (a robots/frontier bug that dropped a legitimate URL would surface
    # as a missing doc in the round-trip count below, not silently)
    pages = docs.select(
        url.alias("target_uri"),
        F.encode(page, "UTF-8").alias("payload"),
    ).join(
        planned.select(F.col("url").alias("target_uri")), "target_uri"
    )

    tmp = tempfile.mkdtemp(prefix="spark_graft_crawl_")
    try:
        manifest = write_warc(pages, tmp, gzip_records=True).collect()
        with open(os.path.join(tmp, "part-corrupt.warc"), "wb") as fh:
            fh.write(b"not a warc shard \x00\xff")

        raw = read_warc(spark, tmp)
        qc = quarantine_counts(raw).first()

        # container → documents → markup-free → canonical → template-free
        d0 = warc_to_documents(raw).withColumn(
            "doc_id", F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
        )
        d1 = extract_html_text(d0, text_col="text", out_col="markup_free")
        d2 = normalize_text(d1, text_col="markup_free", form="NFKC")
        # block boundaries became spaces; re-line the footer for the
        # line-granular boilerplate stage (a real pipeline emits newlines
        # at block tags)
        lined = d2.select(
            "doc_id",
            "source",
            F.regexp_replace(
                "norm_text", r" (site footer for \S+)$", "\n$1"
            ).alias("text"),
        )
        # persist: the flag table feeds the broadcast join AND the
        # n_boilerplate_flagged count below — without it each action
        # recomputes the corpus-sized doc-frequency chain
        from unravelsports_spark.cache import tracked_persist

        flags = tracked_persist(boilerplate_flags(lined))
        cleaned = strip_boilerplate(lined, flags)

        # the round-trip proof: cleaned text must equal the ORIGINAL
        # corpus text byte-for-byte (host-keyed sources differ, so join
        # back on doc_id)
        orig = docs.select("doc_id", F.col("text").alias("orig_text"))
        comp = cleaned.join(orig, "doc_id").select(
            (F.col("clean_text") == F.col("orig_text")).alias("roundtrip_ok")
        )
        agg = comp.agg(
            F.count("*").alias("n"),
            F.sum(F.col("roundtrip_ok").cast("long")).alias("n_ok"),
        ).first()

        # ---- REFRESH: change rates → next crawl's priorities ----------
        # two fetch epochs a week apart; every third page changed between
        # them (fingerprint = content hash, the d_release_diff identity)
        from unravelsports_spark.operators.recrawl import recrawl_schedule

        week0 = docs.select(
            url.alias("url"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("fetch_ts"),
            F.md5("text").alias("content_fp"),
        )
        week1 = docs.select(
            url.alias("url"),
            F.lit("2026-01-08 00:00:00").cast("timestamp").alias("fetch_ts"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.md5(F.concat(F.col("text"), F.lit("v2"))),
            )
            .otherwise(F.md5("text"))
            .alias("content_fp"),
        )
        sched = tracked_persist(
            recrawl_schedule(
                week0.unionByName(week1), asof="2026-01-15 00:00:00"
            )
        )
        due = sched.agg(
            F.sum((F.col("n_changes") > 0).cast("long")).alias("n_changed"),
            F.sum((F.col("overdue_pct") >= 100).cast("long")).alias("n_due"),
        ).first()
        # the loop closure: overdue priority orders the NEXT frontier —
        # wave 0 of every host must be entirely due pages
        refresh = frontier_plan(
            sched.select("url", "overdue_pct"),
            per_host_limit=5,
            priority_col="overdue_pct",
        )
        wave0_min_overdue = (
            refresh.where(F.col("wave") == 0)
            .join(sched.select("url", F.col("overdue_pct").alias("o")), "url")
            .agg(F.min("o"))
            .first()[0]
        )

        return {
            "n_discovered_raw": int(n_discovered_raw),
            "n_discovered": int(n_discovered),
            "n_planned": int(plan_agg["n"]),
            "max_wave": int(plan_agg["max_wave"]),
            "n_surt": int(plan_agg["n_surt"]),
            "n_shards": len(manifest),
            "n_quarantined": int(qc["n_quarantined"]),
            "n_docs": int(agg["n"]),
            "n_roundtrip_ok": int(agg["n_ok"]),
            "n_boilerplate_flagged": flags.count(),
            "n_changed": int(due["n_changed"]),
            "n_due": int(due["n_due"]),
            "wave0_min_overdue": int(wave0_min_overdue),
        }
    finally:
        release_tracked()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    from unravelsports_spark.session import get_spark

    out = main(
        get_spark(),
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    print(out)
