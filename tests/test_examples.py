"""The examples/ scripts are the migration-path documentation — keep them
runnable against the public API."""

from __future__ import annotations

import pytest


def test_corpus_pipeline_example(spark):
    from examples.corpus_pipeline import main

    out = main(spark, "/root/testdata/sf0.001")
    assert out["raw_docs"] > 0
    assert 0 < out["kept_docs"] <= out["raw_docs"]
    assert out["n_shards"] >= 1
    assert sum(out["shard_tokens"]) > 0
    assert all(n > 0 for n in out["dsir_selected"].values())
    assert len(out["hybrid_top5"]) == 5
    scores = [s for _, s in out["hybrid_top5"]]
    assert scores == sorted(scores, reverse=True) and scores[0] > 0
    assert out["cross_source_dup_fps"] >= 0
    # containment ppm is a fraction of the src shingle set: (0, 1e6]
    assert all(0 < ppm <= 1_000_000 for _, _, ppm in out["top_containment"])


def test_tracking_pipeline_example(spark):
    from examples.tracking_pipeline import main

    out = main(spark)
    assert out["pi_frames"] == out["graphs"] == 240
    assert out["top_formation"][1] > 0
    assert out["video_frames"] == 3


def test_event_analytics_example(spark):
    from examples.event_analytics import main

    out = main(spark, "/root/testdata/sf0.001")
    assert out["n_sessions"] > 0
    # the funnel is monotone non-increasing by construction
    f = out["funnel"]
    assert f["view"] >= f["click"] >= f["purchase"] >= 0
    assert out["cohort_week0_users"] > 0
    assert out["peak_7d_active"] > 0
    assert out["days_observed"] > 0
    assert out["streaming_matches_batch"] is True
    assert out["attribution_streaming_matches"] is True
    assert out["top_conversion_path"][2] > 0


def test_tokenizer_pipeline_example(spark):
    from examples.tokenizer_pipeline import main

    out = main(spark, "/root/testdata/sf0.001")
    assert out["bpe_merges"] == 8 and out["wordpiece_merges"] > 0
    # sf0.001's synthetic corpus has ~31 distinct words: both vocabularies
    # must exceed the bare character set (multi-char pieces were learned)
    # but stay naturally below the requested cap
    assert out["unigram_vocab"] > 26 and out["wordpiece_vocab"] > 26
    w = out["n_words"]
    assert w > 0
    # word-level BPE compresses; subword families expand
    bw, bt, bf = out["fertility_bpe"]
    assert bw == w and bt <= w and bf <= 100.0
    for key in ("fertility_unigram", "fertility_wordpiece"):
        fw, fp, ff = out[key]
        assert fw == w and fp >= w and ff >= 100.0
    assert out["wordpiece_unk"] >= 0
    assert len(out["top_wp_merges"]) == 5


def test_crawl_ingest_pipeline_example(spark):
    """The full crawl chain (r13 added PLAN, r14 adds IDENTITY+REFRESH):
    sitemap discovery → canonicalize (2x spelling variants collapse) →
    robots compliance → frontier → WARC (gzip members) → html extract
    → normalize → boilerplate must reproduce the ORIGINAL corpus text
    byte-for-byte on every doc, with the one robots-disallowed URL per
    site never entering the frontier, the injected corrupt shard
    quarantined exactly once, the per-site footer flagged in every
    source, and the change-rate refresh schedule putting exactly the
    week-over-week-changed pages at the front of the next crawl."""
    from examples.crawl_ingest_pipeline import main

    out = main(spark, "/root/testdata/sf0.001")
    # sitemaps list 500 pages TWICE (clean + messy spelling) + 20
    # disallowed /private URLs; canonicalization collapses 1020 -> 520;
    # the robots filter removes exactly the 20; 25 pages/site at limit 5
    # -> waves 0-4; SURT keys stay one-per-resource
    assert out["n_discovered_raw"] == 1020
    assert out["n_discovered"] == 520
    assert out["n_planned"] == 500
    assert out["max_wave"] == 4
    assert out["n_surt"] == 500
    assert out["n_quarantined"] == 1
    # EVERY planned doc must survive the whole chain (a silent drop in
    # the decoder/join would otherwise pass on the survivors alone) AND
    # round-trip byte-exactly
    assert out["n_docs"] == 500
    assert out["n_roundtrip_ok"] == out["n_docs"]
    assert out["n_boilerplate_flagged"] == 20  # one footer per source
    # REFRESH (r14): every third page changed week-to-week -> 7-day
    # interval, exactly due at asof (overdue 100); the rest idle at the
    # 30-day floor (23%); wave 0 of the refresh frontier is entirely due
    # pages (every source has >= 5 changed pages at sf0.001)
    assert out["n_changed"] == 167 and out["n_due"] == 167
    assert out["wave0_min_overdue"] == 100


def test_release_pipeline_example(spark):
    from examples.release_pipeline import main

    out = main(spark, "/root/testdata/sf0.001")
    # the markup-extraction stage ran (markup-free corpus: extraction is
    # the identity — a nonzero count means the extractor is eating clean
    # text), then canonicalization (ASCII corpus: NFKC identity, same
    # contract)
    assert out["n_markup_changed"] == 0
    assert out["n_normalized"] == 0
    # every split audited, nothing straddles (the structural invariant)
    assert set(out["splits"]) <= {"train", "val", "test"} and out["splits"]
    assert all(v[2] == 0 for v in out["splits"].values())
    assert sum(v[0] for v in out["splits"].values()) > 0
    # privacy gates produce finite, non-negative row counts
    assert out["k_anon_at_risk_rows"] >= 0
    assert out["l_div_homogeneous_rows"] >= 0
    # the JSONL export round-trips clean
    assert out["exported_quarantined"] == 0
    assert out["exported_clean"] == out["splits"].get("train", (0,))[0]
    # calibration covers the full embedding table
    assert out["n_dims"] == 64 and 0 < out["max_abs_component"] < 16
