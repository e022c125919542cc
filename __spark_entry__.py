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
# r07). The driver checks a bounded prefix of this dict, so enumerate
# never-certified queries first to widen certification breadth; no keys are
# renamed. Round-8 ROTATION (VERDICT r7 action #1, executed exactly): the
# 44 hash-green r7 keys (CORRECTNESS_r07.json) ENTER this set; the 24
# r3-leftover keys (mm_gif_real .. j9_interval_join block) and the 22
# standing r4-cohort keys (s_ann_mllib_brp .. d_semantic_contamination)
# LEAVE it, so the round-8 window re-certifies the oldest standing hashes
# — the codec / streaming-native-window / asof / JSON / sketch paths last
# driver-hashed in r3/r4. 46 stale + up to 4 new r8 queries fill the
# 50-slot window; the six rows-only model checks (m_pressing_intensity ..
# m_graph_convert_delaunay) sit at priority 1 behind them this round —
# each was rows-green in r07 AND carries a hash-certified m_*_cells twin,
# so pushing them past slot 50 for one round loses nothing.
_CERTIFIED = frozenset(
    {
        # r6 green (CORRECTNESS_r06.json), untouched by round-7 changes
        "a5_conditional_sum", "a7_global_distinct", "d_dup_clusters",
        "d_embedding_neardup", "d_exact_dedup_stats", "d_lsh_candidate_pairs",
        "d_lsh_recall", "d_minhash_signatures", "d_semdedup_multitable",
        "d_semdedup_recall", "d_simhash", "f1_string_ops", "f2_temporal_trunc",
        "f3_math_ops", "f4_null_handling", "f5_casts", "f6_array_ops",
        "j8_asof_join", "m_graph_custom_cells", "o11_concat_key", "o5_top_k_limit",
        "o6_union_all", "o8_unpivot", "o9_explode_tokens", "s_ann_bruteforce",
        "s_ann_ivf", "s_ann_lsh", "s_ann_top_pairs",
        "t_filter_funnel", "t_fingerprint", "t_quality_by_source", "t_token_stats",
        "w1_lag_diff", "w2_partitioned_min", "w3_rank_topk", "w4_sessionize",
        "w5_tumbling_window", "w7_row_index",
        # r5 green (CORRECTNESS_r05.json), unchanged since.
        # q1 rotation exemption, documented per ADVICE r6 #2: the late-r7
        # scaled_units extraction is a pure code move — q1 builds the
        # IDENTICAL expression tree (plan guards pass unchanged), it is
        # smoke-run by entry() every round, and this session's fresh-
        # process oracle compare re-verified it hash-exact at sf0.01.
        "q1_pricing_summary", "d_jaccard_top_pairs", "w6_savgol_oracle",
        "t_repetition_stats", "t_sequence_packing", "a15_hll_sketch_union",
        "w9_interpolate_gaps", "t_bigram_logprob", "t_bpe_merges",
        "t_bpe_tokenized_stats", "m_efpi_cells", "m_savgol_cells",
        "t_dsir_scores", "t_dsir_resample", "t_nb_confusion",
        "t_shard_manifest", "d_incremental_dedup",
        "p1_p2_project_filter", "f7_f8_conditional_literals",
        "p3_filter_eq", "p4_range_between", "p5_modulo_sample", "p6_conditional_cap",
        "p7_sign_flip", "p8_bool_derive", "j1_dim_join", "j2_agg_back_join",
        "j3_semi_join", "j4_anti_join", "j5_enrich_revenue", "j7_distinct_join",
        "a2_distinct_count", "a3_group_stats", "a4_argmin_in_group",
        # r7 green (CORRECTNESS_r07.json, all 44 hash-exact): the ADVICE-r6
        # rotation seven, every query the r7 langid/pq/mllb-lsh rewrites
        # touched, the fourteen new r7 queries, and 16 recycled r3 greens.
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
        # t_hybrid_rrf was r7-green but is NOT certified-exempt: the
        # round-8 bm25_scores rewrite (regexp_count tf/dl + driver-side
        # stats literals) changes its plan, so it re-certifies this round
        # alongside t_bm25_topk (the other bm25_scores consumer).
        "s_kmeans_fit", "s_ann_recall", "t_full_pipeline_e2e",
        "t_ngram_novelty", "d_label_communities", "d_kcore_peeling",
        "d_cdc_chunks", "d_containment_top_pairs", "d_cross_source_overlap",
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
