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
# r05). The driver checks a bounded prefix of this dict, so enumerate
# never-certified queries first to widen certification breadth; no keys are
# renamed. Round-6 ROTATION (VERDICT r5 #1): the ~30 queries whose latest
# green dated to rounds 1-2 are deliberately NOT listed — they re-certify on
# current code this round even though nothing in their plans changed — along
# with every query whose plan or shared operator changed in round 6: the
# langid-rewrite users (t_corpus_prep_e2e, t_prep_to_shards_e2e,
# t_filter_funnel, t_langid_confusion), the SemDeDup fused-kernel family
# (d_semdedup_multitable, d_semdedup_recall, d_embedding_neardup), the
# short-doc-fallback MinHash join (d_mllib_minhash_join), and the two new
# queries (s_ann_recall, m_graph_custom_cells).
_CERTIFIED = frozenset(
    {
        # r5 green (CORRECTNESS_r05.json), unchanged in r6
        "q1_pricing_summary", "d_jaccard_top_pairs", "w6_savgol_oracle",
        "t_repetition_stats", "t_sequence_packing", "a15_hll_sketch_union",
        "w9_interpolate_gaps", "t_bigram_logprob", "t_bpe_merges",
        "t_bpe_tokenized_stats", "m_efpi_cells", "m_savgol_cells",
        "t_dsir_scores", "t_dsir_resample", "t_nb_confusion", "s_ann_pq",
        "s_ann_ivfpq_residual", "s_ann_ivfpq", "t_shard_manifest",
        "s_kmeans_fit", "d_incremental_dedup",
        "p1_p2_project_filter", "f7_f8_conditional_literals",
        "p3_filter_eq", "p4_range_between", "p5_modulo_sample", "p6_conditional_cap",
        "p7_sign_flip", "p8_bool_derive", "j1_dim_join", "j2_agg_back_join",
        "j3_semi_join", "j4_anti_join", "j5_enrich_revenue", "j7_distinct_join",
        "a2_distinct_count", "a3_group_stats", "a4_argmin_in_group",
        # r4 green (CORRECTNESS_r04.json)
        "s_ann_mllib_brp",
        "a9_approx_distinct", "f12_array_agg_sorted", "a16_profile",
        "w10_moving_avg", "o15_morton_key", "j10_full_outer",
        "st_session_window_native", "f14_variant_json", "f15_sql_text",
        "t_bm25_topk", "t_unigram_logprob",
        "d_countmin_heavyhitters", "d_dup_spans",
        "t_mixture_temperature",
        "d_cluster_keep_best", "d_semdedup_lsh",
        "d_pagerank", "m_pi_cells", "m_graph_cells", "m_delaunay_cells",
        "m_af_cells", "t_corpus_kl",
        "d_bloom_decontamination",
        "d_semantic_contamination",
        # r3 green (CORRECTNESS_r03.json). Three of the oldest r3 entries
        # (s_ann_lsh, s_ann_ivf, j8_asof_join) also rotate this round —
        # sized so priority-0 + rows-only exactly fills the 50-slot driver
        # window alongside the new t_full_pipeline_e2e.
        "f9_json_extract", "o12_row_synthesis",
        "mm_decode_stats", "mm_decode_real", "st_sliding_window",
        "st_session_window", "j6_label_join", "t_bpe_token_stats", "t_pii_scrub",
        "t_url_domains", "d_contamination", "j8f_asof_forward",
        "mm_audio_real", "k_salted_agg", "j9_interval_join", "t_tfidf_terms",
        "t_vocab_top100", "t_domain_mixture", "a10_quantiles", "s_kmeans_assign",
        "t_sentences", "t_chunking", "mm_video_real", "d_pair_degrees",
        "w11_scd2_intervals", "a17_sortedness", "a18_outliers", "mm_gif_real",
        "d_triangle_count", "t_bigram_pmi",
        "d_minhash_accuracy", "o13_reservoir_sample", "a11_histogram",
        "a12_corr_exact", "a13_rollup", "o14_pivot", "w8_rank_distributions",
        "d_edit_distance", "a14_cube", "f11_string_agg", "f13_bitwise_agg",
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
