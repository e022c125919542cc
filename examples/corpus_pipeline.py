"""End-to-end LLM training-data pipeline on the synthetic corpus: filter →
dedup → select → pack — the migration path for a user bringing a corpus
pipeline to this engine.

Run: python examples/corpus_pipeline.py  [SPARK_GRAFT_SF_DIR overrides the
default /root/testdata/sf0.001]. Every step is the same operator the
certified driver queries use.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark, sf_dir: str) -> dict:
    import pyspark.sql.functions as F

    from unravelsports_spark.operators.dedup import exact_dedup
    from unravelsports_spark.operators.importance import corpus_kl, dsir_select
    from unravelsports_spark.operators.sharding import shard_manifest
    from unravelsports_spark.operators.text import with_lang_id, with_quality
    from unravelsports_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. prep: exact dedup → quality gate → language gate
    kept = (
        with_lang_id(with_quality(exact_dedup(docs)))
        .filter((F.col("quality_score") >= 0.6) & (F.col("predicted_lang") == "en"))
    )
    n_kept = kept.count()

    # 1b. duplication audit: which sources mirror each other (exact
    # fingerprint overlap), and which docs are CONTAINED in others — the
    # asymmetric signal a symmetric Jaccard threshold misses
    from unravelsports_spark.operators.dedup import containment_pairs, doc_shingles, norm_text

    fps = docs.select("source", F.md5(norm_text()).alias("fp")).distinct()
    n_cross_source_fps = (
        fps.alias("a")
        .join(
            fps.alias("b"),
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")),
        )
        .count()
    )
    top_containment = [
        (r["id_src"], r["id_dst"], r["containment_ppm"])
        for r in containment_pairs(doc_shingles(docs), max_doc_freq=50)
        .orderBy(F.col("containment_ppm").desc(), "id_src", "id_dst")
        .limit(3)
        .collect()
    ]

    # 2. drift check: how far is the kept slice from the rest of the corpus?
    kl = corpus_kl(docs, target=F.col("lang") == "en").first()

    # 2b. semantic dedup on the embedding table (SemDeDup): sign-LSH bucket
    # candidates, within-bucket cosine verify — the same incremental
    # operator the streaming ingest wrapper chains batch-to-batch
    from unravelsports_spark.operators.similarity import incremental_semdedup

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    planes = [
        list(r["v"])
        for r in emb.filter(F.col("vec_id").between(1, 16)).orderBy("vec_id").collect()
    ]
    n_emb = emb.count()
    n_emb_kept = (
        incremental_semdedup(emb, planes)
        .filter("kept")
        .select("vec_id")
        .distinct()
        .count()
    )

    # 3. data selection: most-target-like 20% of the non-English pool
    selected = dsir_select(docs, target=F.col("lang") == "en", keep_frac=0.2)
    sel_rows = selected.collect()

    # 4. pack the kept docs into fixed-token-budget training shards
    manifest = shard_manifest(kept, budget=4096).orderBy("shard_id").collect()

    # 5. hybrid retrieval over the cleaned corpus: BM25 lexical top-k and
    # dense cosine top-k fused by reciprocal rank — the RAG first-stage
    # ranker, through the SAME rank_topk/rrf_fuse operators the certified
    # t_hybrid_rrf query runs (one formula, no drift)
    from unravelsports_spark.operators.retrieval import (
        bm25_scores,
        rank_topk,
        rrf_fuse,
    )
    from unravelsports_spark.operators.similarity import _cosine_vs_refs

    lexk = rank_topk(
        bm25_scores(docs, ["join", "hash", "vector"]),
        "bm25", "doc_id", depth=10, rank_name="r_lex",
    )
    qrow = emb.orderBy("vec_id").limit(1).select("vec_id", "v").first()
    densek = rank_topk(
        _cosine_vs_refs(emb, [(qrow["vec_id"], list(qrow["v"]))], ref_id_name="qid")
        .withColumnRenamed("vec_id", "doc_id"),
        "cosine", "doc_id", depth=10, rank_name="r_dense",
    )
    hybrid = [
        (r["doc_id"], r["rrf"])
        for r in rrf_fuse([lexk, densek], top=5).collect()
    ]

    out = {
        "raw_docs": n_raw,
        "kept_docs": n_kept,
        "cross_source_dup_fps": n_cross_source_fps,
        "top_containment": top_containment,
        "kl_micro_nats": (kl["kl_tr_micro"], kl["kl_rt_micro"]),
        "semdedup_vectors": (n_emb, n_emb_kept),
        "dsir_selected": {r["label"]: r["n_selected"] for r in sel_rows},
        "n_shards": len(manifest),
        "shard_tokens": [r["shard_tokens"] for r in manifest],
        "hybrid_top5": hybrid,
    }
    return out


if __name__ == "__main__":
    from unravelsports_spark.session import get_spark

    spark = get_spark("example-corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    result = main(spark, sf_dir)
    for k, v in result.items():
        print(f"{k}: {v}")
    spark.stop()
