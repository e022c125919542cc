"""Dataset RELEASE pipeline on the synthetic corpus: leakage-safe splits →
privacy gates → calibrated export — the migration path for a team shipping
a training-data release (the complement of examples/corpus_pipeline.py,
which builds the corpus; this one gates and packages it).

Run: python examples/release_pipeline.py  [SPARK_GRAFT_SF_DIR overrides
the default /root/testdata/sf0.001]. Every step is the same operator the
certified driver queries use (or their r11-queued twins).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark, sf_dir: str) -> dict:
    import pyspark.sql.functions as F

    from unravelsports_spark.cache import release_tracked, tracked_persist
    from unravelsports_spark.operators.htmltext import extract_html_text
    from unravelsports_spark.operators.textnorm import normalize_text
    from unravelsports_spark.session import read_table

    crawl = read_table(spark, sf_dir, "documents")

    # -1. Markup extraction FIRST (r12; the crawl-ingest step every web
    # corpus runs before anything text-level): strip script/style/comment
    # blocks and tags, decode the pinned entity set. A pure projection —
    # it fuses into the scan. On this synthetic (markup-free) corpus the
    # stage is an exact no-op, pinned below the same way the textnorm
    # stage pins n_normalized == 0 on clean ASCII.
    raw_docs = extract_html_text(crawl, text_col="text", out_col="demarked")
    raw_docs = raw_docs.select(
        "doc_id",
        "source",
        (F.col("demarked") != F.col("text")).alias("_markup_changed"),
        F.col("demarked").alias("text"),
    )

    # 0. Unicode canonicalization BEFORE any fingerprinting (r11): a
    # decomposed accent or a zero-width insertion would otherwise defeat
    # every dedup key downstream — the splits would treat unicode variants
    # of one document as unrelated and could leak one into eval.
    # normalize_text carries text and norm_text side by side, so the
    # changed-row count needs no join (r11 review finding #3); the
    # normalized frame is persisted once — shingling, the privacy join
    # and the export all consume it below.
    normed = tracked_persist(normalize_text(raw_docs, form="NFKC"))
    try:
        return _gated_release(spark, sf_dir, normed)
    finally:
        # r11 review pass 2 #3: release on EVERY path — an exception
        # mid-pipeline must not leave the persisted corpus-sized frame
        # cached in a shared session
        release_tracked()


def _gated_release(spark, sf_dir: str, normed) -> dict:
    import pyspark.sql.functions as F

    from unravelsports_spark.operators.corpus_splits import (
        cluster_safe_split,
        split_audit,
    )
    from unravelsports_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from unravelsports_spark.operators.embstats import Q, embedding_dim_stats
    from unravelsports_spark.operators.filtering import k_anonymity_report
    from unravelsports_spark.operators.privacy import l_diversity_report
    from unravelsports_spark.session import read_table
    from unravelsports_spark.sources.jsonl import (
        quarantine_counts,
        read_jsonl,
        write_jsonl,
    )

    # both gate counters in ONE pass over the persisted frame (r12 review
    # pass 1 #4: two .count() jobs where one agg does)
    n_markup_changed, n_normalized = normed.agg(
        F.coalesce(F.sum(F.col("_markup_changed").cast("long")), F.lit(0)),
        F.coalesce(
            F.sum((F.col("norm_text") != F.col("text")).cast("long")), F.lit(0)
        ),
    ).first()
    docs = normed.select("doc_id", "source", F.col("norm_text").alias("text"))

    # 1. leakage-safe splits: train/val/test keyed on the near-dup CLUSTER
    # (an eval doc can never have a near-duplicate in train, by
    # construction — not by audit)
    sigs = minhash_signatures(doc_shingles(docs, distinct=False), num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    assigned = cluster_safe_split(docs.select("doc_id", "source"), pairs)
    audit = {
        r["split"]: (r["n_docs"], r["n_clusters"], r["n_straddling"])
        for r in split_audit(assigned).collect()
    }

    # 2. privacy gates on the metadata that ships WITH the release: class
    # sizes (k-anonymity) and sensitive-value diversity (l-diversity) over
    # the (source, split) quasi-identifiers
    meta = assigned.join(docs.select("doc_id", "text"), "doc_id").withColumn(
        "len_bucket", (F.length("text") / 128).cast("int")
    )
    kanon = k_anonymity_report(meta, ["source", "split"], k=5)
    at_risk_rows = (
        kanon.where("at_risk").agg(F.coalesce(F.sum("n_rows"), F.lit(0))).first()[0]
    )
    ldiv = l_diversity_report(meta, ["source", "split"], "len_bucket", l=2)
    homogeneous_rows = (
        ldiv.where("at_risk").agg(F.coalesce(F.sum("n_rows"), F.lit(0))).first()[0]
    )

    # 3. export: the train split ships as sharded JSONL; the ingest-health
    # check must come back clean. The export dir is cleaned in the finally
    # below (repeated runs must not accumulate full train-split copies).
    tmp_root = tempfile.mkdtemp()
    out_dir = os.path.join(tmp_root, "release_train_jsonl")
    try:
        # export the SAME joined view the privacy gates audited (a second
        # hand-declared join could silently diverge from it)
        train = meta.where(F.col("split") == "train")
        write_jsonl(train.select("doc_id", "source", "text"), out_dir)
        qc = quarantine_counts(read_jsonl(spark, out_dir)).first()
    finally:
        import shutil

        shutil.rmtree(tmp_root, ignore_errors=True)

    # 4. ANN-index calibration for the release's embedding table: exact
    # per-dimension ranges on the PQ grid (what the quantizers consume)
    emb = read_table(spark, sf_dir, "embeddings")
    dim_stats = embedding_dim_stats(emb).collect()
    max_abs = max(max(abs(r["min_q"]), abs(r["max_q"])) for r in dim_stats) / Q

    return {
        "n_markup_changed": int(n_markup_changed),
        "n_normalized": int(n_normalized),
        "splits": audit,
        "k_anon_at_risk_rows": int(at_risk_rows),
        "l_div_homogeneous_rows": int(homogeneous_rows),
        "exported_clean": int(qc["n_clean"]),
        "exported_quarantined": int(qc["n_quarantined"]),
        "n_dims": len(dim_stats),
        "max_abs_component": float(max_abs),
    }


if __name__ == "__main__":
    from unravelsports_spark.session import get_spark

    out = main(
        get_spark(),
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    print(out)
