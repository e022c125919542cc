#!/usr/bin/env python
"""Empirical scaling probe: run the heavy corpus operators on the sf0.1
documents table and on a 10x synthetic blowup, and report the wall-time
ratio. Near-linear ratios (~10x work -> ~10x time, minus fixed per-job
cost) are the local-mode evidence that no operator hides a quadratic term;
a bucketing/skew bug shows up here as a 30-100x blowup long before it
burns a cluster.

Run: python tools/scale_probe.py          (writes nothing; prints a table)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from unravelsports_spark.cache import release_tracked  # noqa: E402
from unravelsports_spark.session import get_spark, read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BLOWUP = int(os.environ.get("SPARK_GRAFT_BLOWUP", "10"))


def timed(mk, runs: int = 2) -> float:
    mk().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    release_tracked()
    return best


def main() -> None:
    from unravelsports_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from unravelsports_spark.operators.importance import dsir_scores
    from unravelsports_spark.operators.nbayes import nb_confusion
    from unravelsports_spark.operators.pq import pq_adc_topk, pq_train_codebook
    from unravelsports_spark.operators.retrieval import bm25_scores
    from unravelsports_spark.operators.sharding import shard_manifest

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = read_table(spark, SF_DIR, "documents")
    n1 = base.count()

    # 10x blowup: copies get distinct ids and a copy tag appended to the
    # text so hashes/shingles differ (otherwise dedup collapses the corpus
    # and the probe measures nothing)
    big_dir = tempfile.mkdtemp() + "/documents_big"
    copies = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * (1 << 40))).withColumn(
            "text", F.concat(F.col("text"), F.lit(f" copytag{i}"))
        )
        for i in range(BLOWUP)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionAll(c)
    big.write.mode("overwrite").parquet(big_dir)
    big = spark.read.parquet(big_dir)
    n10 = big.count()
    print(f"corpus: {n1} docs -> {n10} docs ({BLOWUP}x)")

    # duplication-heavy twin: copies keep IDENTICAL text (only ids shift) —
    # the regime where exact dedup's map-side combine must collapse the
    # shuffle to ~n1 rows regardless of the duplication factor
    dup_dir = tempfile.mkdtemp() + "/documents_dup"
    dcopies = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * (1 << 40)))
        for i in range(BLOWUP)
    ]
    dup = dcopies[0]
    for c in dcopies[1:]:
        dup = dup.unionAll(c)
    dup.write.mode("overwrite").parquet(dup_dir)
    dup = spark.read.parquet(dup_dir)

    from unravelsports_spark.operators.dedup import (
        exact_dedup,
        incremental_dedup,
        norm_text,
    )

    probes = {
        "minhash+lsh_pairs": lambda d: lsh_candidate_pairs(
            minhash_signatures(doc_shingles(d))
        ),
        "exact_dedup(all-unique)": lambda d: exact_dedup(d),
        "incremental_dedup(vs ledger)": lambda d: incremental_dedup(
            d, seen=base.select(F.md5(norm_text()).alias("fingerprint"))
        ),
        "jaccard_pairs(df-capped)": lambda d: jaccard_pairs(doc_shingles(d)),
        "dsir_scores": lambda d: dsir_scores(d, target=F.col("lang") == "en"),
        "nb_confusion": lambda d: nb_confusion(d, label_col="lang"),
        "bm25_scores": lambda d: bm25_scores(
            d, ["join", "hash", "vector", "customer", "slow"]
        ),
        "shard_manifest": lambda d: shard_manifest(d, budget=4096),
        "bpe_train(5 merges)": lambda d: __import__(
            "unravelsports_spark.operators.bpe", fromlist=["bpe_train_merges"]
        ).bpe_train_merges(d, num_merges=5),
    }
    print(f"{'operator':28s} {'1x sec':>8s} {'10x sec':>8s} {'ratio':>6s}")
    for name, mk in probes.items():
        t_1 = timed(lambda: mk(base))
        t_10 = timed(lambda: mk(big))
        print(f"{name:28s} {t_1:8.3f} {t_10:8.3f} {t_10 / t_1:6.1f}")

    # dedup on the duplication-heavy corpus: 10x the rows, same distinct
    # texts — the map-side combine should hold the shuffle near 1x volume
    t_1 = timed(lambda: exact_dedup(base))
    t_10 = timed(lambda: exact_dedup(dup))
    print(f"{'exact_dedup(10x dup-heavy)':28s} {t_1:8.3f} {t_10:8.3f} {t_10 / t_1:6.1f}")

    # ANN family on an embeddings blowup (copies get jittered ids; vectors
    # reused — ANN cost is per-vector, independent of duplication)
    emb = read_table(spark, SF_DIR, "embeddings")
    ebig_dir = tempfile.mkdtemp() + "/embeddings_big"
    ecopies = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * (1 << 40)))
        for i in range(BLOWUP)
    ]
    ebig = ecopies[0]
    for c in ecopies[1:]:
        ebig = ebig.unionAll(c)
    ebig.write.mode("overwrite").parquet(ebig_dir)
    ebig = spark.read.parquet(ebig_dir)
    print(f"embeddings: {emb.count()} -> {ebig.count()} vectors")

    import math

    def pq_probe(d):
        cb = pq_train_codebook(d, m_subspaces=4, k=16, n_rounds=2)
        q = [
            int(math.floor(float(v) * (1 << 20)))
            for v in d.orderBy("vec_id").limit(1).first()["embedding"]
        ]
        return pq_adc_topk(d, cb, q, top=20)

    from unravelsports_spark.plans.corpus3 import semdedup_multitable_stats
    from unravelsports_spark.plans.pipeline import _emb  # noqa: F401

    def _as_e(d):
        return d.select(
            "vec_id", "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )

    for name, mk in {
        "pq_train+adc_topk": pq_probe,
        # bits scale with the corpus: +log2(10) ~ 4 bits per table at 10x
        # keeps expected bucket sizes constant (the sign-LSH operating rule)
        "semdedup_multitable": lambda d: semdedup_multitable_stats(
            _as_e(d),
            bits_per_table=(4 if d is emb else 7),
        ),
    }.items():
        t_1 = timed(lambda: mk(emb))
        t_10 = timed(lambda: mk(ebig))
        print(f"{name:28s} {t_1:8.3f} {t_10:8.3f} {t_10 / t_1:6.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
