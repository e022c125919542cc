"""Round-4 corpus queries: DSIR importance scoring, hashed-feature Naive
Bayes train/score, and token-budget shard manifests — the data-selection /
classifier-filter / shard-packing trio that sits between "filtered corpus"
and "training run" in a production LLM data pipeline.

All three follow the established engine-parity discipline: md5-derived
hashes (bit-identical across engines), log terms as integer micro-nats so
every per-document sum is exact BIGINT arithmetic, deterministic tie-breaks.
The oracles are the naive single-node formulations; the Spark plans are the
scale-out decompositions (single tokenize pass + broadcast model tables;
two-level prefix sum instead of a one-reducer global window) — algebraically
identical, hash-verified by the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.bloom import bloom_contaminated_docs
from ..operators.importance import dsir_scores, dsir_sql
from ..operators.nbayes import nb_confusion, nb_confusion_sql
from ..operators.sharding import shard_manifest, shard_manifest_sql
from ..session import read_table
from .relational import ORACLE_SQL, query

SHARD_BUDGET = 4_096  # tokens per training shard (whole-doc greedy packing)


@query(
    "t_dsir_scores",
    oracle=f"""
    WITH scores AS ({dsir_sql("lang = 'en'", n_buckets=1024)})
    SELECT doc_id, n_tokens, score_micro
    FROM scores
    ORDER BY score_micro DESC, doc_id
    LIMIT 50
    """,
)
def t_dsir_scores(spark, sf_dir):
    """DSIR importance scores (target = English slice): top-50 most
    target-like documents by hashed-unigram log-likelihood ratio.

    Beyond-reference LLM-pipeline operator (the reference engine has no text
    stack); recipe follows Xie et al. 2023 (DSIR). One corpus pass, ≤1024-row
    broadcast model, exact integer micro-nat scores."""
    docs = read_table(spark, sf_dir, "documents")
    out = dsir_scores(docs, target=F.col("lang") == "en", n_buckets=1024)
    return out.orderBy(F.desc("score_micro"), "doc_id").limit(50)


@query("t_nb_confusion", oracle=nb_confusion_sql("lang", 1024) + " ORDER BY 1, 2")
def t_nb_confusion(spark, sf_dir):
    """Hashing-trick multinomial Naive Bayes trained on even doc_ids,
    scored on odd doc_ids: the fastText-style classifier filter (CCNet /
    RefinedWeb pattern) evaluated as an exact confusion matrix.

    Train AND inference are pure Catalyst — the model is a ≤(classes×1024)-row
    broadcast grid of integer micro-nat log-probabilities; no Python in
    either phase."""
    docs = read_table(spark, sf_dir, "documents")
    return nb_confusion(docs, label_col="lang", n_buckets=1024).orderBy(
        "actual", "predicted"
    )


@query("d_bloom_decontamination", oracle=ORACLE_SQL["d_contamination"])
def d_bloom_decontamination(spark, sf_dir):
    """The 100 TB decontamination plan: a broadcast relational Bloom bitmap
    prunes corpus shingles before the exact benchmark join (operators/
    bloom.py). Lossless for every (m_bits, k) — this query deliberately
    shares d_contamination's oracle verbatim, so the driver hash-match
    certifies that the Bloom pre-filter changes the plan, not the answer."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    flagged = bloom_contaminated_docs(corpus, bench, n=5, m_bits=1 << 20, k=5)
    return (
        flagged.join(docs.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_contaminated"))
    )


@query("t_shard_manifest", oracle=shard_manifest_sql(SHARD_BUDGET))
def t_shard_manifest(spark, sf_dir):
    """Token-budget training-shard manifest over the deterministically
    shuffled corpus (md5 order): shard_id → (n_docs, shard_tokens).

    The Spark plan is a two-level distributed prefix sum (64 fixed-boundary
    ranges, P-row offset broadcast) — no single-reducer global window; the
    oracle is the naive global cumsum, algebraically identical."""
    docs = read_table(spark, sf_dir, "documents")
    return shard_manifest(docs, budget=SHARD_BUDGET, n_ranges=64)
