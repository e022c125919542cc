"""Round-4 corpus queries — the stretch between "filtered corpus" and
"training run" in a production LLM data pipeline: DSIR importance scoring,
selection, and drift monitoring; a hashed-feature Naive Bayes filter
trained and scored in Catalyst; token-budget shard manifests (plus the
dedup→quality→langid→shards composition); Bloom-prefiltered
decontamination; and the compressed ANN ladder (PQ → IVF-PQ → residual
IVF-PQ).

All follow the established engine-parity discipline: md5-derived hashes
(bit-identical across engines), log terms as integer micro-nats and
embeddings quantized to a 2^-20 integer grid so every sum/distance is exact
int64 arithmetic, deterministic tie-breaks everywhere. The oracles are the
naive single-node formulations (including CTE-unrolled Lloyd rounds); the
Spark plans are the scale-out decompositions (single tokenize pass +
broadcast model tables; two-level prefix sum instead of a one-reducer
global window; literal-codebook projections instead of joins) —
algebraically identical, hash-verified by the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.bloom import bloom_contaminated_docs
from ..operators.pq import (
    Q,
    pq_adc_topk,
    pq_ivf_adc_topk,
    pq_ivf_residual_adc_topk,
    pq_train_codebook,
    pq_train_residual_codebook,
)
from ..operators.importance import (
    corpus_kl,
    corpus_kl_sql,
    dsir_scores,
    dsir_select,
    dsir_select_sql,
    dsir_sql,
)
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


@query("t_corpus_kl", oracle=corpus_kl_sql("lang = 'en'", 1024))
def t_corpus_kl(spark, sf_dir):
    """Corpus-drift monitor: symmetric smoothed KL divergence between the
    English slice's and the rest's hashed-unigram distributions, in exact
    integer micro-nats (per-bucket terms rounded before the sum). The
    aggregate twin of DSIR scoring — one tokenize pass, a ≤1024-row stats
    table, one output row."""
    docs = read_table(spark, sf_dir, "documents")
    return corpus_kl(docs, target=F.col("lang") == "en", n_buckets=1024)


@query(
    "t_dsir_resample",
    oracle=dsir_select_sql("lang = 'en'", keep_frac=0.2) + " ORDER BY 1",
)
def t_dsir_resample(spark, sf_dir):
    """DSIR selection step: keep the most-English-like ~20% of the
    non-English pool via a histogram threshold (no global sort — the
    corpus-scale shape of top-p%) and account per language for what was
    kept. Completes the DSIR recipe: score → threshold → resample."""
    docs = read_table(spark, sf_dir, "documents")
    return dsir_select(
        docs, target=F.col("lang") == "en", keep_frac=0.2, label_col="lang"
    ).orderBy("label")


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


def _assign_sql(dims: str, cb: str, out: str) -> str:
    """Lloyd assignment CTE: nearest centroid per (vector, subspace), ties
    to the lowest cluster id — mirrors Spark's array_min over (d, c) structs."""
    return f"""
    {out} AS (
      SELECT vec_id, m, cluster FROM (
        SELECT d.vec_id, d.m, c.cluster,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id, d.m
                                  ORDER BY SUM((d.v - c.c) * (d.v - c.c)), c.cluster) AS rk
        FROM {dims} d JOIN {cb} c ON d.m = c.m AND d.d = c.d
        GROUP BY d.vec_id, d.m, c.cluster) WHERE rk = 1)"""


def _update_sql(dims: str, prev_cb: str, a: str, out: str) -> str:
    """Lloyd update CTE: floor-mean per (subspace, cluster, dim); empty
    clusters carry the previous centroid (COALESCE)."""
    return f"""
    {out} AS (
      SELECT c0.m, c0.cluster, c0.d, COALESCE(u.c_new, c0.c) AS c
      FROM {prev_cb} c0 LEFT JOIN (
        SELECT a.m, a.cluster, d.d,
               CAST(FLOOR(SUM(d.v) / COUNT(*)) AS BIGINT) AS c_new
        FROM {a} a JOIN {dims} d ON a.vec_id = d.vec_id AND a.m = d.m
        GROUP BY a.m, a.cluster, d.d) u
      ON c0.m = u.m AND c0.cluster = u.cluster AND c0.d = u.d)"""


def _lloyd_rounds_sql(dims: str, cb0: str, n_rounds: int, prefix: str) -> tuple[str, str]:
    """Chain n assignment/update CTE pairs; returns (sql, final cb name)."""
    rounds = []
    cb = cb0
    for r in range(1, n_rounds + 1):
        rounds.append(_assign_sql(dims, cb, f"{prefix}a{r}"))
        rounds.append(_update_sql(dims, cb, f"{prefix}a{r}", f"{prefix}cb{r}"))
        cb = f"{prefix}cb{r}"
    return ",".join(rounds), cb


def _pq_sql(m_sub: int = 4, k: int = 16, n_rounds: int = 2, sub_dim: int = 16, top: int = 20) -> str:
    """DuckDB oracle for s_ann_pq: unrolls the identical integer Lloyd
    rounds as CTEs (per-dim row formulation — algebraically the same exact
    int64 math as the Spark array-fold projections)."""

    def assign(cb: str, out: str) -> str:
        return _assign_sql("dims", cb, out)

    rounds_sql, cb = _lloyd_rounds_sql("dims", "cb0", n_rounds, "")
    code_cols = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN cluster END) AS code{m}" for m in range(m_sub)
    )
    return f"""
    WITH iq AS (
      SELECT vec_id, u.i - 1 AS pos,
             CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * {float(Q)!r}) AS BIGINT) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
    dims AS (SELECT vec_id, pos // {sub_dim} AS m, pos % {sub_dim} AS d, v FROM iq),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, vec_id
      FROM (SELECT DISTINCT vec_id FROM iq ORDER BY vec_id LIMIT {k})),
    cb0 AS (
      SELECT d.m, s.cluster, d.d, d.v AS c FROM seeds s JOIN dims d USING (vec_id)),
    {rounds_sql},
    {assign(cb, "codes").strip().rstrip()},
    q AS (SELECT m, d, v FROM dims WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    lut AS (
      SELECT c.m, c.cluster, SUM((q.v - c.c) * (q.v - c.c)) AS qd
      FROM {cb} c JOIN q ON c.m = q.m AND c.d = q.d
      GROUP BY c.m, c.cluster),
    pivoted AS (
      SELECT vec_id, {code_cols}
      FROM codes GROUP BY vec_id),
    adc AS (
      SELECT codes.vec_id, CAST(SUM(lut.qd) AS BIGINT) AS adc_dist
      FROM codes JOIN lut ON codes.m = lut.m AND codes.cluster = lut.cluster
      GROUP BY codes.vec_id)
    SELECT p.vec_id, {", ".join(f"CAST(p.code{m} AS BIGINT) AS code{m}" for m in range(m_sub))},
           a.adc_dist
    FROM pivoted p JOIN adc a USING (vec_id)
    ORDER BY a.adc_dist, p.vec_id
    LIMIT {top}
    """


@query("s_ann_pq", oracle=_pq_sql())
def s_ann_pq(spark, sf_dir):
    """Product-quantization ANN (operators/pq.py): exact-integer Lloyd
    codebook (M=4 subspaces × 16 centroids, 2 rounds, smallest-id seeds),
    byte-code encoding, and asymmetric-distance top-20 vs the min-id query
    vector. The whole pipeline is hash-certified against a DuckDB CTE unroll
    of the identical int64 math."""
    emb = read_table(spark, sf_dir, "embeddings")
    codebook = pq_train_codebook(emb, m_subspaces=4, k=16, n_rounds=2)
    qrow = emb.orderBy("vec_id").limit(1).select("embedding").first()[0]
    import math

    query_int = [int(math.floor(float(v) * Q)) for v in qrow]
    return pq_adc_topk(emb, codebook, query_int, top=20)


def _ivfpq_sql(
    kc: int = 8,
    nc_rounds: int = 1,
    m_sub: int = 4,
    k: int = 16,
    n_rounds: int = 2,
    sub_dim: int = 16,
    n_probe: int = 2,
    top: int = 10,
) -> str:
    """DuckDB oracle for s_ann_ivfpq: coarse Lloyd (1 subspace over the full
    vector) for cell assignment + probe selection, then the PQ rounds, then
    ADC over candidates in the probed cells only."""
    coarse_rounds, ccb = _lloyd_rounds_sql("cdims", "ccb0", nc_rounds, "c")
    pq_rounds, cb = _lloyd_rounds_sql("dims", "cb0", n_rounds, "")
    return f"""
    WITH iq AS (
      SELECT vec_id, u.i - 1 AS pos,
             CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * {float(Q)!r}) AS BIGINT) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
    dims AS (SELECT vec_id, pos // {sub_dim} AS m, pos % {sub_dim} AS d, v FROM iq),
    cdims AS (SELECT vec_id, 0 AS m, pos AS d, v FROM iq),
    cseeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, vec_id
      FROM (SELECT DISTINCT vec_id FROM iq ORDER BY vec_id LIMIT {kc})),
    ccb0 AS (
      SELECT d.m, s.cluster, d.d, d.v AS c FROM cseeds s JOIN cdims d USING (vec_id)),
    {coarse_rounds},
    {_assign_sql("cdims", ccb, "cells").strip()},
    q AS (SELECT m, d, v FROM cdims WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    probes AS (
      SELECT cluster AS cell FROM (
        SELECT c.cluster,
               ROW_NUMBER() OVER (ORDER BY SUM((q.v - c.c) * (q.v - c.c)), c.cluster) AS rk
        FROM {ccb} c JOIN q ON c.d = q.d
        GROUP BY c.cluster) WHERE rk <= {n_probe}),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, vec_id
      FROM (SELECT DISTINCT vec_id FROM iq ORDER BY vec_id LIMIT {k})),
    cb0 AS (
      SELECT d.m, s.cluster, d.d, d.v AS c FROM seeds s JOIN dims d USING (vec_id)),
    {pq_rounds},
    {_assign_sql("dims", cb, "codes").strip()},
    pqq AS (SELECT m, d, v FROM dims WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    lut AS (
      SELECT c.m, c.cluster, SUM((pqq.v - c.c) * (pqq.v - c.c)) AS qd
      FROM {cb} c JOIN pqq ON c.m = pqq.m AND c.d = pqq.d
      GROUP BY c.m, c.cluster),
    adc AS (
      SELECT codes.vec_id, CAST(SUM(lut.qd) AS BIGINT) AS adc_dist
      FROM codes JOIN lut ON codes.m = lut.m AND codes.cluster = lut.cluster
      WHERE codes.vec_id IN (
        SELECT vec_id FROM cells WHERE cluster IN (SELECT cell FROM probes))
      GROUP BY codes.vec_id)
    SELECT a.vec_id, CAST(cl.cluster AS BIGINT) AS cell, a.adc_dist
    FROM adc a JOIN cells cl ON a.vec_id = cl.vec_id
    ORDER BY a.adc_dist, a.vec_id
    LIMIT {top}
    """


def _ivfpq_residual_sql(
    kc: int = 8,
    nc_rounds: int = 1,
    m_sub: int = 4,
    k: int = 16,
    n_rounds: int = 2,
    sub_dim: int = 16,
    n_probe: int = 2,
    top: int = 10,
) -> str:
    """DuckDB oracle for s_ann_ivfpq_residual: the FAISS IVFPQ recipe —
    PQ codebook trained on coarse-cell residuals; ADC uses the query's
    per-cell residual."""
    coarse_rounds, ccb = _lloyd_rounds_sql("cdims", "ccb0", nc_rounds, "c")
    pq_rounds, rcb = _lloyd_rounds_sql("rdims", "rcb0", n_rounds, "r")
    return f"""
    WITH iq AS (
      SELECT vec_id, u.i - 1 AS pos,
             CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * {float(Q)!r}) AS BIGINT) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
    dims AS (SELECT vec_id, pos // {sub_dim} AS m, pos % {sub_dim} AS d, v FROM iq),
    cdims AS (SELECT vec_id, 0 AS m, pos AS d, v FROM iq),
    cseeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, vec_id
      FROM (SELECT DISTINCT vec_id FROM iq ORDER BY vec_id LIMIT {kc})),
    ccb0 AS (
      SELECT d.m, s.cluster, d.d, d.v AS c FROM cseeds s JOIN cdims d USING (vec_id)),
    {coarse_rounds},
    {_assign_sql("cdims", ccb, "cells").strip()},
    q AS (SELECT m, d, v FROM cdims WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
    probes AS (
      SELECT cluster AS cell FROM (
        SELECT c.cluster,
               ROW_NUMBER() OVER (ORDER BY SUM((q.v - c.c) * (q.v - c.c)), c.cluster) AS rk
        FROM {ccb} c JOIN q ON c.d = q.d
        GROUP BY c.cluster) WHERE rk <= {n_probe}),
    rdims AS (
      SELECT d.vec_id, d.m, d.d, d.v - cc.c AS v
      FROM dims d
      JOIN cells cl ON d.vec_id = cl.vec_id
      JOIN {ccb} cc ON cc.cluster = cl.cluster AND cc.d = d.m * {sub_dim} + d.d),
    rseeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, vec_id
      FROM (SELECT DISTINCT vec_id FROM rdims ORDER BY vec_id LIMIT {k})),
    rcb0 AS (
      SELECT d.m, s.cluster, d.d, d.v AS c FROM rseeds s JOIN rdims d USING (vec_id)),
    {pq_rounds},
    {_assign_sql("rdims", rcb, "rcodes").strip()},
    qres AS (
      SELECT cc.cluster AS cell, q.d // {sub_dim} AS m, q.d % {sub_dim} AS d,
             q.v - cc.c AS v
      FROM q JOIN {ccb} cc ON cc.d = q.d),
    lut AS (
      SELECT qr.cell, c.m, c.cluster, SUM((qr.v - c.c) * (qr.v - c.c)) AS qd
      FROM {rcb} c JOIN qres qr ON qr.m = c.m AND qr.d = c.d
      GROUP BY 1, 2, 3),
    adc AS (
      SELECT rc.vec_id, CAST(cl.cluster AS BIGINT) AS cell,
             CAST(SUM(l.qd) AS BIGINT) AS adc_dist
      FROM rcodes rc
      JOIN cells cl ON rc.vec_id = cl.vec_id
      JOIN lut l ON l.cell = cl.cluster AND l.m = rc.m AND l.cluster = rc.cluster
      WHERE cl.cluster IN (SELECT cell FROM probes)
      GROUP BY 1, 2)
    SELECT vec_id, cell, adc_dist FROM adc
    ORDER BY adc_dist, vec_id
    LIMIT {top}
    """


@query("s_ann_ivfpq_residual", oracle=_ivfpq_residual_sql())
def s_ann_ivfpq_residual(spark, sf_dir):
    """Residual IVF-PQ (the exact FAISS IVFPQ recipe): PQ codebook trained
    on coarse-cell residuals, per-cell query-residual ADC tables, probe
    pruning. All int64-exact; hash-certified vs a CTE unroll of both
    codebooks over the residual table."""
    emb = read_table(spark, sf_dir, "embeddings")
    coarse = pq_train_codebook(emb, m_subspaces=1, k=8, n_rounds=1)
    rcb = pq_train_residual_codebook(emb, coarse, m_subspaces=4, k=16, n_rounds=2)
    qrow = emb.orderBy("vec_id").limit(1).select("embedding").first()[0]
    import math

    query_int = [int(math.floor(float(v) * Q)) for v in qrow]
    return pq_ivf_residual_adc_topk(emb, coarse, rcb, query_int, n_probe=2, top=10)


@query("s_ann_ivfpq", oracle=_ivfpq_sql())
def s_ann_ivfpq(spark, sf_dir):
    """IVF-PQ ANN (operators/pq.py:pq_ivf_adc_topk): 8 coarse cells prune
    the corpus to 2 probed inverted lists, PQ ADC ranks only those
    candidates — the FAISS-style layout where, with a cell-partitioned
    parquet layout, the probe filter becomes partition pruning. Exact int64
    end-to-end; hash-certified vs a CTE unroll of both codebooks."""
    emb = read_table(spark, sf_dir, "embeddings")
    coarse = pq_train_codebook(emb, m_subspaces=1, k=8, n_rounds=1)
    codebook = pq_train_codebook(emb, m_subspaces=4, k=16, n_rounds=2)
    qrow = emb.orderBy("vec_id").limit(1).select("embedding").first()[0]
    import math

    query_int = [int(math.floor(float(v) * Q)) for v in qrow]
    return pq_ivf_adc_topk(emb, coarse, codebook, query_int, n_probe=2, top=10)


def _prep_to_shards_sql() -> str:
    from .corpus3 import _prep_kept_ctes

    return shard_manifest_sql(SHARD_BUDGET, table="kept", extra_ctes=_prep_kept_ctes())


@query("t_prep_to_shards_e2e", oracle=_prep_to_shards_sql())
def t_prep_to_shards_e2e(spark, sf_dir):
    """The full pretraining-data path as ONE certified query: exact dedup →
    quality gate → language gate → deterministic token-budget shard
    manifest. Composition of t_corpus_prep_e2e's filter chain (one window +
    projections, no joins) with the two-level prefix-sum packer — what a
    user runs to turn a raw document dump into loader-ready shard
    accounting."""
    from ..operators.dedup import exact_dedup
    from ..operators.text import with_lang_id, with_quality

    d = with_lang_id(with_quality(exact_dedup(read_table(spark, sf_dir, "documents"))))
    kept = d.filter(
        (F.col("quality_score") >= 0.6) & (F.col("predicted_lang") == "en")
    )
    return shard_manifest(kept, budget=SHARD_BUDGET, n_ranges=64)


@query("t_shard_manifest", oracle=shard_manifest_sql(SHARD_BUDGET))
def t_shard_manifest(spark, sf_dir):
    """Token-budget training-shard manifest over the deterministically
    shuffled corpus (md5 order): shard_id → (n_docs, shard_tokens).

    The Spark plan is a two-level distributed prefix sum (64 fixed-boundary
    ranges, P-row offset broadcast) — no single-reducer global window; the
    oracle is the naive global cumsum, algebraically identical."""
    docs = read_table(spark, sf_dir, "documents")
    return shard_manifest(docs, budget=SHARD_BUDGET, n_ranges=64)
