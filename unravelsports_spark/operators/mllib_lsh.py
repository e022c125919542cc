"""MLlib-backed LSH variants of the similarity/dedup operators.

The hand-rolled operators (similarity.py, dedup.py) are oracle-checkable
because every hash is expressible in SQL; these MLlib paths trade that for
the battle-tested distributed implementations Spark ships:

- `brp_ann_topk`: BucketedRandomProjectionLSH (Euclidean) approximate
  nearest neighbors — multi-probe over numHashTables sign buckets.
- `minhash_similarity_join`: HashingTF token sets → MinHashLSH
  approxSimilarityJoin on Jaccard distance — the all-pairs-free
  near-duplicate join at corpus scale.

Both are seeded and deterministic, so the driver's rows-only check is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist


def _dense_vec_col(col: str):
    from pyspark.ml.functions import array_to_vector

    return array_to_vector(F.transform(col, lambda x: x.cast("double")))


def brp_ann_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    feats = df.select(id_col, _dense_vec_col(emb_col).alias("features"))
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=seed,
    ).fit(feats)
    q = Vectors.dense([float(v) for v in query_vec])
    return (
        model.approxNearestNeighbors(feats, q, k)
        .select(id_col, F.round("distCol", 6).alias("distance"))
    )


def minhash_similarity_join(
    df: DataFrame,
    max_jaccard_distance: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 16,
    num_tables: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHashLSH approxSimilarityJoin over word ``shingle_n``-gram SETS.

    Shingles, not unigram tokens, are the load-bearing choice: arbitrary
    documents share most of a language's common words, so unigram Jaccard
    between unrelated documents is far from 0 and the minhash collision
    probability (= the Jaccard similarity) barely prunes — measured at
    sf0.1 the unigram form produced a near-quadratic candidate set and
    525 s of exact re-checks; the 3-gram form is sub-second. n-grams make
    unrelated documents near-disjoint, which is what gives LSH its
    sub-quadratic candidate bound at corpus scale.

    NON-EMPTY documents shorter than ``shingle_n`` tokens fall back to
    their single whole-document gram (the joined token string) instead of
    an empty gram set — otherwise the non-empty filter below would silently
    exclude 1-2 token docs from the near-dup join entirely (ADVICE r5).
    Two such docs are near-dups only when identical, which is what a
    single-element set under Jaccard expresses. Empty/whitespace-only
    documents get an EMPTY gram set and are excluded by the filter: the
    unconditional fallback gave every contentless doc the identical ''
    gram, making all of them mutual Jaccard-1.0 candidates — a quadratic
    candidate blowup among empty docs at crawl scale (ADVICE r6)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from ..session import widen_narrow_scan

    # the gram transform + HashingTF + minhash UDF chain is CPU-bound per
    # row; a single-split scan would serialize it on one task (no-op on a
    # wide cluster scan)
    df = widen_narrow_scan(df)

    t = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    idx = F.when(
        F.size(t) >= shingle_n, F.sequence(F.lit(0), F.size(t) - shingle_n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, shingle_n)))
    # emptiness is a property of the DOCUMENT, not the fallback branch:
    # guard it outermost so shingle_n=1 (where split('') = [''] satisfies
    # size >= shingle_n and would take the main branch with the '' gram)
    # cannot re-admit contentless docs
    grams = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(
        F.when(F.size(t) >= shingle_n, grams).otherwise(
            F.array(F.concat_ws(" ", t))
        )
    )
    toks = df.select(id_col, grams.alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(toks).filter(F.size("tokens") > 0)
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=seed).fit(feats)
    # transform ONCE and persist: approxSimilarityJoin re-runs the minhash
    # UDF over each input that lacks the hashes column — for a self-join
    # that's the corpus hashed twice more on top of fit; passing the
    # pre-transformed frame makes it hash the corpus exactly once
    hashed = tracked_persist(model.transform(feats))
    joined = model.approxSimilarityJoin(hashed, hashed, max_jaccard_distance, distCol="jaccard_dist")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )
