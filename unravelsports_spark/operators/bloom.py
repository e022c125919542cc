"""Bloom-filter pre-filtered decontamination: the 100 TB path for screening
a corpus against a benchmark n-gram set that is too large to broadcast as a
hash-join table.

``operators/filtering.py:contaminated_docs`` broadcasts the benchmark's
distinct shingle hashes — right whenever that set fits an executor (the
certified ``d_contamination`` path). When the benchmark grows to billions of
n-grams, the hash set is hundreds of GB but a Bloom filter at ~10 bits/key is
~10 GB-as-bits — and here the filter is stored as a relational bitmap
(``word_idx → word_bits``: ``m/32`` rows of packed 32-bit words), which
broadcasts at any realistic ``m`` and is itself built by one
map-side-combinable ``bit_or`` aggregation. Membership testing, candidate
pruning, and the exact confirmation join are all pure Catalyst:

1. each shingle hash expands to ``k`` probe positions via double hashing
   ``pos_i = (h1 + i*h2) mod m`` (integer arithmetic, identical in DuckDB);
2. probes join the broadcast bitmap; a shingle is a *candidate* iff all
   ``k`` probed bits are set (Bloom guarantee: no false negatives);
3. candidates — a tiny fraction of the corpus — flow into the exact
   benchmark join, which removes Bloom false positives.

Step 3 makes the operator LOSSLESS: the final answer equals the plain exact
screen for every ``(m_bits, k)``, so the query below shares
``d_contamination``'s oracle verbatim — the driver hash-check certifies that
the Bloom path changes the plan, not the result. The bit test is
``floor(word_bits / 2^bit) % 2`` (not ``<<``/``>>``): both engines evaluate
it in exact double arithmetic for 32-bit words, avoiding cross-engine shift
overflow semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist
from .dedup import doc_shingles

WORD = 32  # packed word width; 2^bit stays exact in double for bit < 32


def _positions(h, m_bits: int, k: int):
    """k double-hash probe positions for hash column ``h`` (exact BIGINT)."""
    h1 = h % m_bits
    h2 = (F.floor(h / m_bits) % (m_bits // 2)) * 2 + 1  # odd stride
    i = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    return h1, h2, i


def bloom_bitmap(hashes: DataFrame, m_bits: int, k: int) -> DataFrame:
    """Build the relational Bloom bitmap ``(word_idx, word_bits)`` from a
    DataFrame with a ``shingle_hash`` column. ``m/32`` rows max; the bit_or
    aggregation is map-side combinable, so the shuffle carries one row per
    touched word, not per key."""
    h = F.col("shingle_hash")
    h1, h2, i = _positions(h, m_bits, k)
    pos = hashes.select(h1.alias("h1"), h2.alias("h2"), i).select(
        ((F.col("h1") + F.col("i") * F.col("h2")) % m_bits).alias("pos")
    )
    return (
        pos.select(
            F.floor(F.col("pos") / WORD).cast("bigint").alias("word_idx"),
            (F.col("pos") % WORD).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("cast(pow(2, bit) as bigint)")).alias("word_bits"))
    )


def bloom_contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Exact decontamination result via Bloom pre-filter + exact confirm.

    Returns distinct contaminated ``id_col`` — identical to
    :func:`~unravelsports_spark.operators.filtering.contaminated_docs` for
    every parameterization (the confirm join removes false positives; Bloom
    has no false negatives)."""
    if m_bits < 2 or m_bits % 2:
        raise ValueError(f"m_bits must be an even integer >= 2, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bench = tracked_persist(
        doc_shingles(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle_hash")
        .distinct()
    )
    bitmap = bloom_bitmap(bench, m_bits, k)

    corp = doc_shingles(corpus, id_col=id_col, text_col=text_col, n=n)
    h = F.col("shingle_hash")
    h1, h2, i = _positions(h, m_bits, k)
    probes = (
        corp.select(id_col, "shingle_hash", h1.alias("h1"), h2.alias("h2"), i)
        .withColumn("pos", (F.col("h1") + F.col("i") * F.col("h2")) % m_bits)
        .select(
            id_col,
            "shingle_hash",
            F.floor(F.col("pos") / WORD).cast("bigint").alias("word_idx"),
            (F.col("pos") % WORD).alias("bit"),
        )
    )
    hits = (
        probes.join(F.broadcast(bitmap), "word_idx", "left")
        .withColumn(
            "hit",
            F.when(
                F.col("word_bits").isNotNull()
                & (
                    (
                        F.floor(
                            F.col("word_bits") / F.expr("cast(pow(2, bit) as bigint)")
                        )
                        % 2
                    )
                    == 1
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .groupBy(id_col, "shingle_hash")
        .agg(F.sum("hit").alias("n_hit"))
    )
    candidates = hits.filter(F.col("n_hit") == k).select(id_col, "shingle_hash")
    # exact confirm: candidates are a tiny slice of the corpus, so this join
    # is cheap even when `bench` itself is shuffle-joined at scale
    return (
        candidates.join(bench, "shingle_hash", "left_semi")
        .select(id_col)
        .distinct()
    )
