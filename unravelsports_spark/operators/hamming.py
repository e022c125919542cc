"""Hamming-space near-duplicate mining over 64-bit fingerprints (engine
addition §2.12; built round 10, driver registration round 11/12) — the
pair-mining stage the repo's perceptual hashes were missing: `image_phash`
/ `image_dhash` (operators/multimodal.py) and `simhash`
(operators/dedup.py) all reduce an asset to a 64-bit code whose Hamming
distance approximates visual/textual similarity, and at corpus scale the
near-dup question is "which PAIRS sit within distance t" — never
answerable by an all-pairs scan.

Banding (the classic Hamming-LSH): split the 64 bits into ``bands``
contiguous slices; candidates meet ONLY inside a (band, slice-value)
bucket, then the exact distance ``bit_count(xor)`` verifies each
candidate once. Pigeonhole guarantee: a pair at Hamming distance
h < bands shares at least one untouched band, so recall is 1.0 for
h ≤ bands - 1 among buckets that survive the ``max_bucket`` cap, and
degrades gracefully above (more bands = higher recall = bigger buckets;
the minhash bands-vs-rows trade-off, in bit space).

Everything is integer arithmetic DuckDB reproduces exactly (arithmetic
shift + mask, xor, bit_count — pinned cross-engine in tests), so the
consuming queries certify with exact SQL oracles.

Scale shape: one projection fans each code into ``bands`` (band, key)
rows; the self-join is co-bucketed on (band, key) — the only shuffle —
and a hot-bucket cap (``max_bucket``) anti-joins degenerate buckets (the
all-zero code of blank assets) before the quadratic step, the same
posting-list bound as the jaccard/containment miners."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming_neardup_pairs(
    df: DataFrame,
    hash_col: str = "phash",
    id_col: str = "id",
    threshold: int = 3,
    bands: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair sharing ≥1 band slice with
    exact ``bit_count(xor) <= threshold`` — id_a < id_b, each pair once.
    ``bands`` must divide 64 and be ≥ 2 (one band is no banding: every
    code lands in a single bucket AND its 2^64 mask overflows a long).
    Recall is exact for ``threshold < bands`` (pigeonhole) AMONG SURVIVING
    buckets: a bucket larger than ``max_bucket`` is dropped whole BEFORE
    the self-join — including any exact-duplicate pairs inside it — so a
    corpus whose degenerate constant code exceeds the cap trades those
    pairs for not going quadratic (raise the cap, or dedup constant codes
    exactly first, when that cluster matters)."""
    # check >= 2 FIRST: `64 % 0` would raise ZeroDivisionError before the
    # documented ValueError (r10 review pass 4)
    if int(bands) < 2 or 64 % int(bands) != 0:
        raise ValueError("bands must divide 64 and be >= 2")
    width = 64 // int(bands)
    mask = (1 << width) - 1
    h = F.col(hash_col).cast("bigint")
    keyed = df.select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(h, b * width)
                        .bitwiseAND(F.lit(mask).cast("bigint"))
                        .alias("key"),
                    )
                    for b in range(int(bands))
                ]
            )
        ).alias("bk"),
    ).select("_id", "_h", "bk.band", "bk.key")
    # the (possibly expensive) fingerprint lineage feeds the hot-bucket
    # aggregate AND both self-join sides — persist it once (released at
    # the next query boundary), the lsh_candidate_pairs discipline
    from ..cache import tracked_persist

    keyed = tracked_persist(keyed)
    hot = (
        keyed.groupBy("band", "key")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > int(max_bucket))
        .select("band", "key")
    )
    keyed = keyed.join(hot, ["band", "key"], "left_anti")
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h"))).alias("hamming"),
        )
        .where(F.col("hamming") <= int(threshold))
        .distinct()
    )
    return pairs
