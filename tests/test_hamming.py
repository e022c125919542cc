"""Hamming-LSH near-dup mining (operators/hamming.py) — built round 10.
The DuckDB twin verified here is the oracle shape for a future
`mm_phash_neardup` / `d_simhash_neardup` registration."""

from pyspark.sql import functions as F


def _twin_sql(src: str, threshold: int, bands: int = 4,
              max_bucket: int = 10_000) -> str:
    width = 64 // bands
    mask = (1 << width) - 1
    return f"""
    WITH keyed AS (
      SELECT id AS _id, h AS _h, u.b AS band, (h >> (u.b * {width})) & {mask} AS key
      FROM {src}, unnest(range(0, {bands})) AS u(b)),
    hot AS (SELECT band, key FROM keyed GROUP BY 1, 2
            HAVING COUNT(*) > {max_bucket}),
    ok AS (SELECT k.* FROM keyed k ANTI JOIN hot USING (band, key))
    SELECT DISTINCT a._id AS id_a, b._id AS id_b,
           bit_count(xor(a._h, b._h)) AS hamming
    FROM ok a JOIN ok b ON a.band = b.band AND a.key = b.key AND a._id < b._id
    WHERE bit_count(xor(a._h, b._h)) <= {threshold}
    """


def test_hamming_neardup_matches_duckdb(spark, duck):
    """Banded candidates + exact verify over the corpus fingerprints
    (simhash of the documents table — a REAL skewed hash distribution),
    exact vs the SQL twin including negative codes and arithmetic-shift
    semantics."""
    from unravelsports_spark.operators.dedup import simhash
    from unravelsports_spark.operators.hamming import hamming_neardup_pairs
    from unravelsports_spark.session import read_table

    from .conftest import SF_CORRECT

    docs = read_table(spark, SF_CORRECT, "documents")
    # widen the 16-bit simhash into the 64-bit id-mixed code a perceptual
    # hash would produce (keeps the test on real, collision-rich data);
    # odd ids get the SIGN BIT set so negative codes — and the arithmetic-
    # shift-plus-mask band keys they produce — are genuinely exercised
    MIN64 = -(1 << 63)
    fps = simhash(docs, bits=16).select(
        F.col("doc_id").alias("id"),
        (
            F.col("simhash")
            + F.shiftleft(F.col("simhash"), 16)
            + F.shiftleft(F.pmod(F.col("doc_id"), F.lit(7)), 32)
        )
        .cast("bigint")
        .bitwiseXOR(
            F.when(F.pmod("doc_id", F.lit(2)) == 1, F.lit(MIN64))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        .alias("h"),
    )
    got = sorted(
        map(
            tuple,
            hamming_neardup_pairs(fps, "h", "id", threshold=3, bands=4).collect(),
        )
    )
    # fully independent twin: DuckDB recomputes the fingerprints through
    # the certified d_simhash SQL and the same integer widening
    from unravelsports_spark.plans.pipeline import _simhash_sql

    src = f"""(
      WITH sh AS ({_simhash_sql(16)})
      SELECT doc_id AS id,
             xor(simhash + (simhash << 16) + ((doc_id % 7) << 32),
                 CASE WHEN doc_id % 2 = 1
                      THEN CAST(-9223372036854775808 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END) AS h
      FROM sh) fps"""
    want = sorted(map(tuple, duck.execute(_twin_sql(src, 3)).fetchall()))
    assert got == want and len(got) > 0


def test_hamming_pigeonhole_recall_exact_below_bands(spark):
    """Every pair at distance < bands MUST be found (a pair at distance 3
    with 4 bands leaves one band untouched); a pair differing in every
    band is findable only when some slice still matches."""
    from unravelsports_spark.operators.hamming import hamming_neardup_pairs

    base = 0x0123456789ABCDEF
    rows = [
        (0, base),
        (1, base ^ 0b111),            # distance 3, all flips in band 0
        (2, base ^ (1 << 1) ^ (1 << 17) ^ (1 << 33)),  # 3 flips, 3 bands
        (3, base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)),  # 4 bands
    ]
    df = spark.createDataFrame(rows, "id long, h long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_neardup_pairs(df, "h", "id", threshold=4, bands=4).collect()
    }
    assert got[(0, 1)] == 3 and got[(0, 2)] == 3  # pigeonhole guarantees
    assert (0, 3) not in got  # every band touched: banding cannot see it
    # and distances between the variants themselves are exact bit_count:
    # flips {0,1,2} vs {1,17,33} — bit 1 cancels in the xor → 4
    assert got[(1, 2)] == 4


def test_hamming_hot_bucket_cap(spark):
    """A degenerate constant code (blank assets) floods one bucket; the
    cap drops it BEFORE the self-join instead of going quadratic."""
    from unravelsports_spark.operators.hamming import hamming_neardup_pairs

    rows = [(i, 0) for i in range(50)] + [(100, 7), (101, 5)]
    df = spark.createDataFrame(rows, "id long, h long")
    got = sorted(
        map(
            tuple,
            hamming_neardup_pairs(
                df, "h", "id", threshold=3, bands=4, max_bucket=10
            ).collect(),
        )
    )
    # the zero-code flood (>10 per bucket) is dropped entirely; 7 vs 5
    # share the three untouched bands and differ by bit_count(2)=1... but
    # they also share band-0 bucket only if (7&0xFFFF)==(5&0xFFFF) (no) —
    # bands 1..3 are all zero for both, which collides with the flood's
    # buckets and gets capped too. So nothing survives: the cap is a
    # recall trade-off and this pins the semantics (drop, not truncate).
    assert got == []


def test_hamming_rejects_bad_bands(spark):
    import pytest

    from unravelsports_spark.operators.hamming import hamming_neardup_pairs

    df = spark.createDataFrame([(1, 2)], "id long, h long")
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, "h", "id", bands=5)


def test_hamming_banded_equals_bruteforce_below_bands(spark):
    """Property (hypothesis): for threshold < bands the banded miner's
    output EQUALS brute-force exact Hamming pairs — the pigeonhole
    guarantee as a law over random codes, not one example."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from unravelsports_spark.cache import release_tracked
    from unravelsports_spark.operators.hamming import hamming_neardup_pairs

    codes = st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=2,
        max_size=12,
        unique=True,
    )

    @settings(max_examples=12, deadline=None)
    @given(codes)
    def law(hs):
        rows = [(i, h) for i, h in enumerate(hs)]
        df = spark.createDataFrame(rows, "id long, h long")
        got = sorted(
            map(
                tuple,
                hamming_neardup_pairs(df, "h", "id", threshold=3, bands=4).collect(),
            )
        )
        release_tracked()
        want = sorted(
            (i, j, bin((hs[i] ^ hs[j]) & ((1 << 64) - 1)).count("1"))
            for i in range(len(hs))
            for j in range(i + 1, len(hs))
            if bin((hs[i] ^ hs[j]) & ((1 << 64) - 1)).count("1") <= 3
        )
        assert got == want, (got, want)

    law()
