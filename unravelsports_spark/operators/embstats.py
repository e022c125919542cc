"""Per-dimension embedding statistics (engine addition §2.12; built round
10, driver registration round 11) — the normalization pre-pass every
embedding pipeline runs before ANN / clustering: per dimension, the count,
mean, min and max over the whole corpus (feature scaling, dead-dimension
detection, quantizer range calibration — IVF-PQ's int grid and the sign-LSH
plane scaling both consume exactly these numbers).

Exactness discipline: float sums are NOT associative, so a naive
AVG(double) differs between engines (and between Spark runs — partial-agg
order is nondeterministic). Stats therefore ride the repo's integer-grid
path (operators/pq.py:_int_grid): each component quantizes to
floor(v * 2^20) as int64 — exact for float32 inputs (float32 has 24
mantissa bits; values in [-2^23, 2^23] stay integer-exact after the shift)
— and count/sum/min/max are exact integer aggregation, bit-identical in
any engine and any order. Mean is exact integer division (micro-grid
units); callers needing the float mean divide by 2^20 at the edge.

Scale shape: ONE posexplode (rows × dim, the unavoidable fan-out) into ONE
map-side-combinable groupBy(pos) — partials collapse to dim-sized frames
on every executor before the wire, so the shuffle carries
O(dim × partitions) rows regardless of corpus size. No windows, no joins,
no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the CANONICAL quantization grid (operators/pq.py) — imported, not
# re-implemented, so calibration stats and the PQ/IVF quantizers cannot
# desynchronize if the grid ever changes (r10 review pass 2 finding #5)
from .pq import Q, _int_grid  # noqa: F401  (Q re-exported for callers)


def embedding_dim_stats(
    df: DataFrame, emb_col: str = "embedding"
) -> DataFrame:
    """(pos, n, sum_q, mean_q, min_q, max_q) per dimension, all exact
    int64 on pq.py's 2^-20 grid (the SAME `_int_grid` expression the
    quantizers use). ``pos`` is 0-based. NULL vectors are skipped by the
    explode; ragged dimensions simply report their own n. ``mean_q`` is
    Spark's `div` — integral division truncating toward zero, which is
    also what DuckDB's `//` does (both engines truncate; pinned in
    tests)."""
    comp = df.select(F.posexplode(_int_grid(emb_col)).alias("pos", "q"))
    return (
        comp.groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.sum("q").alias("sum_q"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
        )
        .select(
            "pos",
            "n",
            "sum_q",
            F.expr("div(sum_q, n)").alias("mean_q"),
            "min_q",
            "max_q",
        )
        .orderBy("pos")
    )
