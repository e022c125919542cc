"""Round-2 relational additions: deterministic reservoir sampling, histogram
binning, decimal-exact correlation, rollup, pivot, rank-based window stats,
and edit-distance near-dup verification — each with an exact DuckDB oracle.

Engine-parity notes: bucket indices use explicit FLOOR (Spark truncates
double→bigint, DuckDB rounds); correlation is computed from DECIMAL sufficient
statistics (order-independent) and only the final closed form runs in double
(same expression tree both sides, rounded to 6); sampling orders by md5 with
a full key tie-break so ROW_NUMBER is reproducible."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..session import read_table
from .relational import dec, dsum, ms, query, scaled_units


@query(
    "o13_reservoir_sample",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, rn FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY md5(l_orderkey || '-' || l_linenumber), l_orderkey, l_linenumber
             ) AS rn
      FROM lineitem
    ) WHERE rn <= 5
    """,
)
def o13_reservoir_sample(spark, sf_dir):
    """Deterministic per-key reservoir sample (engine addition §2.12): k=5
    rows per group chosen by content hash — reproducible across runs and
    shards, unlike rand()-based sampling. At scale this is one shuffle on
    the group key; the hash order is computed map-side.

    Scale note (examined r14, left alone): although ``l_returnflag`` has
    only 3 values, the filtered row_number window is NOT a 3-reducer
    bottleneck — Spark 4's InferWindowGroupLimit plans a map-side
    ``WindowGroupLimit … Partial`` BEFORE the exchange (see
    plans/r14/o13_reservoir_sample_before.txt), so each map partition
    ships only its local top-5 per group and the 3 reducers rank
    ~5·P·groups candidate rows. A hand-written two-phase top-k was built,
    verified hash-exact, measured — and reverted: it duplicated what the
    optimizer already does and added a second exchange."""
    li = read_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.md5(key), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "rn")
    )


@query(
    "a11_histogram",
    oracle="""
    SELECT GREATEST(0, LEAST(19, CAST(FLOOR((l_extendedprice - 900.0) / 5000.0) AS BIGINT))) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM lineitem GROUP BY 1
    """,
)
def a11_histogram(spark, sf_dir):
    """Fixed-width histogram (A-family addition): manual floor bucketing
    (clamped to [0,19]) — a pure projection feeding one map-side-combinable
    aggregation; the classic profile-a-column-at-scale pattern."""
    li = read_table(spark, sf_dir, "lineitem")
    bucket = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.lit(19).cast("bigint"),
            F.floor((F.col("l_extendedprice") - 900.0) / 5000.0),
        ),
    )
    return (
        li.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("total"))
    )


@query(
    "a12_corr_exact",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
    FROM s
    """,
)
def a12_corr_exact(spark, sf_dir):
    """Pearson correlation via DECIMAL sufficient statistics (A-family
    addition): the five sums are exact decimals (order-independent, unlike
    Spark's streaming co-moment corr()), so the closed form evaluates
    identically on both engines; sqrt is IEEE-correctly-rounded. This is the
    deterministic way to compute corr at 100 TB — map-side-combinable sums,
    one row per group to the driver."""
    li = read_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        "l_returnflag",
        "n",
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("corr_qty_price"),
    )


@query(
    "a13_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a13_rollup(spark, sf_dir):
    """ROLLUP hierarchy aggregation (A-family addition): Spark expands
    grouping sets with one Expand + one aggregation — subtotals and the
    grand total in a single shuffle instead of N queries."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "o14_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def o14_pivot(spark, sf_dir):
    """Pivot / wide reshaping (O-family addition): explicit conditional
    aggregation rather than df.pivot — same single-aggregation physical
    plan, but the output schema is static (pivot's value-discovery pass is
    a second scan at 100 TB; when the pivot values are known, spell them)."""
    li = read_table(spark, sf_dir, "lineitem")
    ls = F.col("l_linestatus")
    q = dec("l_quantity")
    zero = F.lit(0).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(ls == "F", 1).otherwise(0)).alias("F"),
        F.sum(F.when(ls == "O", 1).otherwise(0)).alias("O"),
        F.sum(F.when(ls == "F", q).otherwise(zero)).cast("double").alias("qty_F"),
        F.sum(F.when(ls == "O", q).otherwise(zero)).cast("double").alias("qty_O"),
    )


@query(
    "w8_rank_distributions",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd,
           RANK() OVER w AS rnk
    FROM lineitem
    WHERE l_quantity <= 2.0
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice)
    """,
)
def w8_rank_distributions(spark, sf_dir):
    """Rank-based window distributions (W-family addition): percent_rank /
    cume_dist / rank are functions of the rank only, so ties don't make them
    nondeterministic (ntile would be); the divisions (rank-1)/(n-1) are
    exact IEEE in both engines.

    r14 (guide §2.4/§2.5): all three functions depend only on the VALUE
    distribution per group — rank = 1 + #rows with a strictly smaller
    price, cume_dist counts peers inclusively — so the whole-table window
    over the 3-value ``l_returnflag`` key (3 reducers sort everything at
    scale) collapses to: one map-side-combinable (group, price) count, a
    window over the price LEVELS only (level-table-sized, not row-sized),
    and an equi-join back on (group, price) that AQE broadcasts when the
    level table is small. The arithmetic reproduces the window functions
    bit-for-bit: both engines evaluate (rank−1)/(n−1) and cum/n as double
    divisions of exact integers, and the same integers divide here."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 2.0)
    lvl = li.groupBy("l_returnflag", "l_extendedprice").agg(F.count("*").alias("_c"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy("l_returnflag")
    lvl = (
        lvl.withColumn("_cum", F.sum("_c").over(w_cum))
        .withColumn("_n", F.sum("_c").over(w_grp))
        .withColumn("rnk", (F.col("_cum") - F.col("_c") + 1).cast("int"))
    )
    # null-SAFE join-back (VERDICT r14 #5): both keys are NOT NULL in TPC-H
    # so this is the identity here, but the window this decomposition
    # replaces KEEPS null-key rows — a plain equi-join would silently drop
    # them if the pattern is copied onto nullable data. eqNullSafe keys are
    # still hash-joinable, so the AQE broadcast of the level side survives
    # (plan guard re-verified).
    lvl = lvl.select(
        F.col("l_returnflag").alias("_lvl_rf"),
        F.col("l_extendedprice").alias("_lvl_px"),
        F.when(
            F.col("_n") > 1,
            (F.col("rnk") - 1).cast("double") / (F.col("_n") - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("pr"),
        (F.col("_cum").cast("double") / F.col("_n").cast("double")).alias("cd"),
        "rnk",
    )
    return li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice").join(
        lvl,
        F.col("l_returnflag").eqNullSafe(F.col("_lvl_rf"))
        & F.col("l_extendedprice").eqNullSafe(F.col("_lvl_px")),
    ).select("l_returnflag", "l_orderkey", "l_linenumber", "pr", "cd", "rnk")


@query(
    "d_edit_distance",
    oracle="""
    WITH a AS (SELECT doc_id, substring(text, 1, 40) AS prefix FROM documents)
    SELECT x.doc_id AS left_id, y.doc_id AS right_id,
           levenshtein(x.prefix, y.prefix) AS dist
    FROM a x JOIN a y ON y.doc_id = x.doc_id + 1
    WHERE levenshtein(x.prefix, y.prefix) <= 30
    """,
)
def d_edit_distance(spark, sf_dir):
    """Edit-distance near-dup verification (dedup-family addition): the
    expensive exact Levenshtein runs only on candidate pairs (here adjacent
    ids as a stand-in for LSH candidates — the same shape as
    d_lsh_candidate_pairs feeding a verify stage). Integer result, exact in
    both engines."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("prefix")
    )
    right = d.select(
        (F.col("doc_id") - 1).alias("join_id"),
        F.col("doc_id").alias("right_id"),
        F.col("prefix").alias("rprefix"),
    )
    return (
        d.join(right, d.doc_id == right.join_id)
        .withColumn("dist", F.levenshtein("prefix", "rprefix"))
        .filter(F.col("dist") <= 30)
        .select(F.col("doc_id").alias("left_id"), "right_id", "dist")
    )


@query(
    "a14_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a14_cube(spark, sf_dir):
    """CUBE over two dimensions (A-family addition): all 2^2 grouping sets
    in one Expand + one aggregation — same single-shuffle property as
    a13_rollup with the full lattice."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query("a15_hll_sketch_union")
def a15_hll_sketch_union(spark, sf_dir):
    """Mergeable HLL sketches (A-family addition, Datasketches-backed):
    per-source sketches built in one pass, then unioned into a global
    distinct estimate — the re-aggregatable distinct-counting pattern at
    100 TB (store per-partition sketches, merge on demand; never recount).

    Determinism (round 5): datasketches estimates are
    insertion-GROUPING-sensitive — the r4 formulation's partial aggregates
    split each source's rows across scan partitions, and merging the
    resulting intermediate sketches moved the estimate ±1 with the
    master/partition config. Repartitioning by source FIRST makes every
    partial aggregate build its source's sketch complete (one partition
    holds all of a source's rows; HLL insertion itself is set-determined,
    order-independent), after which the union merges n_sources fully-built
    sketches — measured stable across local[4]/local[32], shuffle
    partitions 4/32/200, and 4m-128m scan splits, so the query now carries
    a snapshot oracle in plans/snapshots.py like a9/MLlib-LSH. The
    accuracy bound stays asserted in tests/test_vocab.py."""
    d = read_table(spark, sf_dir, "documents")
    per_source = d.select("source", "text").repartition("source").groupBy("source").agg(
        F.expr("hll_sketch_agg(text)").alias("sk"),
        F.countDistinct("text").alias("exact_distinct"),
    )
    return per_source.agg(
        F.count("*").alias("n_sources"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("global_estimate"),
        F.sum("exact_distinct").alias("sum_per_source_exact"),
    )


@query(
    "f11_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def f11_string_agg(spark, sf_dir):
    """Ordered string aggregation (F-family addition): LISTAGG WITHIN GROUP
    — deterministic because the within-group order is total. The agg buffers
    per-group strings, so it belongs on bounded-cardinality dims (here:
    nations per region), never on unbounded fact groups."""
    n = read_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.expr("listagg(n_name, ',') within group (order by n_name)").alias("nations"),
        F.count("*").alias("n"),
    )


@query(
    "f12_array_agg_sorted",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def f12_array_agg_sorted(spark, sf_dir):
    """Deterministic array aggregation (F-family addition): collect_set is
    unordered (shuffle-arrival order), so a value-sort makes the result
    reproducible and oracle-comparable — the required pattern anywhere an
    array-valued agg feeds a hash/fingerprint downstream. The sorted set is
    emitted as a ','-joined string because the driver harness canonicalizes
    rows with pandas sort/factorize, which cannot hash array cells; the
    array form stays covered by tests/test_relational_oracle.py."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count("*").alias("n"),
    )


@query(
    "f13_bitwise_agg",
    oracle="""
    SELECT l_returnflag,
           bit_or(l_linenumber) AS flags_or,
           bit_and(l_linenumber) AS flags_and,
           bit_xor(l_linenumber) AS flags_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def f13_bitwise_agg(spark, sf_dir):
    """Bitwise aggregates (F-family addition): or/and/xor are commutative
    and associative, hence map-side combinable and order-independent —
    exact across engines with no decimal detour (the bitmask/bloom-ish
    accumulation pattern)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_or("l_linenumber").alias("flags_or"),
        F.bit_and("l_linenumber").alias("flags_and"),
        F.bit_xor("l_linenumber").alias("flags_xor"),
    )


@query(
    "w9_interpolate_gaps",
    oracle="""
    WITH m AS (
      SELECT event_type, event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
      FROM events
    ),
    f AS (
      SELECT event_type, event_id, v, rn,
             last_value(v IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS prev_rn,
             first_value(v IGNORE NULLS) OVER wn AS next_v,
             first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wn AS next_rn
      FROM m
      WINDOW wp AS (PARTITION BY event_type ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wn AS (PARTITION BY event_type ORDER BY rn
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, event_id,
           CASE
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
               THEN prev_v + (next_v - prev_v) * ((rn - prev_rn) / CAST(next_rn - prev_rn AS DOUBLE))
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE next_v
           END AS filled,
           CASE
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN 'interp'
             WHEN prev_v IS NOT NULL THEN 'locf'
             ELSE 'nocb'
           END AS fill_kind
    FROM f WHERE v IS NULL
    """,
)
def w9_interpolate_gaps(spark, sf_dir):
    """Gap repair for ordered series (W-family addition; the tracking-data
    shape: reconstruct masked samples from neighbors). Linear interpolation
    between the nearest non-null neighbors via two IGNORE-NULLS window
    passes, degrading to LOCF/NOCB at the edges. Pure window arithmetic —
    identical IEEE expression tree both engines, no rounding needed. At
    scale this is one shuffle on the series key; both windows reuse the
    same sort."""
    # r15 (VERDICT r14 #3, guide §2.5): the event_type window funnels the
    # whole table onto #event_types reducers at scale — run the identical
    # neighbor resolution as the two-level (event_type, event_id-range)
    # decomposition with O(#buckets) boundary-carry state
    # (operators/serieswin.py; equivalence-swept in tests/test_serieswin.py;
    # the r14 reversed-running-frame finding lives on inside gap_neighbors).
    from ..operators.serieswin import gap_neighbors

    e = read_table(spark, sf_dir, "events")
    masked = e.select(
        "event_type",
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    f = gap_neighbors(masked, "event_type", "event_id", "v")
    both = F.col("prev_v").isNotNull() & F.col("next_v").isNotNull()
    frac = (F.col("rn") - F.col("prev_rn")) / (F.col("next_rn") - F.col("prev_rn")).cast("double")
    filled = (
        F.when(both, F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.col("next_v"))
    )
    kind = (
        F.when(both, F.lit("interp"))
        .when(F.col("prev_v").isNotNull(), F.lit("locf"))
        .otherwise(F.lit("nocb"))
    )
    return (
        f.filter(F.col("v").isNull())
        .select("event_type", "event_id", filled.alias("filled"), kind.alias("fill_kind"))
    )


@query(
    "a16_profile",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_nonnull,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount), COUNT(DISTINCT l_discount),
           MIN(l_discount), MAX(l_discount),
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
    FROM lineitem
    """,
)
def a16_profile(spark, sf_dir):
    """Column profiling (A-family addition): null counts, distinct
    cardinality, range, exact sums per column — the schema-inference /
    data-quality first pass over a new corpus. One aggregation per column
    over a single cached scan; at scale the distinct counts would switch to
    the a15 sketch path."""
    li = read_table(spark, sf_dir, "lineitem")

    def profile(col):
        return li.agg(
            F.lit(col).alias("col_name"),
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
            dsum(col).alias("sum_v"),
        )

    return profile("l_quantity").unionAll(profile("l_discount"))


@query(
    "w10_moving_avg",
    oracle="""
    SELECT event_type, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY event_type ORDER BY event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS win_sum,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY event_id
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS win_n
    FROM events WHERE event_id % 11 = 0
    """,
)
def w10_moving_avg(spark, sf_dir):
    """Moving-frame window aggregation (W-family addition): ROWS BETWEEN
    sliding sum/count. The sum rides DECIMAL because engines disagree on
    frame-sum association order (segment trees vs running sums) — decimal
    is associative so any order matches. One sort per series key."""
    # r15 (VERDICT r14 #3, guide §2.5): same funnel removal as w9 — the
    # 4-row moving frame runs within (event_type, event_id-range) buckets
    # with a ≤3-row-per-bucket tail carry (operators/serieswin.py); decimal
    # addition is associative, so local frame + entry carry is the exact
    # frame sum.
    from ..operators.serieswin import moving_sum_count

    e = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 11 == 0)
        .select("event_type", "event_id", "value")
    )
    out = moving_sum_count(e, "event_type", "event_id", dec("value"), lookback=3)
    return out.select(
        "event_type",
        "event_id",
        F.col("win_sum").cast("double").alias("win_sum"),
        "win_n",
    )


def _morton_spread(expr: str) -> str:
    """16-bit → 32-bit bit-spreading (x | x<<8 masked, …) — identical
    integer ops in Spark SQL and DuckDB."""
    v = f"CAST({expr} AS BIGINT)"
    v = f"(({v} | ({v} << 8)) & 16711935)"        # 0x00FF00FF
    v = f"(({v} | ({v} << 4)) & 252645135)"       # 0x0F0F0F0F
    v = f"(({v} | ({v} << 2)) & 858993459)"       # 0x33333333
    v = f"(({v} | ({v} << 1)) & 1431655765)"      # 0x55555555
    return v


_MORTON_SQL = f"({_morton_spread('l_partkey % 65536')} | ({_morton_spread('l_suppkey % 65536')} << 1))"


@query(
    "o15_morton_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {_MORTON_SQL} AS morton,
           {_MORTON_SQL} >> 24 AS morton_bucket
    FROM lineitem WHERE l_orderkey < 64
    """,
)
def o15_morton_key(spark, sf_dir):
    """Z-order (Morton) interleaved key (O-family addition): sorting a
    write by this key clusters BOTH dimensions into the same row groups,
    so parquet min/max skipping prunes 2-D range predicates — the standard
    multi-dimensional data-skipping layout at 100 TB. Pure integer
    bit-spreading, identical in both engines."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 64)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(_MORTON_SQL).alias("morton"),
        F.expr(f"{_MORTON_SQL} >> 24").alias("morton_bucket"),
    )


@query(
    "j10_full_outer",
    oracle="""
    WITH l AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_orders
      FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey
    ),
    r AS (
      SELECT c_custkey AS custkey, c_acctbal
      FROM customer WHERE c_acctbal > 9000.0
    )
    SELECT COALESCE(l.custkey, r.custkey) AS custkey,
           l.n_orders, r.c_acctbal,
           (l.custkey IS NULL) AS only_right,
           (r.custkey IS NULL) AS only_left
    FROM l FULL OUTER JOIN r ON l.custkey = r.custkey
    """,
)
def j10_full_outer(spark, sf_dir):
    """Full outer join (J-family addition): both-side preservation with
    null indicators — the reconciliation shape (ledger vs snapshot). At
    scale a full outer cannot broadcast (both sides must co-partition), so
    it shuffles both on the key — exactly once."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    left = (
        o.filter(F.col("o_custkey") % 3 == 0)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_orders"))
    )
    right = c.filter(F.col("c_acctbal") > 9000.0).select(
        F.col("c_custkey").alias("custkey"), "c_acctbal"
    )
    j = left.alias("l").join(right.alias("r"), F.col("l.custkey") == F.col("r.custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("l.custkey"), F.col("r.custkey")).alias("custkey"),
        "n_orders",
        "c_acctbal",
        F.col("l.custkey").isNull().alias("only_right"),
        F.col("r.custkey").isNull().alias("only_left"),
    )


@query(
    "st_session_window_native",
    oracle="""
    WITH o AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms,
             CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w >= 1800000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts_ms,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM o
    )
    SELECT user_id, MIN(ts_ms) AS session_start_ms,
           MAX(ts_ms) + 1800000 AS session_end_ms,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_no
    """,
)
def st_session_window_native(spark, sf_dir):
    """Spark's NATIVE session_window aggregation (ST2 twin), cross-validated
    against the classic lag+cumsum SQL formulation as the oracle: proves the
    built-in operator's merge semantics (merge while gap < 30 min; session
    end = last event + gap) match the relational definition exactly. Same
    expression works under readStream with a watermark (state-bounded)."""
    from .relational import ms

    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window(F.col("ts").cast("timestamp"), "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            ms(F.col("session_window.start")).alias("session_start_ms"),
            ms(F.col("session_window.end")).alias("session_end_ms"),
            "n_events",
        )
    )


@query(
    "f14_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def f14_variant_json(spark, sf_dir):
    """Spark 4 VariantType JSON path (F-family addition): parse_json once
    into the binary variant encoding, then typed variant_get extraction —
    the engine-native semi-structured path (shredded access, no per-query
    re-parse), vs DuckDB's json_extract as the oracle. Integer payloads →
    exact."""
    e = read_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "f15_sql_text",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
    FROM orders
    WHERE o_custkey % 2 = 0
    GROUP BY o_orderpriority
    """,
)
def f15_sql_text(spark, sf_dir):
    """Pure `spark.sql` text surface: the same engine semantics exposed via
    temp view + SQL string instead of the DataFrame DSL — both compile to
    identical Catalyst plans, and every DataFrame query in this registry
    could be spelled this way. One query kept in SQL-text form so the
    surface itself is driver-certified."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("_sql_orders")
    return spark.sql("""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_finished
        FROM _sql_orders
        WHERE o_custkey % 2 = 0
        GROUP BY o_orderpriority
    """)


@query(
    "a20_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    j AS (
      SELECT e.user_id, f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                            date_trunc('week', e.ts)) // 7 AS BIGINT)
               AS week_offset
      FROM events e JOIN firsts f USING (user_id))
    SELECT CAST(epoch_ms(cohort_week) AS BIGINT) AS cohort_week_ms,
           week_offset,
           COUNT(DISTINCT user_id) AS n_users
    FROM j GROUP BY cohort_week, week_offset
    ORDER BY cohort_week_ms, week_offset
    """,
)
def a20_retention_cohorts(spark, sf_dir):
    """Retention cohort matrix (engine addition §2.12): users grouped by
    first-activity week, counted distinct in each subsequent week — the
    standard product-analytics rollup a training-data/event pipeline serves
    at warehouse scale. Both engines truncate weeks to Monday, and both
    offsets divide a day-diff of week-truncated stamps by 7, so the matrix
    is exact integers.

    Scale shape: the event log reduces to the distinct (user, day) set
    FIRST (one combinable shuffle — the matrix is a pure function of that
    set, which also makes it incrementally maintainable, see
    streaming/windows.py:streaming_user_days); then a combinable per-user
    MIN, a co-partitioned agg-back join on user_id over the small
    user-day table, and one distinct-count agg bounded by users ×
    active-weeks. The cohort math itself is the shared
    streaming/windows.py:retention_cohorts — ONE definition for the batch
    query and the streaming ledger twin."""
    from ..streaming.windows import retention_cohorts

    e = read_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    return retention_cohorts(ud)


@query(
    "a21_ordered_funnel",
    oracle="""
    WITH u1 AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY user_id),
    u2 AS (
      SELECT e.user_id, u1.t1,
             MIN(CASE WHEN e.event_type = 'click' AND e.ts > u1.t1
                      THEN e.ts END) AS t2
      FROM events e JOIN u1 USING (user_id) GROUP BY e.user_id, u1.t1),
    u3 AS (
      SELECT e.user_id, u2.t1, u2.t2,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > u2.t2
                      THEN e.ts END) AS t3
      FROM events e JOIN u2 USING (user_id) GROUP BY e.user_id, u2.t1, u2.t2),
    c AS (
      SELECT COUNT(t1) AS n1, COUNT(t2) AS n2, COUNT(t3) AS n3 FROM u3)
    SELECT * FROM (
      SELECT CAST(1 AS INTEGER) AS stage_idx, 'view' AS stage, n1 AS n_users FROM c
      UNION ALL
      SELECT CAST(2 AS INTEGER), 'click', n2 FROM c
      UNION ALL
      SELECT CAST(3 AS INTEGER), 'purchase', n3 FROM c
    ) ORDER BY stage_idx
    """,
)
def a21_ordered_funnel(spark, sf_dir):
    """Strictly-ordered conversion funnel (engine addition §2.12):
    view → click-after-first-view → purchase-after-that-click, counted as
    users reaching each stage. Stage timestamps chain (t2 conditions on
    t1, t3 on t2), the classic sequence-match the warehouse answers with
    correlated window scans.

    Scale shape: ONE data shuffle — three window aggregates share the
    user_id partitioning (Spark plans a single Exchange; the in-partition
    sorts are group-key-only, and the downstream per-user and global
    aggs reuse the partitioning; plan-guarded);
    NULL-chaining (ts > NULL → NULL) makes later stages vacuously empty
    for users who never reached the earlier one, identical semantics in
    both engines. The final 3-row stack is a stack() projection over a
    1-row aggregate."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("t1", t1)
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    c = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    return c.selectExpr(
        "inline(array("
        "  struct(int(1) AS stage_idx, 'view' AS stage, n1 AS n_users),"
        "  struct(int(2) AS stage_idx, 'click' AS stage, n2 AS n_users),"
        "  struct(int(3) AS stage_idx, 'purchase' AS stage, n3 AS n_users)))"
    )  # r15: terminal sort removed (order-insensitive comparator; §2.4)


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1.0 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS o_orderdate_ms,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): selective dim filter → two
    key joins → per-order revenue → top-10. Revenue rides the q1 scaled-
    long discipline (cents × basis-point units, exact int64 per group —
    an order holds ≲7 lines so the per-group unit sum is ≤ ~8e11, no
    two-phase needed; the decimal division at the end reproduces the
    oracle's DECIMAL product bit-for-bit, see q1_pricing_summary).

    Scale shape: both filters reach the parquet scans (segment on
    customer, dates on orders/lineitem); the custkey and orderkey joins
    shuffle only filtered rows and AQE picks broadcast when the filtered
    customer side fits; the final top-10 is a TakeOrderedAndProject heap,
    never a global sort."""
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    pc = scaled_units("l_extendedprice", 100)
    dm = F.lit(10000) - scaled_units("l_discount", 10000)
    return (
        c.select("c_custkey")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(pc * dm).cast("decimal(38,0)")
                / F.lit(1000000).cast("decimal(7,0)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            ms("o_orderdate").alias("o_orderdate_ms"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1.0 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): the 6-table star join with
    the customer-nation = supplier-nation correlation, revenue per nation
    in one region-year. Nation/region broadcast unconditionally (dozens of
    rows); supplier pre-filters to the region's nations THROUGH that
    broadcast before the fact join, so the big shuffle carries only
    region-local suppliers. Per-nation revenue uses q1's two-phase scaled-
    long sum (_pid pre-agg in pure int64 codegen, DECIMAL(38,0) promotion
    over the tiny partial table) — a nation's global unit sum would
    overflow int64 at 100 TB, a per-partition partial cannot.

    Scale shape: date filter pushed to the orders scan; orderkey/custkey
    shuffles carry one year of one region; the correlation predicate
    (c_nationkey = s_nationkey) applies AT the supplier join, not as a
    post-join filter."""
    nr = (
        read_table(spark, sf_dir, "nation")
        .join(
            read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    pc = scaled_units("l_extendedprice", 100)
    dm = F.lit(10000) - scaled_units("l_discount", 10000)
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    partial = (
        joined.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "n_name")
        .agg(F.sum(pc * dm).alias("dp_units"))
    )
    return (
        partial.groupBy("n_name")
        .agg(
            (
                F.sum(F.col("dp_units").cast("decimal(38,0)"))
                / F.lit(1000000).cast("decimal(7,0)")
            )
            .cast("double")
            .alias("revenue")
        )
        # r15: terminal no-LIMIT sort removed (order-insensitive
        # comparator; guide §2.4 — the range exchange + global sort was
        # pure output cosmetics)
    )


@query(
    "w12_sliding_distinct_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    win AS (
      SELECT d.day, u.user_id
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day)
    SELECT CAST(epoch_ms(day) AS BIGINT) AS day_ms,
           COUNT(DISTINCT user_id) AS active_users_7d
    FROM win GROUP BY day ORDER BY day_ms
    """,
)
def w12_sliding_distinct_users(spark, sf_dir):
    """Exact 7-day rolling distinct users (engine addition §2.12): the
    sliding-distinct aggregate that a window function CANNOT express at
    scale (COUNT(DISTINCT) OVER a range frame needs the full set per row).
    Spark-first rewrite: reduce to one row per (user, day) first, then
    EXPLODE each into the ≤7 window-end days it contributes to, then one
    distinct-count agg — a bounded 7× fan-out of the already-reduced
    per-day table instead of a range self-join, shuffle keyed by day.
    Output days are observed activity days only (identical set both
    engines). At 100 TB the (user, day) reduction is the big combinable
    shuffle; the explode multiplies the SMALL reduced table.
    """
    e = read_table(spark, sf_dir, "events")
    from ..streaming.windows import rolling_active_users

    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    return rolling_active_users(ud, window_days=7)


@query(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(FLOOR(l_quantity * 100 + 0.5)) AS q_units
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(FLOOR(l_quantity * 100 + 0.5)) > 30000)
    SELECT c_name, c_custkey, o_orderkey,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS o_orderdate_ms,
           o_totalprice,
           CAST(q_units AS DOUBLE) / 100.0 AS sum_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): per-order quantity sums
    with a HAVING screen, enriched with order/customer attributes, top-100
    by order value. Quantities ride exact cent-scaled int64 (the q1
    discipline), so the HAVING threshold and the reported sums are
    engine-identical — a double SUM would be order-dependent at the
    threshold boundary.

    Scale shape: the lineitem aggregation is map-side combinable and its
    HAVING prunes to a tiny 'big orders' table BEFORE any join (TPC-H
    keeps ~0.2% of orders at threshold 300); the orders join shuffles only
    that survivor set (broadcast under AQE when it fits), and the
    customer join only the matched orders; top-100 is a
    TakeOrderedAndProject heap."""
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(scaled_units("l_quantity", 100)).alias("q_units")
        )
        .filter(F.col("q_units") > 30000)
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            ms("o_orderdate").alias("o_orderdate_ms"),
            "o_totalprice",
            (F.col("q_units").cast("double") / F.lit(100.0)).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1.0 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping, r8): trade revenue between two
    nations by ship year and direction. The OR-of-pairs predicate becomes
    the classic plan: restrict BOTH nation dims to the two names first
    (broadcast), pre-filter supplier and customer through them, then one
    cross-direction inequality (supp != cust nation) replaces the OR —
    only rows between the two nations ever reach the fact joins. Revenue
    rides q5's two-phase scaled-long sum (a direction-year group
    aggregates a whole year of trade — a global int64 unit sum would
    overflow at 100 TB; per-partition partials cannot).

    Scale shape: the shipdate range is pushed to the lineitem scan;
    supplier/customer shuffles carry only the two nations' rows; the
    output is 2 directions x 2 years, so the final agg is trivial."""
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pc = scaled_units("l_extendedprice", 100)
    dm = F.lit(10000) - scaled_units("l_discount", 10000)
    joined = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
    )
    partial = (
        joined.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "supp_nation", "cust_nation", "l_year")
        .agg(F.sum(pc * dm).alias("dp_units"))
    )
    return (
        partial.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (
                F.sum(F.col("dp_units").cast("decimal(38,0)"))
                / F.lit(1000000).cast("decimal(7,0)")
            )
            .cast("double")
            .alias("revenue")
        )
        # r15: terminal sort removed (order-insensitive comparator; §2.4)
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1.0 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting, r8): customers who
    returned the most value in one quarter, top-20. Single-phase scaled-
    long revenue (the q3 argument: a customer's returned lines within ONE
    quarter are bounded small — hundreds of lines x ~5e10 units/line is
    orders below the int64 edge — unlike q5/q7's year-of-trade groups).

    Scale shape: the quarter filter is pushed to the orders scan and the
    returnflag filter to the lineitem scan; the orderkey join carries one
    quarter of returned lines; nation broadcasts; top-20 by revenue is a
    TakeOrderedAndProject heap, never a global sort."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nt = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pc = scaled_units("l_extendedprice", 100)
    dm = F.lit(10000) - scaled_units("l_discount", 10000)
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nt), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            (
                F.sum(pc * dm).cast("decimal(38,0)")
                / F.lit(1000000).cast("decimal(7,0)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "a22_touch_attribution",
    oracle="""
    WITH fp AS (SELECT user_id, MIN(ts) AS p_ts FROM events
                WHERE event_type = 'purchase' GROUP BY user_id),
    tch AS (SELECT e.user_id, e.event_type, e.ts, e.event_id, fp.p_ts
            FROM events e JOIN fp ON e.user_id = fp.user_id
            WHERE e.event_type IN ('view','click','signup') AND e.ts < fp.p_ts),
    pu AS (SELECT user_id,
                  arg_min(event_type, printf('%020d%020d', epoch_us(ts), event_id)) AS first_touch,
                  arg_max(event_type, printf('%020d%020d', epoch_us(ts), event_id)) AS last_touch,
                  MIN(ts) AS first_ts, MAX(p_ts) AS p_ts
           FROM tch GROUP BY user_id)
    SELECT first_touch, last_touch, COUNT(*) AS n_users,
           CAST(SUM(epoch_ms(p_ts) - epoch_ms(first_ts)) AS BIGINT) AS total_ms_to_convert
    FROM pu GROUP BY first_touch, last_touch ORDER BY first_touch, last_touch
    """,
)
def a22_touch_attribution(spark, sf_dir):
    """First/last-touch attribution (engine addition SURVEY 2.12, r8): for
    every converting user, the first and the last touch event (view /
    click / signup) strictly before their FIRST purchase; output is the
    (first_touch, last_touch) conversion matrix with exact integer
    time-to-convert totals. Deterministic across engines: touch order is
    (ts, event_id) — encoded as one zero-padded sortable string because
    min_by/arg_min ordering keys must be scalar in both engines — at FULL
    microsecond resolution (unix_micros / epoch_us; the parquet timestamps
    are micros, so nothing is truncated and the ordering agrees with the
    streaming twin's raw-timestamp sort — a ms-truncated key would break
    ties differently on sub-ms data). The time sums are unix-millis
    integers, never doubles.

    Scale shape: first-purchase is a map-side-combinable MIN per user;
    the touch filter prunes the events scan before the user-keyed join;
    per-user first/last are single-pass min_by/max_by aggregates (no
    window, no sort); state per user is two scalars. The final matrix is
    |touch types|^2 rows."""
    e = read_table(spark, sf_dir, "events")
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    tch = (
        e.filter(F.col("event_type").isin("view", "click", "signup"))
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("p_ts"))
    )
    key = F.format_string(
        "%020d%020d", F.unix_micros(F.col("ts").cast("timestamp")), F.col("event_id")
    )
    pu = tch.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_touch"),
        F.max_by("event_type", key).alias("last_touch"),
        F.min("ts").alias("first_ts"),
        F.max("p_ts").alias("p_ts"),
    )
    return (
        pu.groupBy("first_touch", "last_touch")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(ms("p_ts") - ms("first_ts"))
            .cast("bigint")
            .alias("total_ms_to_convert"),
        )
        # r15: terminal sort removed (order-insensitive comparator; §2.4)
    )
