"""Connected components over candidate-pair edges, in pure DataFrame ops.

The missing piece between near-duplicate *pairs* (dedup.py / similarity.py)
and dedup *decisions*: duplicate pairs form clusters, and each cluster keeps
one canonical document (its minimum id). This is the GraphX-connected-
components use case expressed Spark-DataFrame-first (GraphX is JVM/RDD-only
and not reachable from PySpark).

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014). Each round is two
hash-shuffles on the node id; rounds converge in O(log² n) — in practice a
handful — and every step is a plain groupBy/join, so AQE handles skew (a
celebrity node with millions of neighbors is exactly the skew-join case).

At 100 TB the edge list (LSH candidate pairs) is many orders smaller than
the corpus, so this runs on the pruned pair set, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame, reliable: bool) -> DataFrame:
    """Per-round materialization for iterative chains. Default: eager
    localCheckpoint — truncates lineage, blocks stored NON-reliably (an
    executor loss after checkpointing fails the query; acceptable when a
    rerun is cheap). ``reliable=True`` swaps in ``checkpoint(eager=True)``
    — per-round writes to ``spark.sparkContext.setCheckpointDir`` storage,
    surviving executor loss — the ADVICE r7 #3 cluster fallback. The
    caller must have set a checkpoint dir; the error raised otherwise is
    Spark's own and names the fix."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _sym(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor to the neighborhood minimum
    (including self)."""
    nbr = _sym(edges)
    m = nbr.groupBy("src").agg(F.min(F.least(F.col("dst"), F.col("src"))).alias("m"))
    return (
        nbr.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Point every smaller-or-equal neighbor at the neighborhood minimum."""
    nbr = _sym(edges).filter(F.col("dst") < F.col("src"))
    m = nbr.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        nbr.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(m.select(F.col("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return out


def _sym_partitioned(pairs: DataFrame, src: str, dst: str, key: str) -> DataFrame:
    """Symmetric distinct edge set laid out for an iterated consumer:
    hash-partitioned on ``key`` (src or dst) with a PINNED partition count
    (spark.sql.shuffle.partitions — scale-adaptive config, not a constant).

    The layout is free (guide §2.4): the symmetrize dedup needs one
    exchange anyway, and hash(key) satisfies the (src, dst) dedup
    clustering, so repartition + dropDuplicates replaces distinct's own
    exchange instead of adding one. The count is pinned because an
    AQE-coalescible exchange would cache the table at whatever width AQE
    picked at build time, and a later iteration join against a
    differently-numbered side would re-shuffle the EDGE side — exactly the
    per-iteration full-edge shuffle this layout exists to remove; pinning
    keeps the cached width equal to every aggregation's width so the
    node-sized side is the only thing that can move (the
    repartition_for_kernel trade, session.py)."""
    try:
        n = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        # managed runtimes may set the conf non-numeric (e.g. "auto");
        # fall back to the cluster-core default rather than crash here
        # (ADVICE r14)
        n = pairs.sparkSession.sparkContext.defaultParallelism
    raw = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        raw.unionByName(rev)
        .filter(F.col("src") != F.col("dst"))
        .repartition(n, F.col(key))
        .dropDuplicates(["src", "dst"])
    )


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical directed form: one distinct (src, dst) row per undirected
    edge with src > dst, self-loops dropped. Half the rows of the symmetric
    form — the loop invariant of :func:`_star_round`."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest(F.col("src"), F.col("dst")).alias("src"),
            F.least(F.col("src"), F.col("dst")).alias("dst"),
        )
        .distinct()
    )


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round over a CANONICAL edge set
    (src > dst, distinct) — set-identical to
    ``_small_star(_large_star(sym))`` (property-tested head-to-head) with
    the shuffles the composed form pays between the steps removed
    (optimization guide §2.4):

    - the symmetric neighbor table is ``E ∪ rev(E)`` with NO distinct: the
      two branches are disjoint by the src>dst invariant (a shuffle saved);
    - large-star output always has src > dst, so small-star's
      re-symmetrize + filter + distinct is the identity on it and is
      dropped entirely (two more shuffles saved); its duplicates are
      harmless — min() is duplicate-insensitive and the round ends in the
      distinct both stars previously paid separately;
    - each star's neighbor table is hash-repartitioned on its key ONCE
      (AQE-coalescible: no pinned partition count) and feeds both the
      min-aggregation and the join from the same exchange, instead of
      shuffling once for the partial-agg and again for the join side.

    Net plan: 3 exchanges per round (nbr by src, large-star output by its
    src, final distinct) vs 8 for the composed form."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nbr = edges.unionByName(rev).repartition(F.col("src"))
    m = nbr.groupBy("src").agg(F.min(F.least(F.col("dst"), F.col("src"))).alias("m"))
    large = (
        nbr.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .repartition(F.col("src"))
    )
    m2 = large.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        large.join(m2, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(m2.select(F.col("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 12,
    reliable: bool = False,
) -> DataFrame:
    """(src, dst) undirected edges → (id, component) with component = min id
    reachable. Isolated nodes don't appear (callers left-join and coalesce to
    the node's own id). ``reliable=True`` checkpoints each round to the
    session checkpoint dir instead of executor memory (see
    :func:`_materialize`)."""
    edges = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # materialize each round: truncates the exponentially-growing lineage
    # (the standard pattern for iterative DataFrame algorithms). The loop
    # carries the CANONICAL half-sized form; each round re-symmetrizes
    # with a shuffle-free union (see _star_round).
    edges = _materialize(_canon(edges), reliable)
    for _ in range(max_iter):
        edges = _materialize(_star_round(edges), reliable)
        # converged when the edge set is a star forest: no dst is also a
        # src. One map-side-combinable aggregation over the materialized
        # round (single exchange) instead of the distinct + semi-join form.
        roles = edges.select(F.col("src").alias("n"), F.lit(1).alias("r")).unionByName(
            edges.select(F.col("dst").alias("n"), F.lit(2).alias("r"))
        )
        both = (
            roles.groupBy("n")
            .agg(F.min("r").alias("lo"), F.max("r").alias("hi"))
            .filter((F.col("lo") == 1) & (F.col("hi") == 2))
        )
        if both.isEmpty():
            break
    return edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))


def pagerank(
    pairs: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Fixed-iteration PageRank on an undirected pair graph → (id, pr).

    Boilerplate-triage signal on the near-dup candidate graph: a template
    page duplicated across thousands of URLs becomes a high-PR hub. Each
    iteration is one broadcast-free hash join (edges ⋈ ranks on src — both
    sides partitioned by node id, so a cluster co-partitions them once and
    reuses the exchange across iterations) plus one map-side-combinable
    aggregation on dst. The unbounded-iteration variant would converge on a
    residual; a fixed small iteration count is the production norm and keeps
    the query oracle-checkable.

    Cross-engine float discipline: per-edge contributions pr/deg are single
    IEEE divisions (deterministic); the per-node contribution sum rides
    DECIMAL(26,12); each iteration's rank is rounded to 9 decimals so the
    next round's inputs are engine-identical.
    """
    from ..cache import tracked_persist

    # edges feed every iteration's join and deg feeds every iteration's
    # rank rebuild; persist both so the upstream pair pipeline (LSH chain at
    # corpus scale) runs once — the n_nodes count below materializes them.
    # tracked_persist registers them for cache.release_tracked() cleanup
    # after the caller consumes the rank table.
    # The persisted edge table is hash-partitioned on src: every iteration's
    # contribution join and the degree aggregation key on src, so the cached
    # layout already satisfies their distributions and only the rank side
    # (node-sized, not edge-sized) can ever move per iteration — previously
    # the distinct left the cache partitioned on (src, dst) and a non-
    # broadcast plan re-shuffled the full edge set each round. The layout is
    # FREE: the symmetrize dedup itself needs one exchange anyway, and
    # hash(src) satisfies the (src, dst) dedup clustering (guide §2.4: two
    # operations keyed the same way share one exchange), so repartition +
    # dropDuplicates replaces distinct's own exchange instead of adding one.
    edges = tracked_persist(_sym_partitioned(pairs, src, dst, key="src"))
    deg = tracked_persist(edges.groupBy("src").agg(F.count("*").alias("deg")))
    n_nodes = deg.count()  # scalar; the node table itself never leaves executors
    ranks = deg.select(
        "src", "deg", F.round(F.lit(1.0) / F.lit(n_nodes), 9).alias("pr")
    )
    for _ in range(iters):
        contrib = edges.join(ranks, "src").select(
            F.col("dst"),
            F.round(F.col("pr") / F.col("deg"), 12).cast("decimal(26,12)").alias("c"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").cast("double").alias("s"))
        ranks = (
            deg.join(sums, deg.src == sums.dst, "left")
            .select(
                "src",
                "deg",
                F.round(
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    9,
                ).alias("pr"),
            )
        )
    return ranks.select(F.col("src").alias("id"), "pr")


def kcore_peel(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 4,
    src: str = "id_a",
    dst: str = "id_b",
    reliable: bool = False,
) -> DataFrame:
    """Fixed-round k-core peeling on an undirected pair graph →
    (round, n_nodes, n_edges): round 0 is the input graph; each round
    drops every node whose CURRENT degree is < k, plus its incident
    edges. After enough rounds the survivors are exactly the k-core —
    the densest dedup clusters (a doc with >= k near-dup neighbors that
    themselves sit in dense neighborhoods), the standard triage for
    template/boilerplate families that pairwise thresholds overcount.

    Deterministic for any fixed (k, rounds), so the per-round survivor
    curve is hash-certifiable cross-engine (same contract as the
    unrolled-iteration pagerank/LPA oracles).

    Scale shape: per round one map-side-combinable degree aggregation
    (which also yields the round's survivor-curve row: n_nodes = |deg|,
    n_edges = sum(deg) div 2 on the symmetric set) plus two semi-joins of
    the edge list against ONE shared surviving-node subtree — the second
    filter reuses the first's exchange/broadcast because the symmetric
    edge set lets the dst filter run as a src filter on the
    column-swapped (set-identical) table. Each round's edge set is
    MATERIALIZED eagerly (localCheckpoint, the connected_components
    pattern): it feeds the next round AND its own count branch in the
    final union, and union children share no common subplan — with lazy
    persist the branches would race the cache inside one job and
    re-evaluate the whole peeling chain per branch (measured 11.7 s vs
    1.7 s at sf0.1). The edge list is the LSH candidate set, orders
    smaller than the corpus, so a bounded number of checkpoint actions
    is driver-trivial.

    Cluster caveat (ADVICE r7 #3, same trade as connected_components):
    eager localCheckpoint runs jobs at plan-construction time and stores
    blocks NON-reliably — losing an executor after a round checkpoints
    fails the query (lineage is truncated, Spark cannot recompute) and it
    must be rerun from the start. That is the right default here: the
    checkpointed frames are candidate-set-sized, rounds are few, and a
    rerun is cheap relative to reliable-checkpoint I/O per round. For
    very long cluster runs, set ``spark.sparkContext.setCheckpointDir``
    and pass ``reliable=True`` — each round then writes a reliable
    checkpoint, trading per-round HDFS I/O for executor-loss resilience.
    """
    edges = _materialize(
        _sym(pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))),
        reliable,
    )
    counts = []
    for i in range(rounds + 1):
        # One degree table per round serves BOTH the survivor curve and the
        # peel (guide §2.4): on the symmetric self-loop-free edge set,
        # n_nodes = |deg| and n_edges = sum(deg) div 2 exactly (every
        # undirected edge contributes 2 to the degree total), replacing the
        # old count_distinct + count(src < dst) full-edge aggregation with a
        # rollup of the node-sized table the peel needs anyway.
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        counts.append(
            deg.agg(
                F.lit(i).cast("int").alias("round"),
                F.count("*").alias("n_nodes"),
                # sum() is NULL on a fully-peeled (empty) round; the old
                # count() form yielded 0 there — keep that contract.
                F.coalesce(F.expr("sum(deg) div 2"), F.lit(0).cast("long")).alias(
                    "n_edges"
                ),
            ).select("round", "n_nodes", "n_edges")
        )
        if i == rounds:
            break
        keep = deg.filter(F.col("deg") >= k).select("src")
        # Both endpoint filters run against the SAME keep subtree: filter on
        # src, swap the columns (a free projection — the edge set is
        # symmetric, so the swapped set is the same set), filter on src
        # again. The old form joined keep once on src and a renamed copy on
        # dst — two distinct broadcast subtrees, so keep was aggregated and
        # broadcast twice per round; now the second join reuses the first
        # exchange (ReusedExchange / one shuffle of the node set at scale).
        keep_src = edges.join(keep, "src", "left_semi")
        swapped = keep_src.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        edges = _materialize(swapped.join(keep, "src", "left_semi"), reliable)
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("round")


def label_propagation(
    pairs: DataFrame,
    iters: int = 3,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Synchronous label propagation on an undirected pair graph →
    (id, label): community detection at finer granularity than connected
    components — a template family and the pages quoting it land in one
    component but separate communities. Labels start as node ids; each
    round every node adopts its neighbors' most frequent label, ties to
    the LOWEST label (fully deterministic synchronous variant, so a
    fixed iteration count is hash-certifiable cross-engine — the
    classic near-linear community algorithm of Raghavan et al. 2007).

    Scale shape: per round one hash join (symmetric edges ⋈ labels on the
    neighbor id — both sides partitioned by node id, co-partitioned once
    on a cluster) and two map-side-combinable aggregations ((id, label)
    vote counts, then a combinable max_by argmax per node — no window, no
    global sort). Edges persist across rounds; all arithmetic is exact
    integers."""
    from ..cache import tracked_persist

    # Partition the persisted edge table on dst — the key every iteration's
    # label join probes — so the cached layout satisfies the join
    # distribution and only the node-sized label table can move per round.
    # Free like the pagerank layout above: repartition + dropDuplicates
    # share the one exchange the symmetrize dedup pays anyway (guide §2.4).
    edges = tracked_persist(_sym_partitioned(pairs, src, dst, key="dst"))
    # Materialize the cache BEFORE the loop is planned: an unmaterialized
    # AQE-cached plan reports UnknownPartitioning, so the planner inserted a
    # full-edge exchange above the cache scan in EVERY iteration's join —
    # exactly the re-shuffle the pinned layout exists to remove. pagerank
    # gets this for free from its n_nodes count; LPA had no materializing
    # action (r15; caught by the non-broadcast plan walk in
    # tests/test_plan_quality.py). The count is the cache build the first
    # consumer would have paid anyway, surfaced as its own job.
    edges.count()
    # derive the node set from the DST endpoint: identical set on the
    # symmetric table, but dst matches the cache's pinned hash(dst) layout,
    # so the init distinct runs exchange-free where select(src).distinct()
    # re-shuffled the full edge column (r15)
    labels = edges.select(F.col("dst").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(iters):
        # one exchange per round: votes move to their node once; hash
        # partitioning on id alone satisfies the (id, label) clustering of
        # the vote count AND the (id) clustering of the argmax, so both
        # aggregations run exchange-free on top of it (previously the
        # (id, label) agg and the (id) agg each shuffled).
        votes = (
            edges.join(labels, edges.dst == labels.id)
            .select(edges.src.alias("id"), "label")
            .repartition(F.col("id"))
        )
        counted = votes.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        labels = counted.groupBy("id").agg(
            F.max_by(
                "label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )
    return labels
