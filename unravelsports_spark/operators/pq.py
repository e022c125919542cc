"""Product-quantization ANN: the compressed-codebook path for
embedding search/dedup when 100 TB of vectors can't be held — or shuffled —
in float form (Jégou et al. 2011, "Product Quantization for Nearest
Neighbor Search"; the IVF-PQ layout every production vector store uses).

Recipe: split each D-dim vector into M subvectors, train a small k-means
codebook per subspace, store each vector as M one-byte codes (D×4 bytes →
M bytes, 32× compression at D=64/M=8), and answer queries with asymmetric
distance (ADC): the query's exact distance to every centroid is a tiny
lookup table and a candidate's distance is the sum of M table entries.

**Everything is exact integer arithmetic**, which is what makes this the
first hash-certifiable distributed PQ: floats quantize once onto a 2^-20
grid (``FLOOR(v * 2^20)`` — measured: decimal casts of float32 differ
between engines on exact-half values, but double multiply-by-power-of-2 and
FLOOR are bit-identical), and every later step — Lloyd assignment, centroid
update (floor-mean), encoding, ADC — is int64 math with explicit
``(distance, cluster)`` tie-breaks. The DuckDB oracle unrolls the identical
rounds as CTEs and must match hash-exactly.

Scale shape (Spark):

- codebook training is the standard distributed Lloyd: assignment is a
  zero-join PROJECTION against literal centroids (the k×D sufficient
  statistics collected to the driver per round are ~kB — same contract as
  MLlib's k-means and this repo's ``s_kmeans_fit``); the per-dim update
  aggregation is map-side combinable, so the shuffle carries
  (M × k × D/M) rows, not the corpus;
- encoding is a pure projection (no join, no shuffle);
- the ADC scan is a projection + ``TakeOrderedAndProject`` top-k — the
  corpus is read once, never joined, never globally sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 1 << 20  # quantization grid: floor(v * 2^20); |iq| ≤ 2^23 for |v| ≤ 8


def _int_grid(vec_col: str = "embedding"):
    """float32 array → exact int64 array on the 2^-20 grid."""
    return F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * F.lit(float(Q))).cast("bigint"),
    )


def _sub(iq_col, m: int, sub_dim: int):
    """Slice subspace m (1-indexed slice; returns array<bigint> of sub_dim)."""
    return F.slice(iq_col, m * sub_dim + 1, sub_dim)


def _dist2(a, b):
    """Σ (a_i − b_i)² over two int arrays — exact int64 (≤ 2^52 at D≤64)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d,
    )


def _with_codes(df: DataFrame, codebook, iq_col: str = "iq", prefix: str = "a"):
    """Append per-subspace nearest-centroid assignment columns
    (``{prefix}0..{prefix}M-1``, int) to a frame with an int-grid array
    column — vectorized in Arrow batches.

    Every quantity is int64 (exact, order-free), so the numpy evaluation is
    IDENTICAL to the expression form by construction — no float rounding
    anywhere; ties resolve to the lowest cluster via np.argmin's
    first-occurrence rule, matching the (d, c) struct array_min. Replaces
    the literal-centroid ``aggregate``-fold projections whose lambdas
    interpreted M·k·sub_dim steps per row AND whose fresh-literal plans
    cost seconds of analysis per training round (PQ train 9.2 s -> 1.4 s,
    ADC 6.6 s -> 0.6 s at sf0.1)."""
    import numpy as np
    from pyspark.sql import types as T

    m_subspaces = len(codebook)
    sub_dim = len(codebook[0][0])
    C = [np.asarray(codebook[m], dtype=np.int64) for m in range(m_subspaces)]
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"{prefix}{m}", T.IntegerType()) for m in range(m_subspaces)]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            IQ = np.stack(pdf[iq_col].to_numpy()).astype(np.int64)
            out = pdf.copy()
            for m in range(m_subspaces):
                S = IQ[:, m * sub_dim : (m + 1) * sub_dim]
                diff = S[:, None, :] - C[m][None, :, :]
                dist = (diff * diff).sum(axis=2)
                out[f"{prefix}{m}"] = dist.argmin(axis=1).astype(np.int32)
            yield out

    return df.mapInPandas(assign, schema)


def pq_train_codebook(
    df: DataFrame,
    m_subspaces: int = 4,
    k: int = 16,
    n_rounds: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iq_df: DataFrame | None = None,
) -> list[list[list[int]]]:
    """Lloyd-train the PQ codebook; returns ``codebook[m][c] = int centroid``.

    Seeds are the ``k`` vectors with smallest ids (deterministic); each round
    collects only the (m, cluster, dim) → (sum, count) sufficient statistics.
    Driver payload bound: exactly k·D rows per round (M subspaces × k
    clusters × D/M dims) — independent of corpus size; the assignment pass
    is a zero-join literal-codebook projection. Empty clusters keep their
    previous centroid.

    ``iq_df`` (optional): a pre-built ``(_id, iq: array<bigint>)`` int-grid
    frame — pass the SAME (ideally persisted) frame to multiple trainings
    and the ADC scans so the quantization projection runs once per caller,
    not once per step; a caller-persisted frame is left cached (see
    ``_train_on_iq``)."""
    iq = (
        iq_df
        if iq_df is not None
        else df.select(F.col(id_col).alias("_id"), _int_grid(vec_col).alias("iq"))
    )
    return _train_on_iq(iq, m_subspaces, k, n_rounds)


def _train_on_iq(
    iq: DataFrame, m_subspaces: int, k: int, n_rounds: int
) -> list[list[list[int]]]:
    """Core integer Lloyd trainer over a ``(_id, iq: array<bigint>)`` frame —
    shared by the raw-vector path and the residual path (IVF-PQ).

    The int-grid frame is persisted for the training's lifetime (released
    in the ``finally``): every round scans it, plus the dim probe and the
    seed collect — without the cache each of those actions re-ran the
    upstream quantization lineage (residual path: a join) from the source.
    Same discipline as MLlib's trainers; cached footprint is the corpus's
    int arrays, the thing a multi-pass trainer must hold anyway. A frame
    the CALLER already persisted is respected — left cached on exit, so one
    cache can serve several trainings plus the retrieval scans."""
    caller_cached = iq.is_cached
    if not caller_cached:
        iq = iq.persist()
    try:
        # dim comes from the seed rows — no separate first() probe job
        seeds = [
            list(r["iq"])
            for r in iq.orderBy("_id").limit(k).select("iq").collect()
        ]
        if len(seeds) < k:
            raise ValueError(
                f"need at least k={k} vectors to seed the codebook, got {len(seeds)}"
            )
        dim = len(seeds[0])
        sub_dim = dim // m_subspaces
        if dim % m_subspaces:
            raise ValueError(
                f"dimension {dim} is not divisible by m_subspaces={m_subspaces}"
            )
        codebook = [
            [seeds[c][m * sub_dim : (m + 1) * sub_dim] for c in range(k)]
            for m in range(m_subspaces)
        ]

        for _ in range(n_rounds):
            assigned = _with_codes(iq.select("iq"), codebook)
            stats = _round_stats(assigned, m_subspaces, sub_dim)
            new_cb = [[list(c) for c in cb] for cb in codebook]
            for r in stats:
                new_cb[r["m"]][r["cluster"]][r["d"]] = r["c_int"]
            codebook = new_cb
        return codebook
    finally:
        if not caller_cached:
            iq.unpersist()


def _with_multi_codes(df: DataFrame, tagged, iq_col: str = "iq"):
    """`_with_codes` for several codebooks in ONE Arrow pass: ``tagged`` is
    a list of (prefix, codebook); appends every codebook's per-subspace
    assignment columns. Identical int64 argmin semantics per codebook."""
    import numpy as np
    from pyspark.sql import types as T

    plans = []
    fields = list(df.schema.fields)
    for prefix, codebook in tagged:
        m_subspaces = len(codebook)
        sub_dim = len(codebook[0][0])
        C = [np.asarray(codebook[m], dtype=np.int64) for m in range(m_subspaces)]
        plans.append((prefix, m_subspaces, sub_dim, C))
        fields += [
            T.StructField(f"{prefix}{m}", T.IntegerType()) for m in range(m_subspaces)
        ]
    schema = T.StructType(fields)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            IQ = np.stack(pdf[iq_col].to_numpy()).astype(np.int64)
            out = pdf.copy()
            for prefix, m_subspaces, sub_dim, C in plans:
                for m in range(m_subspaces):
                    S = IQ[:, m * sub_dim : (m + 1) * sub_dim]
                    diff = S[:, None, :] - C[m][None, :, :]
                    dist = (diff * diff).sum(axis=2)
                    out[f"{prefix}{m}"] = dist.argmin(axis=1).astype(np.int32)
            yield out

    return df.mapInPandas(assign, schema)


def pq_train_codebooks(
    iq_df: DataFrame, specs: list[tuple[int, int, int]]
) -> list[list[list[list[int]]]]:
    """Train SEVERAL independent codebooks over one ``(_id, iq)`` int-grid
    frame with shared driver actions: ONE seed collect (the max-k prefix
    seeds every spec — seeds are the smallest-id vectors, so spec i's
    seeds are exactly the first k_i rows) and, per training round, ONE
    fused assignment pass + ONE stats collect covering every spec still
    in training. Each ``specs`` entry is (m_subspaces, k, n_rounds);
    returns the codebooks in order, each EXACTLY equal to what
    ``pq_train_codebook`` would produce alone (identical seeds, identical
    per-round floor-mean updates — equality-tested). Driver payload bound
    per round: Σ_active k_i·D stats rows.

    This is the job-count optimization for callers like s_ann_ivfpq /
    s_ann_recall that train a coarse quantizer AND a PQ codebook over the
    same corpus: 2 seed collects + 3 stats collects become 1 + 2."""
    caller_cached = iq_df.is_cached
    if not caller_cached:
        iq_df = iq_df.persist()
    try:
        k_max = max(k for _, k, _ in specs)
        seeds = [
            list(r["iq"])
            for r in iq_df.orderBy("_id").limit(k_max).select("iq").collect()
        ]
        if len(seeds) < k_max:
            raise ValueError(
                f"need at least k={k_max} vectors to seed the codebooks, "
                f"got {len(seeds)}"
            )
        dim = len(seeds[0])
        books = []
        for m_subspaces, k, _ in specs:
            if dim % m_subspaces:
                raise ValueError(
                    f"dimension {dim} is not divisible by m_subspaces={m_subspaces}"
                )
            sd = dim // m_subspaces
            books.append(
                [[seeds[c][m * sd : (m + 1) * sd] for c in range(k)]
                 for m in range(m_subspaces)]
            )
        for rnd in range(max(r for _, _, r in specs)):
            active = [i for i, (_, _, r) in enumerate(specs) if rnd < r]
            tagged = [(f"s{i}_", books[i]) for i in active]
            assigned = _with_multi_codes(iq_df.select("iq"), tagged)
            stats = _multi_round_stats(
                assigned,
                [(f"s{i}_", len(books[i]), dim // specs[i][0]) for i in active],
            )
            for i in active:
                new_cb = [[list(c) for c in cb] for cb in books[i]]
                for r in stats:
                    if r["tag"] == f"s{i}_":
                        new_cb[r["m"]][r["cluster"]][r["d"]] = r["c_int"]
                books[i] = new_cb
        return books
    finally:
        if not caller_cached:
            iq_df.unpersist()


def _multi_round_stats(assigned: DataFrame, tagged_shapes):
    """`_round_stats` across several codebooks in one pass/collect:
    ``tagged_shapes`` is (prefix, m_subspaces, sub_dim) per codebook; rows
    carry the prefix as ``tag``."""
    m_structs = []
    for tag, m_subspaces, sub_dim in tagged_shapes:
        for m in range(m_subspaces):
            m_structs.append(
                F.struct(
                    F.lit(tag).alias("tag"),
                    F.lit(m).alias("m"),
                    F.col(f"{tag}{m}").alias("cluster"),
                    _sub(F.col("iq"), m, sub_dim).alias("vals"),
                )
            )
    return (
        assigned.select(F.explode(F.array(*m_structs)).alias("s"))
        .select("s.tag", "s.m", "s.cluster", F.posexplode("s.vals").alias("d", "v"))
        .groupBy("tag", "m", "cluster", "d")
        .agg(F.floor(F.sum("v") / F.count("*")).cast("bigint").alias("c_int"))
        .collect()
    )


def _round_stats(assigned: DataFrame, m_subspaces: int, sub_dim: int):
    """Per-(subspace, cluster, dim) floor-mean sufficient statistics.

    All M subspaces explode out of ONE pass over ``assigned``: the earlier
    union-of-M-projections form physically re-executed the Arrow assignment
    subtree once per union branch (Spark does not share a common subplan
    across union children), so an M=4 training ran the assignment pass 4x
    per round. Same rows, one assignment pass."""
    m_structs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.col(f"a{m}").alias("cluster"),
                _sub(F.col("iq"), m, sub_dim).alias("vals"),
            )
            for m in range(m_subspaces)
        ]
    )
    return (
        assigned.select(F.explode(m_structs).alias("s"))
        # posexplode positions are 0-based — they ARE the dim index
        .select("s.m", "s.cluster", F.posexplode("s.vals").alias("d", "v"))
        .groupBy("m", "cluster", "d")
        .agg(F.floor(F.sum("v") / F.count("*")).cast("bigint").alias("c_int"))
        .collect()
    )


def pq_adc_topk(
    df: DataFrame,
    codebook: list[list[list[int]]],
    query_int: list[int],
    top: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector against ``codebook`` and rank by asymmetric
    distance to ``query_int`` (already on the int grid). Returns
    ``(vec_id, code0..codeM-1, adc_dist)`` — all BIGINT, hash-exact."""
    m_subspaces = len(codebook)
    k = len(codebook[0])
    sub_dim = len(codebook[0][0])
    iq = df.select(F.col(id_col).alias(id_col), _int_grid(vec_col).alias("iq"))

    # the query's distance to every centroid: a python-side lookup table
    # (M×k ints) — the ADC trick; candidates never touch the query vector
    lut = [
        [
            sum(
                (query_int[m * sub_dim + i] - codebook[m][c][i]) ** 2
                for i in range(sub_dim)
            )
            for c in range(k)
        ]
        for m in range(m_subspaces)
    ]

    coded = _with_codes(iq, codebook, prefix="_c")
    cols = [F.col(id_col)]
    adc = F.lit(0).cast("bigint")
    for m in range(m_subspaces):
        code = F.col(f"_c{m}")
        cols.append(code.cast("bigint").alias(f"code{m}"))
        adc = adc + F.element_at(
            F.array(*[F.lit(int(x)).cast("bigint") for x in lut[m]]), code + 1
        )
    return (
        coded.select(*cols, adc.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(top)
    )


def pq_ivf_adc_topk(
    df: DataFrame,
    coarse_cb: list[list[list[int]]],
    codebook: list[list[list[int]]],
    query_int: list[int],
    n_probe: int = 2,
    top: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iq_df: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ scan: coarse cells prune the corpus to ``n_probe`` probed
    inverted lists, then the PQ ADC ranks only those candidates — the
    FAISS-style two-level layout that makes 100 TB ANN a partition-pruned
    scan instead of a full pass. ``coarse_cb`` is a 1-subspace codebook from
    :func:`pq_train_codebook` (``m_subspaces=1``); this variant encodes
    original vectors against a global PQ codebook (residual encoding is the
    classic refinement — the pruning/ADC plumbing is identical).

    At scale the corpus would be WRITTEN partitioned by ``cell`` (see
    sources/layout.py), turning the probe filter into partition pruning;
    here it evaluates in the scan's codegen stage. The whole query remains a
    projection + filter + TakeOrderedAndProject — zero joins, zero shuffles.

    Returns ``(vec_id, cell, adc_dist)`` — exact int64, hash-certifiable.
    """
    kc = len(coarse_cb[0])
    dim = len(coarse_cb[0][0])
    # probe selection is driver-side integer math over kc centroids
    cdist = [
        sum((query_int[d] - coarse_cb[0][c][d]) ** 2 for d in range(dim))
        for c in range(kc)
    ]
    probes = sorted(range(kc), key=lambda c: (cdist[c], c))[:n_probe]

    # iq_df: optional pre-built (id_col, iq) int-grid frame — same sharing
    # contract as pq_train_codebook
    iq = (
        iq_df
        if iq_df is not None
        else df.select(F.col(id_col).alias(id_col), _int_grid(vec_col).alias("iq"))
    )
    candidates = (
        _with_codes(iq, coarse_cb, prefix="_cell")
        .withColumn("cell", F.col("_cell0").cast("bigint"))
        .filter(F.col("cell").isin([int(p) for p in probes]))
        .drop("_cell0")
    )

    m_subspaces = len(codebook)
    k = len(codebook[0])
    sub_dim = len(codebook[0][0])
    lut = [
        [
            sum(
                (query_int[m * sub_dim + i] - codebook[m][c][i]) ** 2
                for i in range(sub_dim)
            )
            for c in range(k)
        ]
        for m in range(m_subspaces)
    ]
    coded = _with_codes(candidates, codebook, prefix="_c")
    adc = F.lit(0).cast("bigint")
    for m in range(m_subspaces):
        adc = adc + F.element_at(
            F.array(*[F.lit(int(x)).cast("bigint") for x in lut[m]]),
            F.col(f"_c{m}") + 1,
        )
    return (
        coded.select(id_col, "cell", adc.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(top)
    )


def _cell_and_residual(
    df: DataFrame,
    coarse_cb: list[list[list[int]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(vec_id, cell, iq)`` where ``iq`` is the RESIDUAL int vector
    (quantized vector minus its coarse centroid) — a pure projection against
    the literal kc×D coarse matrix."""
    kc = len(coarse_cb[0])
    centroid_matrix = F.array(
        *[F.array(*[F.lit(x) for x in coarse_cb[0][c]]) for c in range(kc)]
    )
    raw = df.select(F.col(id_col).alias("_id"), _int_grid(vec_col).alias("_raw"))
    return (
        _with_codes(raw, coarse_cb, iq_col="_raw", prefix="_cell")
        .withColumn("cell", F.col("_cell0"))
        .withColumn(
            "iq",
            F.zip_with(
                F.col("_raw"),
                F.element_at(centroid_matrix, F.col("cell") + 1),
                lambda x, y: x - y,
            ),
        )
        .select(F.col("_id"), F.col("cell").cast("bigint").alias("cell"), "iq")
    )


def pq_train_residual_codebook(
    df: DataFrame,
    coarse_cb: list[list[list[int]]],
    m_subspaces: int = 4,
    k: int = 16,
    n_rounds: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[int]]]:
    """Train the PQ codebook on coarse-cell RESIDUALS — the classic FAISS
    IVFPQ refinement: residual magnitudes are much smaller than raw vectors,
    so the same k centroids quantize them with less error."""
    return _train_on_iq(
        _cell_and_residual(df, coarse_cb, vec_col, id_col).select("_id", "iq"),
        m_subspaces,
        k,
        n_rounds,
    )


def pq_ivf_residual_adc_topk(
    df: DataFrame,
    coarse_cb: list[list[list[int]]],
    codebook: list[list[list[int]]],
    query_int: list[int],
    n_probe: int = 2,
    top: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Residual IVF-PQ scan: probe the ``n_probe`` cells nearest the query,
    encode each candidate's RESIDUAL against ``codebook``, and rank by the
    per-cell ADC table (the query's residual differs per probed cell, so the
    lookup is kc×M×k ints — still driver-trivial). Exact int64 end-to-end;
    still a projection + filter + TakeOrderedAndProject."""
    kc = len(coarse_cb[0])
    dim = len(coarse_cb[0][0])
    m_subspaces = len(codebook)
    k = len(codebook[0])
    sub_dim = len(codebook[0][0])

    cdist = [
        sum((query_int[d] - coarse_cb[0][c][d]) ** 2 for d in range(dim))
        for c in range(kc)
    ]
    probes = sorted(range(kc), key=lambda c: (cdist[c], c))[:n_probe]
    # per-cell query residual → per-(cell, m, code) ADC entries
    lut = [
        [
            [
                sum(
                    (
                        (query_int[m * sub_dim + i] - coarse_cb[0][cell][m * sub_dim + i])
                        - codebook[m][c][i]
                    )
                    ** 2
                    for i in range(sub_dim)
                )
                for c in range(k)
            ]
            for m in range(m_subspaces)
        ]
        for cell in range(kc)
    ]

    cand = _cell_and_residual(df, coarse_cb, vec_col, id_col).filter(
        F.col("cell").isin([int(p) for p in probes])
    )
    cand = _with_codes(cand, codebook, prefix="_c")
    adc = F.lit(0).cast("bigint")
    for m in range(m_subspaces):
        code = F.col(f"_c{m}")
        lut_m = F.array(
            *[
                F.array(*[F.lit(int(x)).cast("bigint") for x in lut[cell][m]])
                for cell in range(kc)
            ]
        )
        adc = adc + F.element_at(
            F.element_at(lut_m, F.col("cell").cast("int") + 1), code + 1
        )
    return (
        cand.select(F.col("_id").alias(id_col), "cell", adc.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(top)
    )
