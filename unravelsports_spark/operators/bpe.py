"""Distributed BPE merge training (engine addition §2.12).

The textbook corpus-level BPE trainer expressed Spark-first: each merge
round is (1) one generator pass producing adjacent token pairs (sequence +
transform + explode — zero joins), (2) one map-side-combinable count
aggregation, (3) a one-row argmax to the driver (count DESC, then
lexicographic pair — fully deterministic), and (4) a pure-projection fold
applying the merge greedily left-to-right inside each document via
``F.aggregate``. The corpus itself never shuffles; only (pair → count)
rows do. Production fast-BPE implementations update pair counts
incrementally per merge; at corpus scale the recount-per-round form keeps
every pass embarrassingly parallel and is how distributed trainers
(e.g. Spark/MapReduce wordpiece pipelines) actually run small merge
budgets.

Merged tokens are joined with ``~`` (outside the ``[a-z0-9]+`` token
alphabet), and the running tokenization is carried as one
``\\x1f``-separated string column so the greedy fold is a plain string
accumulator — the formulation an exact DuckDB oracle can mirror with
``list_reduce`` (plans/corpus3.py:t_bpe_merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import TOKEN_RE

#: token separator inside the carried tokenization string (never in tokens)
SEP = "\x1f"
#: join mark inside a merged token (outside the token alphabet)
JOIN = "~"


def _fold_merge(arr_col, a: str, b: str):
    """Greedy left-to-right application of merge (a, b) over a token array:
    fold with a string accumulator seeded by the first token. Retained as
    the executable specification (tests assert :func:`_merge_via_regex`
    equals it); the hot path uses the regex form — this fold re-copies the
    whole accumulator per token (O(len²) chars per document) and the HOF
    lambda is interpreted per element."""
    tail = F.slice(arr_col, 2, F.greatest(F.size(arr_col) - 1, F.lit(0)))

    def step(acc, x):
        hit = ((acc == F.lit(a)) | acc.endswith(SEP + a)) & (x == F.lit(b))
        merged = F.concat(
            F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(a))),
            F.lit(a + JOIN + b),
        )
        return F.when(hit, merged).otherwise(F.concat(acc, F.lit(SEP), x))

    return F.aggregate(tail, F.element_at(arr_col, 1), step)


def _merge_via_regex(s_col, a: str, b: str):
    """Greedy left-to-right application of merge (a, b) over the
    SEP-joined tokenization string via ``regexp_replace`` — semantically
    IDENTICAL to :func:`_fold_merge` (property-tested head-to-head):

    - Java's replaceAll scans left-to-right and resumes AFTER each
      replacement, which is exactly greedy BPE ("a a a" with merge (a, a)
      -> "a~a a", the third token untouched);
    - a freshly merged token can never equal the left token of the SAME
      merge (the JOIN mark is outside the token alphabet), so not
      re-scanning the replacement is correct;
    - token boundaries are enforced by the captured prefix (^ or SEP) and
      the (?=SEP|$) lookahead, so "ab SEP c" can't match merge (b, c).

    Linear per document and whole-stage-codegen'd vs the fold's
    interpreted O(len²) accumulator: 5-round training at sf0.1 went
    13.1 s -> measured below in plans/corpus3.py."""
    pat = f"(^|{SEP})\\Q{a}\\E{SEP}\\Q{b}\\E(?={SEP}|$)"
    return F.regexp_replace(s_col, pat, f"$1{a}{JOIN}{b}")


def bpe_train_merges(
    df: DataFrame,
    num_merges: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn ``num_merges`` BPE merges on the corpus → one row per merge:
    (step, left_tok, right_tok, pair_count). Integer-exact and
    deterministic (ties by lexicographic pair), so the unrolled DuckDB
    oracle reproduces the identical merge sequence.

    Driver payload bound: each round collects exactly ONE argmax row (the
    winning pair) — ``num_merges`` rows total regardless of corpus size;
    the pair counting itself is a map-side-combinable distributed agg."""
    spark = df.sparkSession
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    cur = (
        df.select(id_col, F.concat_ws(SEP, toks).alias("s"))
        .filter(F.col("s") != "")
        # default persist = MEMORY_AND_DISK_DESER: the serialized level read
        # ~40x slower per argmax pass (every round re-deserialized the
        # cached corpus strings)
        .persist()
    )
    persisted = [cur]
    merges = []
    try:
        for step_no in range(1, num_merges + 1):
            arr = F.split(F.col("s"), SEP)
            best = (
                cur.select(F.explode(_pair_structs(arr)).alias("p"))
                .groupBy("p.a", "p.b")
                .agg(F.count("*").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, cnt = best[0].a, best[0].b, best[0].cnt
            merges.append((step_no, a, b, cnt))
            nxt = cur.select(
                id_col, _merge_via_regex(F.col("s"), a, b).alias("s")
            ).persist()
            persisted.append(nxt)
            cur = nxt
    finally:
        for p in persisted:
            p.unpersist()
    return spark.createDataFrame(
        merges, "step int, left_tok string, right_tok string, pair_count bigint"
    )


def _pair_structs(arr):
    """Adjacent-pair structs over a token array (the shared generator):
    ``arrays_zip`` of the array with its own 1-shifted slice. All native
    expressions — the earlier higher-order ``transform`` lambda cost ~3.5 s
    of plan compilation PER ROUND (each merge round is a fresh plan with
    new literals, so codegen never amortizes; measured 10x at sf0.1), while
    this zip form compiles in ~0.3 s and produces identical (a, b) rows.
    Empty/1-token arrays zip to an empty array (slice of negative length ->
    empty), same as before."""
    n = F.size(arr)
    return F.arrays_zip(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
    )


def bpe_train_merges_incremental(
    df: DataFrame,
    num_merges: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`bpe_train_merges` with incremental pair-count maintenance —
    the variant that reaches real vocab budgets (32k merges) at corpus scale.

    The recount-per-round trainer re-explodes the WHOLE corpus every round;
    after the first few merges almost no document contains the winning pair,
    so nearly all of that work recomputes unchanged counts. This trainer
    keeps the (pair → count) table as persisted state and, each round:

    1. takes the argmax merge from the maintained count table (1 row);
    2. filters the corpus to documents actually containing the winning
       adjacent pair — a codegen'd regex on the carried tokenization string,
       no explode for the untouched remainder;
    3. explodes ONLY the affected documents twice (pairs before / after the
       greedy fold) and aggregates the signed difference — the bounded
       delta;
    4. merges the delta into the count table (full-outer sum, zero rows
       dropped) and rewrites affected documents in place via a conditional
       projection (unaffected rows pass through untouched).

    Counts after every round are exactly the recount-from-scratch counts
    (unaffected documents contribute zero delta by construction), so the
    learned merge sequence is identical — asserted in
    tests/test_bpe.py::test_incremental_matches_recount_trainer. Determinism
    matches the recount path: count DESC, then lexicographic (a, b).

    Scale shape per round: one filter scan of the corpus (no shuffle), one
    delta aggregation over affected docs only, one broadcast-size outer
    merge of the count table. The corpus shuffles zero times; the count
    table (≤ vocab² observed pairs, in practice ~vocab size) is the only
    iterated state — the same "small iterated state, big static corpus"
    decomposition as pagerank (operators/components.py).

    Measured envelope (local[32], sf0.01 documents, 12 merges): recount
    ≈0.69 s/round vs incremental ≈2.1 s/round — at tiny scale and small
    budgets the early winning pairs occur in most documents, so the delta
    explode covers nearly the whole corpus while the maintenance machinery
    (regex filter, outer merge, materialize) is pure overhead. The variants
    cross over when the affected-document fraction falls (real corpora,
    budgets in the thousands, where round N's winning pair touches a
    vanishing share of documents): recount's per-round cost is a full
    corpus explode + shuffle forever, incremental's decays with the
    affected fraction. Use recount for small merge budgets, incremental for
    vocab-scale training.
    """
    spark = df.sparkSession
    persisted = []

    def keep(d):
        d = d.persist()
        persisted.append(d)
        return d

    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    cur = keep(
        df.select(id_col, F.concat_ws(SEP, toks).alias("s")).filter(F.col("s") != "")
    )
    arr0 = F.split(F.col("s"), SEP)
    counts = keep(
        cur.select(F.explode(_pair_structs(arr0)).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    merges = []
    try:
        for step_no in range(1, num_merges + 1):
            best = (
                counts.filter(F.col("cnt") > 0)
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, cnt = best[0].a, best[0].b, int(best[0].cnt)
            merges.append((step_no, a, b, cnt))
            if step_no == num_merges:
                break  # no need to maintain state past the last learned merge
            # tokens are [a-z0-9~]+ — regex-metachar-free, so the literal
            # boundary pattern is safe
            pat = f"(^|{SEP}){a}{SEP}{b}({SEP}|$)"
            hit = F.col("s").rlike(pat)
            affected = cur.filter(hit)
            folded = keep(
                affected.select(
                    id_col, F.col("s").alias("s_old"),
                    _merge_via_regex(F.col("s"), a, b).alias("s_new"),
                )
            )
            old_pairs = folded.select(
                F.explode(_pair_structs(F.split(F.col("s_old"), SEP))).alias("p")
            ).select("p.a", "p.b", F.lit(-1).alias("d"))
            new_pairs = folded.select(
                F.explode(_pair_structs(F.split(F.col("s_new"), SEP))).alias("p")
            ).select("p.a", "p.b", F.lit(1).alias("d"))
            delta = (
                old_pairs.unionAll(new_pairs)
                .groupBy("a", "b")
                .agg(F.sum("d").cast("long").alias("dcnt"))
                .filter(F.col("dcnt") != 0)
            )
            counts = keep(
                counts.join(delta, ["a", "b"], "full_outer")
                .select(
                    "a", "b",
                    (
                        F.coalesce(F.col("cnt"), F.lit(0))
                        + F.coalesce(F.col("dcnt"), F.lit(0))
                    )
                    .cast("long")
                    .alias("cnt"),
                )
                .filter(F.col("cnt") > 0)
            )
            cur = keep(
                cur.select(
                    id_col,
                    F.when(hit, _merge_via_regex(F.col("s"), a, b))
                    .otherwise(F.col("s"))
                    .alias("s"),
                )
            )
            counts.count()  # materialize before the next argmax reads it
    finally:
        for p in persisted:
            p.unpersist()
    return spark.createDataFrame(
        merges, "step int, left_tok string, right_tok string, pair_count bigint"
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned merge list: the merges are applied in
    training order as a chain of pure-projection folds — no shuffle at all;
    the whole tokenizer is one codegen'd projection. Returns (id, tokens
    array) with merged units joined by '~'."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    out = df.select(id_col, F.concat_ws(SEP, toks).alias("s")).filter(F.col("s") != "")
    for a, b in merges:
        out = out.select(id_col, _merge_via_regex(F.col("s"), a, b).alias("s"))
    return out.select(id_col, F.split(F.col("s"), SEP).alias("tokens"))
