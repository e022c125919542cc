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
    fold with a string accumulator seeded by the first token."""
    tail = F.slice(arr_col, 2, F.greatest(F.size(arr_col) - 1, F.lit(0)))

    def step(acc, x):
        hit = ((acc == F.lit(a)) | acc.endswith(SEP + a)) & (x == F.lit(b))
        merged = F.concat(
            F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(a))),
            F.lit(a + JOIN + b),
        )
        return F.when(hit, merged).otherwise(F.concat(acc, F.lit(SEP), x))

    return F.aggregate(tail, F.element_at(arr_col, 1), step)


def bpe_train_merges(
    df: DataFrame,
    num_merges: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn ``num_merges`` BPE merges on the corpus → one row per merge:
    (step, left_tok, right_tok, pair_count). Integer-exact and
    deterministic (ties by lexicographic pair), so the unrolled DuckDB
    oracle reproduces the identical merge sequence."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    cur = (
        df.select(id_col, F.concat_ws(SEP, toks).alias("s"))
        .filter(F.col("s") != "")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    persisted = [cur]
    merges = []
    try:
        for step_no in range(1, num_merges + 1):
            arr = F.split(F.col("s"), SEP)
            idx = F.when(
                F.size(arr) >= 2, F.sequence(F.lit(0), F.size(arr) - 2)
            ).otherwise(F.array().cast("array<int>"))
            prs = F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(arr, i + 1).alias("a"),
                    F.element_at(arr, i + 2).alias("b"),
                ),
            )
            best = (
                cur.select(F.explode(prs).alias("p"))
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
                id_col, _fold_merge(F.split(F.col("s"), SEP), a, b).alias("s")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(nxt)
            cur = nxt
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
        out = out.select(id_col, _fold_merge(F.split(F.col("s"), SEP), a, b).alias("s"))
    return out.select(id_col, F.split(F.col("s"), SEP).alias("tokens"))
