"""WordPiece tokenizer training + apply (engine addition §2.12; built in
round 9, driver registration round 10) — the third major subword family
next to BPE (operators/bpe.py) and unigram-LM (operators/unigram.py).

Algorithm (Schuster & Nakajima 2012 as popularized by BERT's reference
implementation): start from characters (word-internal continuations carry
the ``##`` prefix) and repeatedly merge the adjacent symbol pair that
maximizes the LIKELIHOOD score ``count(ab) / (count(a) * count(b))`` —
BPE's criterion is raw ``count(ab)``; WordPiece normalizes by the parts'
frequencies, preferring pairs whose parts rarely occur apart. Inference is
NOT score-based: it is greedy longest-match-first against the final vocab
(the standard WordPiece tokenizer), with whole-word ``[UNK]`` fallback.

Spark-first scale shape (the unigram trainer's decisive observation,
operators/unigram.py): after ONE corpus tokenize pass the trainer operates
entirely on the (word, count) frequency table, which is vocabulary-sized.
Per merge round:

1. one map-side-combinable aggregation over the word table emits adjacent
   pair counts AND single-symbol counts (a union of two explodes of the
   same symbol array — both vocabulary-bounded, never corpus-sized);
2. the argmax is driver-side over the collected vocab-sized count table,
   compared as EXACT INTEGER cross-products
   (``n_ab * n_a' * n_b'  vs  n_ab' * n_a * n_b``) so no float ever
   decides a merge — ties break lexicographically on the pair;
3. the merge applies to the word table as one projection (regexp replace
   over a SEP-joined symbol string, the BPE discipline).

Apply (:func:`wordpiece_tokenize_stats`) is VOCAB-BOUND like the unigram
apply: greedy segmentation runs once per DISTINCT word and joins back to
occurrences.

Everything is deterministic — fixed (corpus, params) reproduce the merge
list and all counts bit-for-bit — so the trainer is golden-cells
certifiable (the m_*_cells pattern), pinned in tests against an
independent pure-Python implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .unigram import word_counts

#: symbol separator inside the carried segmentation string (never in text)
SEP = "\x1f"
#: continuation prefix for word-internal symbols (BERT convention)
CONT = "##"


def _word_symbols(word_col):
    """word → SEP-joined initial symbol string: first char bare, every
    following char ``##``-prefixed (``"cat"`` → ``"c\\x1f##a\\x1f##t"``)."""
    first = F.substring(word_col, 1, 1)
    rest = F.substring(word_col, F.lit(2), F.length(word_col) - 1)
    tail = F.regexp_replace(rest, "(.)", SEP + CONT + "$1")
    return F.concat(first, tail)


def _apply_merge(sym_col, a: str, b: str):
    """Greedy left-to-right application of merge (a, b) over the SEP-joined
    symbol string: ``a SEP b`` → merged token ``a + strip_cont(b)`` (the
    ``##`` of b disappears into the merge; the result keeps a's prefix
    status). Anchored alternation with a guard group exactly like the BPE
    regex form — non-overlapping left-to-right replacement IS the greedy
    fold when the pattern consumes both symbols."""
    merged = a + (b[len(CONT):] if b.startswith(CONT) else b)
    import re as _re

    pat = f"(^|{SEP}){_re.escape(a)}{SEP}{_re.escape(b)}(?={SEP}|$)"
    return F.regexp_replace(sym_col, pat, "$1" + merged.replace("$", r"\$"))


def _pair_and_symbol_counts(words: DataFrame):
    """One aggregation over the (word, n, syms) table → collected
    {(a, b): n_pair} and {sym: n_sym}, both weighted by word count.
    Symbols and pairs ride one exploded union (a pair row carries ``b``,
    a symbol row a null ``b``), so the round costs ONE job."""
    arr = F.split(F.col("syms"), SEP)
    pairs = F.expr(
        "transform(slice(_a, 1, greatest(size(_a) - 1, 0)), "
        "(x, i) -> struct(x as a, element_at(_a, i + 2) as b))"
    )
    singles = F.expr("transform(_a, x -> struct(x as a, cast(null as string) as b))")
    rows = (
        words.select(F.col("n"), arr.alias("_a"))
        .select("n", F.explode(F.concat(pairs, singles)).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
        .collect()
    )
    pair_n = {(r["a"], r["b"]): int(r["cnt"]) for r in rows if r["b"] is not None}
    sym_n = {r["a"]: int(r["cnt"]) for r in rows if r["b"] is None}
    return pair_n, sym_n


def wordpiece_train(
    df: DataFrame,
    n_merges: int = 32,
    min_pair_count: int = 2,
    text_col: str = "text",
):
    """Train WordPiece → (merges, vocab): ``merges`` is the ordered list of
    (a, b, merged, n_pair) decisions; ``vocab`` the final symbol table as
    a sorted list of (token, count) with exact integer counts from the
    final segmentation state. Stops early when no pair reaches
    ``min_pair_count``.

    Driver state: the vocab-sized count tables per round. Distributed
    state: the (word, n, syms) table, RE-PERSISTED per round (the BPE
    trainer's discipline): each round's count job materializes the current
    cache, the previous round's cache is then released, and the next
    round's merge is ONE regexp projection over the cached table — without
    the per-round persist, round r would replay all r-1 chained
    regexp_replace projections (O(n_merges²) passes) and the
    finally-block would unpersist a derived, never-cached plan, leaking
    the original cache for the session lifetime (r9 review finding).
    Corpus passes: exactly one (inside
    :func:`~unravelsports_spark.operators.unigram.word_counts`)."""
    cur = word_counts(df, text_col=text_col).withColumn(
        "syms", _word_symbols(F.col("word"))
    ).persist()
    prev = None
    try:
        merges = []
        rounds_left = int(n_merges)
        while True:
            # materializes `cur`'s cache — safe to drop the previous one
            pair_n, sym_n = _pair_and_symbol_counts(cur)
            if prev is not None:
                prev.unpersist()
                prev = None
            if rounds_left <= 0:
                break
            best = None
            for (a, b), nab in pair_n.items():
                if nab < min_pair_count:
                    continue
                na, nb = sym_n[a], sym_n[b]
                if best is not None:
                    bnab, bna, bnb = best[1], sym_n[best[0][0]], sym_n[best[0][1]]
                    # exact fraction compare: nab/(na*nb) vs bnab/(bna*bnb)
                    lhs = nab * bna * bnb
                    rhs = bnab * na * nb
                    if lhs < rhs or (lhs == rhs and (a, b) >= best[0]):
                        continue
                best = ((a, b), nab)
            if best is None:
                break
            (a, b), nab = best
            merged = a + (b[len(CONT):] if b.startswith(CONT) else b)
            merges.append((a, b, merged, nab))
            prev, cur = cur, cur.withColumn(
                "syms", _apply_merge(F.col("syms"), a, b)
            ).persist()
            rounds_left -= 1
        vocab = sorted(sym_n.items(), key=lambda kv: (-kv[1], kv[0]))
        return merges, vocab
    finally:
        if prev is not None:
            prev.unpersist()
        cur.unpersist()


def greedy_wordpiece(word: str, vocab: set, max_token_len: int = 64):
    """Standard WordPiece inference: longest-match-first from the left;
    continuations look up with the ``##`` prefix. Returns the piece list,
    or None if any position fails to match (caller maps to [UNK])."""
    pieces = []
    i, n = 0, len(word)
    while i < n:
        end = min(n, i + max_token_len)
        cur = None
        while end > i:
            sub = word[i:end]
            cand = (CONT + sub) if i > 0 else sub
            if cand in vocab:
                cur = cand
                break
            end -= 1
        if cur is None:
            return None
        pieces.append(cur)
        i = end
    return pieces


def wordpiece_tokenize_stats(
    df: DataFrame,
    vocab,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained vocab: per document (n_words, n_pieces, n_unk,
    pieces_per_100_words) under greedy longest-match segmentation — an
    unsegmentable word counts as ONE [UNK] piece (the BERT tokenizer
    rule). VOCAB-BOUND through the shared
    :func:`~unravelsports_spark.operators.unigram.vocab_bound_stats`
    scaffolding (r9 review finding #5): greedy matching — the only Python
    work — runs once per DISTINCT word and joins back to occurrences;
    zero-word documents survive as (0, 0, 0, 0)."""
    import pandas as pd

    from .unigram import vocab_bound_stats

    vset = {t for t, _ in vocab} if vocab and isinstance(vocab[0], tuple) else set(vocab)

    def seg(batches):
        for pdf in batches:
            np_, nu = [], []
            for w in pdf["word"]:
                pieces = greedy_wordpiece(str(w), vset)
                if pieces is None:
                    np_.append(1)
                    nu.append(1)
                else:
                    np_.append(len(pieces))
                    nu.append(0)
            yield pd.DataFrame(
                {"word": pdf["word"], "n_pieces_word": np_, "n_unk_word": nu}
            )

    def segment_words(words):
        return words.mapInPandas(
            seg, "word string, n_pieces_word long, n_unk_word long"
        )

    return vocab_bound_stats(
        df,
        segment_words,
        [("n_pieces_word", "n_pieces"), ("n_unk_word", "n_unk")],
        id_col=id_col,
        text_col=text_col,
    )
