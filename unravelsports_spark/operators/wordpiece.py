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

Spark-first scale shape (EXACTLY the unigram trainer's design,
operators/unigram.py): after ONE corpus tokenize pass the trainer operates
entirely on the (word, count) frequency table, which is vocabulary-sized
and persisted ONCE, IMMUTABLY. Per merge round:

1. the accepted merge list (driver state, O(n_merges)) rides into one
   mapInPandas pass that re-derives each word's current segmentation in
   Python and emits per-batch pre-aggregated pair + symbol counts
   (vocabulary-bounded rows, map-side combined before the shuffle);
2. the argmax is driver-side over the collected vocab-sized count table,
   compared as EXACT INTEGER cross-products
   (``n_ab * n_a' * n_b'  vs  n_ab' * n_a * n_b``) so no float ever
   decides a merge — ties break lexicographically on the pair.

The immutable-table + driver-model-in-closure shape is load-bearing: the
first implementation rebuilt the word table per round as
``withColumn(regexp_replace).persist()`` chains, and the r-th round's plan
nested r InMemoryRelations — ANALYSIS time grew superlinearly with rounds
(24 merges took minutes on a 31-word table) and the rebound handles leaked
caches. Re-deriving the segmentation from the merge list costs
O(n_merges² · vocab) bounded Python — embarrassingly parallel, constant
plan size, one persist handle.

Apply (:func:`wordpiece_tokenize_stats`) is VOCAB-BOUND like the unigram
apply: greedy segmentation runs once per DISTINCT word and joins back to
occurrences through the shared
:func:`~unravelsports_spark.operators.unigram.vocab_bound_stats`.

Everything is deterministic — fixed (corpus, params) reproduce the merge
list and all counts bit-for-bit — so the trainer is golden-cells
certifiable (the m_*_cells pattern), pinned in tests against an
independent pure-Python implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .unigram import word_counts

#: continuation prefix for word-internal symbols (BERT convention)
CONT = "##"


def _segment_word(word: str, merges) -> list:
    """Current segmentation of ``word`` under the accepted merge list:
    start from characters (continuations ``##``-prefixed), then apply each
    merge in training order with the greedy left-to-right non-overlapping
    scan — the executable spec the independent test reference mirrors."""
    syms = [word[0]] + [CONT + c for c in word[1:]] if word else []
    for a, b, merged in merges:
        out, i = [], 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _pair_and_symbol_counts(words: DataFrame, merges):
    """One mapInPandas pass over the immutable (word, n) table → collected
    {(a, b): n_pair} and {sym: n_sym} under the current merge list, both
    weighted by word count. Counts pre-aggregate per Arrow batch (a pair
    row carries ``b``, a symbol row a null ``b``), so the shuffle carries
    vocabulary-bounded rows."""
    import pandas as pd

    from pyspark.sql import functions as F

    mlist = list(merges)

    def run(batches):
        for pdf in batches:
            acc: dict = {}
            for w, n in zip(pdf["word"], pdf["n"]):
                syms = _segment_word(str(w), mlist)
                n = int(n)
                for x in syms:
                    k = (x, None)
                    acc[k] = acc.get(k, 0) + n
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    acc[k] = acc.get(k, 0) + n
            yield pd.DataFrame(
                {
                    "a": [k[0] for k in acc],
                    "b": [k[1] for k in acc],
                    "cnt": list(acc.values()),
                }
            )

    rows = (
        words.mapInPandas(run, "a string, b string, cnt long")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("cnt"))
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

    Driver state: the vocab-sized count tables per round plus the merge
    list. Distributed state: the (word, n) table, persisted once and
    never mutated. Corpus passes: exactly one (inside
    :func:`~unravelsports_spark.operators.unigram.word_counts`)."""
    words = word_counts(df, text_col=text_col).persist()
    try:
        merges = []
        rounds_left = int(n_merges)
        while True:
            pair_n, sym_n = _pair_and_symbol_counts(
                words, [(a, b, m) for a, b, m, _ in merges]
            )
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
            rounds_left -= 1
        vocab = sorted(sym_n.items(), key=lambda kv: (-kv[1], kv[0]))
        return merges, vocab
    finally:
        words.unpersist()


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
