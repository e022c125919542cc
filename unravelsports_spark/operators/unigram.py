"""Unigram language-model tokenizer (SentencePiece's unigram algorithm,
Kudo 2018 "Subword Regularization", simplified to hard-EM) — the second
major subword-tokenizer family next to BPE (operators/bpe.py), trained
Spark-first (engine addition, SURVEY §2.12; driver registration r9).

The decisive scale observation (same as the BPE trainer's): training
never needs the corpus after ONE tokenize pass — it operates on the
(word, count) frequency table, which is vocabulary-sized. Every EM round
is therefore a distributed map over a tiny table with the current piece
vocabulary riding along as a broadcast dict:

1. **seed**: all substrings (length ≤ ``max_piece_len``) of the distinct
   words, weighted by word count — top-``seed_size`` by frequency, plus
   every single character (coverage guarantee: any word segments).
2. **E-step (hard)**: per word, Viterbi-segment against the current piece
   log-probabilities; emit each chosen piece ``count`` times. One
   mapInPandas pass over the word table; piece counts combine map-side.
3. **M-step**: piece probability = count / total (log domain).
4. **prune**: drop the lowest-count multi-char pieces down to
   ``shrink_factor`` of the current size (never below ``vocab_size``,
   never single chars), re-normalize, repeat.

Hard-EM (Viterbi counts instead of lattice posteriors) is a documented
simplification of the reference algorithm — it keeps every decision
deterministic (ties break on fewer pieces, then lexicographic piece
sequence), so a fixed (corpus, params) run is bit-reproducible and
golden-certifiable, the repo's m_*_cells pattern.

Determinism note: log-probabilities are IEEE doubles, but every score is
computed by the same expression tree on every executor and compared with
explicit tie-breaks, so segmentations — and therefore all COUNTS — are
exact integers end-to-end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import TOKEN_RE


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the ONE corpus-sized pass; everything
    downstream runs on this vocabulary-sized table."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def seed_vocab(
    words: DataFrame, max_piece_len: int = 4, seed_size: int = 512
) -> DataFrame:
    """(piece, freq) seed candidates: every substring of length ≤
    ``max_piece_len`` of every distinct word, weighted by the word's
    count; the top ``seed_size`` by (freq DESC, piece ASC) UNION all
    single characters (so coverage never breaks). The substring explode
    multiplies the WORD table (≤ len·max_piece_len substrings per word),
    never the corpus."""
    # piece lengths are FILTERED to <= length(word) before the position
    # sequence: sequence(1, length(word) - l + 1) with start > stop would
    # otherwise DESCEND (Spark defaults step to -1), emitting duplicate and
    # negative-position substrings for every word shorter than the piece
    # length and inflating their seed frequencies (caught by review; pinned
    # by test_seed_vocab_short_words_exact)
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform("
                f"filter(sequence(1, {int(max_piece_len)}), l -> l <= length(word)), "
                "l -> transform(sequence(1, length(word) - l + 1), "
                "s -> substring(word, s, l))))"
            )
        ).alias("piece"),
        F.col("n"),
    )
    freqs = subs.groupBy("piece").agg(F.sum("n").alias("freq"))
    top = (
        freqs.filter(F.length("piece") > 1)
        .orderBy(F.col("freq").desc(), "piece")
        .limit(int(seed_size))
    )
    chars = freqs.filter(F.length("piece") == 1)
    return top.unionByName(chars)


def _viterbi(word: str, logp: dict, max_len: int):
    """Best segmentation of ``word`` under piece log-probs: maximize
    Σ logp, ties → fewer pieces, then lexicographically smaller piece
    tuple. Returns the piece list (None if uncoverable — cannot happen
    when all single chars are in the vocab)."""
    n = len(word)
    # best[i] = (score, n_pieces, pieces_tuple) for word[:i]
    best = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for l in range(1, min(max_len, i) + 1):
            piece = word[i - l : i]
            lp = logp.get(piece)
            if lp is None or best[i - l] is None:
                continue
            s0, k0, p0 = best[i - l]
            c = (s0 + lp, k0 + 1, p0 + (piece,))
            if (
                cand is None
                or c[0] > cand[0]
                or (c[0] == cand[0] and (c[1], c[2]) < (cand[1], cand[2]))
            ):
                cand = c
        best[i] = cand
    return None if best[n] is None else list(best[n][2])


def _viterbi_piece_counts(words: DataFrame, logp: dict, max_len: int) -> DataFrame:
    """One hard-E-step over the (word, n) table: (piece, count) totals of
    the Viterbi segmentations. ``logp`` broadcasts inside the closure —
    piece vocabularies are small by construction."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            pieces, counts = [], []
            for w, n in zip(pdf["word"], pdf["n"]):
                seg = _viterbi(str(w), logp, max_len)
                if seg is None:  # uncoverable word: skip (chars guarantee
                    continue  # this never fires with a char-complete vocab)
                for p in seg:
                    pieces.append(p)
                    counts.append(int(n))
            yield pd.DataFrame({"piece": pieces, "count": counts})

    out = words.mapInPandas(run, "piece string, count long")
    return out.groupBy("piece").agg(F.sum("count").alias("count"))


def unigram_train(
    df: DataFrame,
    vocab_size: int = 128,
    max_piece_len: int = 4,
    seed_size: int = 512,
    iters: int = 3,
    shrink_factor: float = 0.75,
    text_col: str = "text",
):
    """Train the unigram tokenizer → list of (piece, count, logp_rounded)
    sorted by (count DESC, piece ASC), exactly ``vocab_size`` + chars
    entries or fewer. ``count`` is the final E-step's exact integer piece
    count — the certifiable payload; logp (rounded 6) is informational.

    Driver state: one piece dict per round (vocab-sized). Distributed
    state: the (word, n) table. Corpus passes: exactly one."""
    words = word_counts(df, text_col=text_col)
    words = words.persist()
    try:
        seed = seed_vocab(words, max_piece_len, seed_size).collect()
        freqs = {r["piece"]: int(r["freq"]) for r in seed}
        total = sum(freqs.values())
        logp = {p: math.log(f / total) for p, f in freqs.items()}
        counts = {}
        for _ in range(int(iters)):
            rows = _viterbi_piece_counts(words, logp, max_piece_len).collect()
            counts = {r["piece"]: int(r["count"]) for r in rows}
            # chars always survive (coverage); multi-char pieces keep the
            # top `shrink_factor` of current multi-char size, >= vocab_size
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )
            keep_n = max(int(vocab_size), int(len(multi) * shrink_factor))
            kept = dict(multi[:keep_n])
            for p in list(logp):
                if len(p) == 1:
                    kept[p] = counts.get(p, 0) + 1  # +1: smoothing keeps
                    # unused chars alive for coverage of unseen words
            tot = sum(kept.values())
            logp = {p: math.log(c / tot) for p, c in kept.items()}
        final = sorted(
            ((p, counts.get(p, 0)) for p in logp),
            key=lambda pc: (-pc[1], pc[0]),
        )
        keep = final[: int(vocab_size)]
        # chars beyond the cap stay for coverage
        keep += [(p, c) for p, c in final[int(vocab_size):] if len(p) == 1]
        return [(p, c, round(logp[p], 6)) for p, c in keep]
    finally:
        words.unpersist()


def segment_word_table(words: DataFrame, vocab, max_piece_len: int = 4) -> DataFrame:
    """Viterbi-segment a DISTINCT word table once → (word, n_pieces_word).
    ``vocab`` is ``unigram_train`` output (or any [(piece, count, logp)]
    list); probabilities rebuild from the integer counts. A word no piece
    set covers falls back to its character count (cannot happen with a
    char-complete trained vocab)."""
    import pandas as pd

    tot = sum(c for _, c, _ in vocab) or 1
    logp = {p: math.log((c if c > 0 else 1) / tot) for p, c, _ in vocab}

    def run(batches):
        for pdf in batches:
            ns = []
            for w in pdf["word"]:
                seg = _viterbi(str(w), logp, max_piece_len)
                ns.append(len(seg) if seg else len(str(w)))
            yield pd.DataFrame({"word": pdf["word"], "n_pieces_word": ns})

    return words.select("word").mapInPandas(run, "word string, n_pieces_word long")


def vocab_bound_stats(
    df: DataFrame,
    segment_words,
    sum_cols,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Shared scaffolding of every VOCAB-BOUND tokenizer apply (unigram
    Viterbi here; WordPiece greedy in operators/wordpiece.py — r9 review
    finding #5 extracted it): explode the corpus into (doc, word)
    occurrences, hand the DISTINCT word table to ``segment_words`` (a
    callable returning a (word, *stats) DataFrame — the only Python
    work, so it scales with vocabulary, not corpus), join the per-word
    stats back to occurrences, and aggregate per document.

    ``sum_cols`` maps each segmented stat column to its output name
    (e.g. ``[("n_pieces_word", "n_pieces")]``). Output columns:
    ``(id_col, n_words, *outputs, pieces_per_100_words)`` — the
    compression metric derives from ``n_pieces`` when present. The join's
    build side is the distinct-word table (Heaps-law bounded), so AQE
    broadcasts it at any realistic scale; no hint is forced in case a
    pathological corpus makes it big. Zero-word documents survive with
    all-zero stats via the left join back to the id spine. A 10× bigger
    corpus with the same vocabulary re-segments nothing — it only
    re-counts (probe: tools/scale_probe.py's unigram apply row)."""
    occ = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("word"),
    )
    seg = segment_words(occ.select("word").distinct())
    per_doc = (
        occ.join(seg, "word")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_words"),
            *[F.sum(src).alias(out) for src, out in sum_cols],
        )
    )
    out = (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            *[F.coalesce(out_, F.lit(0)).alias(out_) for _, out_ in sum_cols],
        )
    )
    if not any(out_ == "n_pieces" for _, out_ in sum_cols):
        # No n_pieces output requested: the compression metric has no input
        # (an unconditional F.expr over it would raise AnalysisException for
        # such callers — ADVICE r9 #1), so return the bare stats.
        return out
    return out.withColumn(
        "pieces_per_100_words",
        F.when(
            F.col("n_words") > 0, F.expr("div(100 * n_pieces, n_words)")
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    )


def unigram_tokenize_stats(
    df: DataFrame,
    vocab,
    max_piece_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained vocab: per document, the exact (n_words, n_pieces,
    pieces_per_100_words) under Viterbi segmentation — the compression
    metric tokenizer evaluations report. VOCAB-BOUND (VERDICT r8 #2/#3):
    Viterbi runs ONCE per DISTINCT word via :func:`segment_word_table`
    (the same table the trainer iterates) through the shared
    :func:`vocab_bound_stats` scaffolding."""
    return vocab_bound_stats(
        df,
        lambda words: segment_word_table(words, vocab, max_piece_len),
        [("n_pieces_word", "n_pieces")],
        id_col=id_col,
        text_col=text_col,
    )
