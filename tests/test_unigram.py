"""Unigram-LM tokenizer trainer (operators/unigram.py) vs an INDEPENDENT
pure-Python implementation of the same simplified algorithm, plus
structural and determinism properties. Built round 8; r9 registers the
sf-table training run as a golden-cells driver query."""

import math
import re

import pytest

from unravelsports_spark.operators.unigram import (
    _viterbi,
    seed_vocab,
    unigram_tokenize_stats,
    unigram_train,
    word_counts,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cats sat on the mats"),
    (2, "a catalog of cats and dogs"),
    (3, "the dog sat on the log"),
    (4, "dogs and cats and dogs and cats"),
]


def _ref_train(texts, vocab_size, max_len, seed_size, iters, shrink):
    """Independent reference: same simplified hard-EM spec, implemented
    directly (dict/loops, no shared helpers)."""
    words = {}
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            words[w] = words.get(w, 0) + 1
    freqs = {}
    for w, n in words.items():
        for l in range(1, max_len + 1):
            for s in range(len(w) - l + 1):
                p = w[s : s + l]
                freqs[p] = freqs.get(p, 0) + n
    multi = sorted(
        ((p, f) for p, f in freqs.items() if len(p) > 1),
        key=lambda pf: (-pf[1], pf[0]),
    )[:seed_size]
    vocab = dict(multi)
    for p, f in freqs.items():
        if len(p) == 1:
            vocab[p] = f
    total = sum(vocab.values())
    logp = {p: math.log(f / total) for p, f in vocab.items()}

    def viterbi(word):
        best = [None] * (len(word) + 1)
        best[0] = (0.0, 0, ())
        for i in range(1, len(word) + 1):
            cand = None
            for l in range(1, min(max_len, i) + 1):
                p = word[i - l : i]
                lp = logp.get(p)
                if lp is None or best[i - l] is None:
                    continue
                s0, k0, p0 = best[i - l]
                c = (s0 + lp, k0 + 1, p0 + (p,))
                if (
                    cand is None
                    or c[0] > cand[0]
                    or (c[0] == cand[0] and (c[1], c[2]) < (cand[1], cand[2]))
                ):
                    cand = c
            best[i] = cand
        return list(best[len(word)][2])

    counts = {}
    for _ in range(iters):
        counts = {}
        for w, n in words.items():
            for p in viterbi(w):
                counts[p] = counts.get(p, 0) + n
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        keep_n = max(vocab_size, int(len(multi) * shrink))
        kept = dict(multi[:keep_n])
        for p in list(logp):
            if len(p) == 1:
                kept[p] = counts.get(p, 0) + 1
        tot = sum(kept.values())
        logp = {p: math.log(c / tot) for p, c in kept.items()}
    final = sorted(
        ((p, counts.get(p, 0)) for p in logp), key=lambda pc: (-pc[1], pc[0])
    )
    keep = final[:vocab_size]
    keep += [(p, c) for p, c in final[vocab_size:] if len(p) == 1]
    return [(p, c, round(logp[p], 6)) for p, c in keep]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_unigram_train_matches_independent_reference(corpus_df):
    params = dict(vocab_size=12, max_piece_len=3, seed_size=40, iters=2)
    got = unigram_train(corpus_df, shrink_factor=0.75, **params)
    want = _ref_train(
        [t for _, t in CORPUS],
        params["vocab_size"], params["max_piece_len"], params["seed_size"],
        params["iters"], 0.75,
    )
    assert got == want
    # structural: every single char of the corpus survives (coverage)
    chars = {c for _, t in CORPUS for c in re.sub(r"[^a-z0-9]", "", t)}
    assert chars <= {p for p, _, _ in got if len(p) == 1}
    # useful multi-char pieces emerged ('cat'/'dog'/'the' family)
    multis = {p for p, _, _ in got if len(p) > 1}
    assert multis & {"cat", "dog", "the", "at", "og", "sat"}


def test_unigram_train_deterministic(corpus_df):
    a = unigram_train(corpus_df, vocab_size=10, iters=2, seed_size=30)
    b = unigram_train(corpus_df, vocab_size=10, iters=2, seed_size=30)
    assert a == b


def test_viterbi_tie_breaks_and_coverage():
    logp = {"ab": math.log(0.25), "a": math.log(0.5), "b": math.log(0.5)}
    # score('ab') = log .25 == score('a')+score('b'): tie → FEWER pieces
    assert _viterbi("ab", logp, 2) == ["ab"]
    # unknown chars force None only when chars are missing
    assert _viterbi("az", logp, 2) is None
    logp["z"] = math.log(0.1)
    assert _viterbi("az", logp, 2) == ["a", "z"]


def test_unigram_tokenize_stats(corpus_df, spark):
    vocab = unigram_train(corpus_df, vocab_size=12, iters=2, seed_size=40)
    rows = {
        r["doc_id"]: r
        for r in unigram_tokenize_stats(corpus_df, vocab).collect()
    }
    for i, text in CORPUS:
        ws = re.findall("[a-z0-9]+", text.lower())
        assert rows[i]["n_words"] == len(ws)
        # segmentation never exceeds character count, never undercuts words
        assert len(ws) <= rows[i]["n_pieces"] <= sum(len(w) for w in ws)
        assert rows[i]["pieces_per_100_words"] == 100 * rows[i]["n_pieces"] // len(ws)
    # a richer vocab never segments into MORE pieces than chars-only
    chars_only = [(p, c, lp) for p, c, lp in vocab if len(p) == 1]
    coarse = {
        r["doc_id"]: r["n_pieces"]
        for r in unigram_tokenize_stats(corpus_df, chars_only).collect()
    }
    for i, _ in CORPUS:
        assert rows[i]["n_pieces"] <= coarse[i]


def test_unigram_tokenize_stats_equals_per_occurrence_path(corpus_df, spark):
    """VERDICT r8 #3 equivalence gate: the vocab-bound apply (segment the
    DISTINCT word table once, join n_pieces back) must return EXACTLY what
    the old per-occurrence path computed — here re-derived independently
    with pure-Python Viterbi over every word occurrence — including a
    zero-word document and a repeated-word document."""
    from unravelsports_spark.operators.unigram import _viterbi as vit

    vocab = unigram_train(corpus_df, vocab_size=12, iters=2, seed_size=40)
    extra = [(90, ""), (91, "!!! ???"), (92, "cat cat cat cat")]
    df = corpus_df.unionByName(
        spark.createDataFrame(extra, ["doc_id", "text"])
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["pieces_per_100_words"])
        for r in unigram_tokenize_stats(df, vocab).collect()
    }

    tot = sum(c for _, c, _ in vocab) or 1
    logp = {p: math.log((c if c > 0 else 1) / tot) for p, c, _ in vocab}
    want = {}
    for i, text in CORPUS + extra:
        ws = re.findall("[a-z0-9]+", text.lower())
        pieces = 0
        for w in ws:  # per-occurrence: every repeat re-segments
            seg = vit(w, logp, 4)
            pieces += len(seg) if seg else len(w)
        pp100 = 100 * pieces // len(ws) if ws else 0
        want[i] = (len(ws), pieces, pp100)
    assert got == want


def test_seed_vocab_short_words_exact(spark):
    """Review regression: words SHORTER than max_piece_len must contribute
    each substring exactly once per word occurrence — Spark's sequence()
    descends when start > stop, which inflated short-word frequencies
    (freq('a') came back 10x on a 1-char word) and minted phantom
    negative-position substrings before the length filter."""
    df = spark.createDataFrame([(0, "a on a")], ["doc_id", "text"])
    w = word_counts(df)
    rows = {r["piece"]: r["freq"] for r in seed_vocab(w, max_piece_len=4).collect()}
    assert rows == {"a": 2, "o": 1, "n": 1, "on": 1}


def test_word_counts_and_seed_scale_shape(corpus_df):
    w = word_counts(corpus_df)
    assert w.filter("word = 'the'").head()["n"] == 6  # 2 each in docs 0/1/3
    sv = seed_vocab(w, max_piece_len=3, seed_size=10)
    rows = {r["piece"]: r["freq"] for r in sv.collect()}
    assert all(len(p) <= 3 for p in rows)
    # every single char present with its exact total frequency:
    # sum over word occurrences of the char count inside the word
    expect_t = sum(
        n * w.count("t")
        for w, n in ((r["word"], r["n"]) for r in w.collect())
    )
    assert rows["t"] == expect_t > 0
