"""WordPiece trainer/apply (operators/wordpiece.py) vs an INDEPENDENT
pure-Python implementation of the same spec — built round 9, driver
registration round 10 (the r9 certification window is slot-exact)."""

import re

import pytest

from unravelsports_spark.operators.wordpiece import (
    greedy_wordpiece,
    wordpiece_tokenize_stats,
    wordpiece_train,
)

CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wide wider widest wide wide wide"),
    (3, "the lowest of the low and the new"),
    (4, "newer and wider and lower"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _ref_train(texts, n_merges, min_pair_count=2):
    """Independent reference: same spec (likelihood-scored merges over the
    word-frequency table, exact integer cross-product compare, lexicographic
    ties, greedy left-to-right merge application), implemented directly."""
    words = {}
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            words[w] = words.get(w, 0) + 1
    segs = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in words
    }
    merges = []
    for _ in range(n_merges):
        pair_n, sym_n = {}, {}
        for w, n in words.items():
            s = segs[w]
            for x in s:
                sym_n[x] = sym_n.get(x, 0) + n
            for i in range(len(s) - 1):
                pair_n[(s[i], s[i + 1])] = pair_n.get((s[i], s[i + 1]), 0) + n
        best = None
        for (a, b), nab in pair_n.items():
            if nab < min_pair_count:
                continue
            if best is not None:
                (ba, bb), bnab = best
                lhs = nab * sym_n[ba] * sym_n[bb]
                rhs = bnab * sym_n[a] * sym_n[b]
                if lhs < rhs or (lhs == rhs and (a, b) >= (ba, bb)):
                    continue
            best = ((a, b), nab)
        if best is None:
            break
        (a, b), nab = best
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append((a, b, merged, nab))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    final = {}
    for w, n in words.items():
        for x in segs[w]:
            final[x] = final.get(x, 0) + n
    vocab = sorted(final.items(), key=lambda kv: (-kv[1], kv[0]))
    return merges, vocab


def test_wordpiece_train_matches_independent_reference(corpus_df):
    got_m, got_v = wordpiece_train(corpus_df, n_merges=12)
    want_m, want_v = _ref_train([t for _, t in CORPUS], 12)
    assert got_m == want_m
    assert got_v == want_v
    assert len(got_m) > 3  # the corpus supports real merges


def test_wordpiece_scoring_prefers_likelihood_over_raw_count(spark):
    """The pair with the highest raw count must LOSE to a rarer pair whose
    parts almost never occur apart — the criterion that separates
    WordPiece from BPE. 'qz' appears 3x and q/z never appear apart
    (score 3/(3*3)=1/3); 'ab' appears 4x but a and b are everywhere
    (score 4/(9*9)); BPE would merge (a, ##b) first."""
    rows = [(0, "ab ab ab ab a a a a a b b b b b qz qz qz")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges, _ = wordpiece_train(df, n_merges=1)
    assert merges[0][:2] == ("q", "##z")


def test_wordpiece_merge_application_is_greedy_nonoverlapping(spark):
    """'aaaa' under merge (a, ##a): greedy left-to-right pairs positions
    (1,2) and (3,4) — NOT a chain — matching the reference scan rule."""
    df = spark.createDataFrame([(0, "aaaa aaaa")], ["doc_id", "text"])
    merges, vocab = wordpiece_train(df, n_merges=1, min_pair_count=1)
    assert merges[0][:3] == ("a", "##a", "aa")
    v = dict(vocab)
    # merge (a, ##a) only applies where the FIRST symbol is the bare
    # word-start 'a', so 'aaaa' (symbols a ##a ##a ##a) → [aa, ##a, ##a]
    assert v["aa"] == 2 and v["##a"] == 4


def test_greedy_inference_longest_match_and_unk():
    vocab = {"un", "##aff", "##able", "##ab", "a", "##b", "unaff"}
    assert greedy_wordpiece("unaffable", vocab) == ["unaff", "##able"]
    assert greedy_wordpiece("ab", vocab) == ["a", "##b"]
    assert greedy_wordpiece("axb", vocab) is None  # no '##x' anywhere
    assert greedy_wordpiece("a", vocab) == ["a"]


def test_wordpiece_tokenize_stats_matches_per_occurrence(corpus_df, spark):
    """The vocab-bound apply (segment distinct words once, join back) must
    equal the per-occurrence computation — including an unsegmentable word
    (→ one [UNK] piece), a zero-word doc, and repeated words."""
    _, vocab = wordpiece_train(corpus_df, n_merges=12)
    extra = [(90, ""), (91, "low low low"), (92, "zzz low")]  # 'z' unseen
    df = corpus_df.unionByName(spark.createDataFrame(extra, ["doc_id", "text"]))
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_pieces"], r["n_unk"], r["pieces_per_100_words"]
        )
        for r in wordpiece_tokenize_stats(df, vocab).collect()
    }
    vset = {t for t, _ in vocab}
    want = {}
    for i, text in CORPUS + extra:
        ws = re.findall("[a-z0-9]+", text.lower())
        pieces = unk = 0
        for w in ws:
            seg = greedy_wordpiece(w, vset)
            if seg is None:
                pieces += 1
                unk += 1
            else:
                pieces += len(seg)
        want[i] = (len(ws), pieces, unk, 100 * pieces // len(ws) if ws else 0)
    assert got == want
    assert got[92][2] == 1  # the zzz doc carries exactly one [UNK]
    assert got[90] == (0, 0, 0, 0)


def test_wordpiece_train_deterministic(corpus_df):
    a = wordpiece_train(corpus_df, n_merges=8)
    b = wordpiece_train(corpus_df, n_merges=8)
    assert a == b


def test_wordpiece_train_releases_all_caches(corpus_df, spark):
    """r9 review regression: training re-persists the word table per round
    and must release EVERY handle on exit — the original form unpersisted
    a derived, never-cached plan and leaked the base cache for the
    session lifetime."""
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    wordpiece_train(corpus_df, n_merges=4)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before
