"""Tokenizer-family walk on the synthetic corpus: train all three subword
tokenizers the engine ships — BPE (count-scored merges), unigram-LM
(SentencePiece hard-EM), and WordPiece (likelihood-scored merges) — on the
same documents, then compare their compression (pieces per 100 words) with
each family's vocab-bound apply. The fertility comparison is the standard
tokenizer-evaluation report.

Run: python examples/tokenizer_pipeline.py  [SPARK_GRAFT_SF_DIR overrides
the default /root/testdata/sf0.001]. Every step is the public operator the
certified driver queries use (t_bpe_merges / t_unigram_vocab lineage).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark, sf_dir: str) -> dict:
    import pyspark.sql.functions as F

    from unravelsports_spark.operators.bpe import bpe_apply, bpe_train_merges
    from unravelsports_spark.operators.unigram import (
        unigram_tokenize_stats,
        unigram_train,
    )
    from unravelsports_spark.operators.wordpiece import (
        wordpiece_tokenize_stats,
        wordpiece_train,
    )
    from unravelsports_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")

    # 1. train the three families on the same corpus (each trainer runs on
    # a vocabulary-sized table after ONE corpus tokenize pass). Note the
    # granularity difference: this engine's BPE merges adjacent WORDS
    # (corpus-level merges, tokens-per-100-words <= 100 — merging
    # compresses), while unigram and WordPiece segment WITHIN words
    # (pieces-per-100-words >= 100 — smaller vocab costs more pieces).
    bpe_merges = [
        (r.left_tok, r.right_tok)
        for r in bpe_train_merges(docs, num_merges=8).orderBy("step").collect()
    ]
    uni_vocab = unigram_train(docs, vocab_size=96, iters=2, seed_size=384)
    wp_merges, wp_vocab = wordpiece_train(docs, n_merges=24)

    # 2. apply each trained model and report corpus-level compression
    # (the subword applies are vocab-bound: segmentation runs once per
    # DISTINCT word and joins back to occurrences)
    bpe_tokens = int(
        bpe_apply(docs, bpe_merges).agg(F.sum(F.size("tokens"))).collect()[0][0]
    )

    def fertility(stats_df):
        r = stats_df.agg(
            F.sum("n_words").alias("w"), F.sum("n_pieces").alias("p")
        ).collect()[0]
        return int(r["w"]), int(r["p"]), round(100.0 * r["p"] / r["w"], 2)

    uni_f = fertility(unigram_tokenize_stats(docs, uni_vocab))
    wp_stats = wordpiece_tokenize_stats(docs, wp_vocab)
    wp_f = fertility(wp_stats)
    n_unk = int(wp_stats.agg(F.sum("n_unk")).collect()[0][0])
    # the word total already fell out of the unigram stats aggregate — a
    # separate corpus-wide re-tokenize pass just to count words would
    # contradict the one-corpus-pass story (r9 review finding)
    n_words = uni_f[0]

    return {
        "bpe_merges": len(bpe_merges),
        "unigram_vocab": len(uni_vocab),
        "wordpiece_merges": len(wp_merges),
        "wordpiece_vocab": len(wp_vocab),
        "n_words": n_words,
        # word-level BPE: (total words, total tokens, tokens per 100 words)
        "fertility_bpe": (n_words, bpe_tokens, round(100.0 * bpe_tokens / n_words, 2)),
        # subword families: (total words, total pieces, pieces per 100 words)
        "fertility_unigram": uni_f,
        "fertility_wordpiece": wp_f,
        "wordpiece_unk": n_unk,
        "top_wp_merges": [m[2] for m in wp_merges[:5]],
    }


if __name__ == "__main__":
    from unravelsports_spark.session import get_spark

    spark = get_spark("example-tokenizer-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    result = main(spark, sf_dir)
    for k, v in result.items():
        print(f"{k}: {v}")
    spark.stop()
