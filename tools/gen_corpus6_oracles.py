"""Regenerate the literal VALUES / snapshot oracles for the round-10 twins in
plans/corpus6.py (t_wordpiece_vocab, mm_audio_mfcc, t_wordpiece_tokens) from
the test-verified operators. Run ONLY after an INTENDED change to the
WordPiece trainer/apply or the MFCC front end; an unintended change should
instead flip the driver hash. Prints the SQL blocks to paste into corpus6.py.

Regenerating also requires updating the md5 pins in
tests/test_snapshot_pins.py — that second, separate edit is deliberate: a
commit that silently re-snapshots an oracle alongside an operator change is
exactly the hole the pin test closes (VERDICT r9 #4).

Usage: python tools/gen_corpus6_oracles.py  [sf_dir for t_wordpiece_tokens,
default /root/testdata/sf0.01 — the driver gate scale]
"""

import sys

sys.path.insert(0, ".")

from unravelsports_spark.session import get_spark  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    from unravelsports_spark.plans import QUERIES

    vb = QUERIES["t_wordpiece_vocab"](spark, sf).collect()
    rows = ",\n".join(
        f"      ('{r['piece']}', CAST({r['count']} AS BIGINT))" for r in vb
    )
    print('        "t_wordpiece_vocab": """\n    SELECT * FROM (VALUES')
    print(rows)
    print('    ) AS t(piece, count)\n    """,')

    mf = sorted(map(tuple, QUERIES["mm_audio_mfcc"](spark, sf).collect()))
    rows = ",\n".join(
        f"      (CAST({g} AS BIGINT), CAST({i} AS BIGINT), "
        f"CAST({v!r} AS DOUBLE))"
        for g, i, v in mf
    )
    print('        "mm_audio_mfcc": """\n    SELECT * FROM (VALUES')
    print(rows)
    print('    ) AS t(grp, ci, coef)\n    """,')

    tk = sorted(map(tuple, QUERIES["t_wordpiece_tokens"](spark, sf).collect()))
    rows = ",\n".join(
        f"      ('{s}', CAST({n} AS BIGINT), CAST({w} AS BIGINT), "
        f"CAST({p} AS BIGINT), CAST({u} AS BIGINT))"
        for s, n, w, p, u in tk
    )
    print('        "t_wordpiece_tokens": """\n    SELECT * FROM (VALUES')
    print(rows)
    print('    ) AS t(source, n_docs, total_words, total_pieces, total_unk)\n    """,')


if __name__ == "__main__":
    main()
