"""Regenerate the literal VALUES / snapshot oracles for the round-9 twins in
plans/corpus5.py (mm_image_phash, t_unigram_vocab, t_unigram_tokens) from the
test-verified operators. Run after any INTENDED change to the pHash pipeline
or the unigram trainer/apply; an unintended change should instead flip the
driver hash. Prints the SQL blocks to paste into corpus5.py.

Usage: python tools/gen_corpus5_oracles.py  [sf_dir for t_unigram_tokens,
default /root/testdata/sf0.01 — the driver gate scale]
"""

import sys

sys.path.insert(0, ".")

from unravelsports_spark.session import get_spark  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    from unravelsports_spark.plans import QUERIES

    ph = sorted(
        map(tuple, QUERIES["mm_image_phash"](spark, sf).collect())
    )
    rows = ",\n".join(
        f"      (CAST({g} AS BIGINT), CAST({h} AS BIGINT))" for g, h in ph
    )
    print('        "mm_image_phash": """\n    SELECT * FROM (VALUES')
    print(rows)
    print('    ) AS t(grp, phash)\n    """,')

    vb = QUERIES["t_unigram_vocab"](spark, sf).collect()
    rows = ",\n".join(
        f"      ('{r['piece']}', CAST({r['count']} AS BIGINT), "
        f"CAST({r['logp']!r} AS DOUBLE))"
        for r in vb
    )
    print('        "t_unigram_vocab": """\n    SELECT * FROM (VALUES')
    print(rows)
    print('    ) AS t(piece, count, logp)\n    """,')

    tk = sorted(map(tuple, QUERIES["t_unigram_tokens"](spark, sf).collect()))
    rows = ",\n".join(
        f"      ('{s}', CAST({n} AS BIGINT), CAST({w} AS BIGINT), "
        f"CAST({p} AS BIGINT))"
        for s, n, w, p in tk
    )
    print('        "t_unigram_tokens": """\n    SELECT * FROM (VALUES')
    print(rows)
    print('    ) AS t(source, n_docs, total_words, total_pieces)\n    """,')


if __name__ == "__main__":
    main()
