"""Round-12 registrations (VERDICT r11 #2/#3): the two r11-built,
twice-queued operators — boilerplate line removal and Hamming-LSH near-dup
mining — plus the round's new build, HTML/markup-to-text extraction (the
one genuinely missing crawl-pipeline stage VERDICT r11 identified: every
web corpus runs markup stripping BEFORE boilerplate removal and textnorm,
and the repo's text stages all assumed markup-free input).

Oracle styles (the corpus5/6/7 taxonomy):
- exact SQL, moved here from the r11 tests at registration time per the
  corpus7 discipline (t_boilerplate_strip ← tests/test_boilerplate.py,
  d_simhash_neardup ← tests/test_hamming.py) — the tests now IMPORT the
  canonical strings, so twin and oracle cannot drift.
- t_html_extract: the DuckDB twin re-runs the IDENTICAL regexp_replace
  chain (every pattern is written in the Java/RE2-portable subset — no
  backreferences, no lookaround — the scrub_pii discipline) over markup
  suffixes injected deterministically by doc_id, with the md5-prefix
  fingerprint sum certifying the exact extracted bytes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import read_table
from .relational import query

# ---------------------------------------------------------------------------
# t_boilerplate_strip (operators/boilerplate.py — built r11, registered r12)
# ---------------------------------------------------------------------------

#: canonical SQL twin (verified in tests/test_boilerplate.py since r11) —
#: per-source footer injected into ~half of each source's docs, keyed by
#: (doc_id // 20) % 2 because source IS doc_id % 20 (plain parity would be
#: constant per source), and a unique note into the rest (doc-frequency 1,
#: must never flag); the fingerprint sum pins the exact reassembled bytes
BOILERPLATE_SQL = """
    WITH aug AS (
      SELECT doc_id, source,
             text || chr(10) ||
             CASE WHEN (doc_id // 20) % 2 = 0
                  THEN 'visit the ' || source || ' portal today'
                  ELSE 'unique note ' || CAST(doc_id AS VARCHAR) END AS text
      FROM documents),
    lines AS (
      SELECT doc_id, source, parts[u.i] AS line, u.i AS pos
      FROM (SELECT doc_id, source, string_split(text, chr(10)) AS parts FROM aug),
           unnest(range(1, len(parts) + 1)) AS u(i)),
    freq AS (
      SELECT source, line, COUNT(*) AS doc_freq
      FROM (SELECT DISTINCT source, line, doc_id FROM lines) GROUP BY 1, 2),
    tot AS (SELECT source, COUNT(*) AS n_docs FROM aug GROUP BY 1),
    bp AS (SELECT f.source, f.line FROM freq f JOIN tot t USING (source)
           WHERE doc_freq >= GREATEST(5, CAST(CEIL(0.3 * n_docs) AS BIGINT))),
    flagged AS (
      SELECT l.doc_id, l.source, l.line, l.pos,
             (b.line IS NOT NULL) AS is_bp
      FROM lines l LEFT JOIN bp b ON l.source = b.source AND l.line = b.line),
    per_doc AS (
      SELECT doc_id, source,
             COUNT(*) AS lines_before,
             SUM(CASE WHEN is_bp THEN 0 ELSE 1 END) AS lines_after,
             SUM(length(line)) + COUNT(*) - 1 AS raw_chars,
             COALESCE(string_agg(CASE WHEN is_bp THEN NULL ELSE line END,
                                 chr(10) ORDER BY pos), '') AS clean_text
      FROM flagged GROUP BY 1, 2)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(lines_before) AS BIGINT) AS lines_before,
           CAST(SUM(lines_after) AS BIGINT) AS lines_after,
           CAST(SUM(raw_chars) AS BIGINT) AS chars_before,
           CAST(SUM(length(clean_text)) AS BIGINT) AS chars_after,
           CAST(SUM(CAST(('0x' || substring(md5(clean_text), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_sum
    FROM per_doc GROUP BY source
"""


@query("t_boilerplate_strip", oracle=BOILERPLATE_SQL)
def t_boilerplate_strip(spark, sf_dir):
    """Boilerplate line removal certified end to end (engine addition
    §2.12; the jusText/CCNet template-cleaning stage — left in, a shared
    footer inflates near-dup similarity between unrelated pages and drags
    quality signals toward the template): per doc a footer is injected in
    Catalyst — the SAME line across ~half of each source's docs (template;
    must flag at min_frac=0.3/min_docs=5) or a doc-unique note
    (doc-frequency 1; must never flag) — then boilerplate_flags detects
    and strip_boilerplate removes it, and the per-source rollup pins
    line/char counts before/after plus the SUM of 32-bit md5 prefixes of
    the reassembled clean text: the fingerprint sum certifies the exact
    surviving BYTES in original order, so a wrong threshold, a dropped
    content line, or an out-of-order reassembly flips the hash. Plan:
    explode → distinct-then-count (no Expand), totals and flags broadcast,
    ONE corpus-sized exchange (the per-doc reassembly aggregate)."""
    from ..operators.boilerplate import boilerplate_flags, strip_boilerplate

    docs = read_table(spark, sf_dir, "documents")
    footer = F.when(
        F.expr("(doc_id div 20) % 2 = 0"),
        F.concat(F.lit("visit the "), F.col("source"), F.lit(" portal today")),
    ).otherwise(F.concat(F.lit("unique note "), F.col("doc_id").cast("string")))
    aug = docs.select(
        "doc_id", "source", F.concat_ws("\n", "text", footer).alias("text")
    )
    stripped = strip_boilerplate(aug, boilerplate_flags(aug))
    fp = F.conv(F.substring(F.md5("clean_text"), 1, 8), 16, 10).cast("long")
    return stripped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("lines_before").alias("lines_before"),
        F.sum("lines_after").alias("lines_after"),
        F.sum("raw_chars").alias("chars_before"),
        F.sum(F.length("clean_text")).alias("chars_after"),
        F.sum(fp).alias("fp_sum"),
    )


# ---------------------------------------------------------------------------
# d_simhash_neardup (operators/hamming.py — built r10, registered r12 after
# two slot-budget deferrals; VERDICT r11 #2)
# ---------------------------------------------------------------------------


def hamming_twin_sql(src: str, threshold: int, bands: int = 4,
                     max_bucket: int = 10_000) -> str:
    """Canonical SQL twin of operators/hamming.hamming_neardup_pairs
    (verified in tests/test_hamming.py since r10, moved here at
    registration): band keys by arithmetic shift + mask, hot-bucket
    anti-join, co-bucketed self-join, exact bit_count(xor) verify."""
    width = 64 // bands
    mask = (1 << width) - 1
    return f"""
    WITH keyed AS (
      SELECT id AS _id, h AS _h, u.b AS band, (h >> (u.b * {width})) & {mask} AS key
      FROM {src}, unnest(range(0, {bands})) AS u(b)),
    hot AS (SELECT band, key FROM keyed GROUP BY 1, 2
            HAVING COUNT(*) > {max_bucket}),
    ok AS (SELECT k.* FROM keyed k ANTI JOIN hot USING (band, key))
    SELECT DISTINCT a._id AS id_a, b._id AS id_b,
           bit_count(xor(a._h, b._h)) AS hamming
    FROM ok a JOIN ok b ON a.band = b.band AND a.key = b.key AND a._id < b._id
    WHERE bit_count(xor(a._h, b._h)) <= {threshold}
    """


def _neardup_oracle() -> str:
    """The registered oracle: DuckDB recomputes the 64-bit fingerprints
    fully independently — the certified d_simhash SQL widened by the same
    integer arithmetic (sign bit set on odd ids so negative codes and
    arithmetic-shift band keys are genuinely exercised in the certified
    hash) — then mines pairs through :func:`hamming_twin_sql`."""
    from .pipeline import _simhash_sql

    src = f"""(
      WITH sh AS ({_simhash_sql(16)})
      SELECT doc_id AS id,
             xor(simhash + (simhash << 16) + ((doc_id % 7) << 32),
                 CASE WHEN doc_id % 2 = 1
                      THEN CAST(-9223372036854775808 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END) AS h
      FROM sh) fps"""
    return hamming_twin_sql(src, threshold=3)


@query("d_simhash_neardup", oracle=_neardup_oracle())
def d_simhash_neardup(spark, sf_dir):
    """Hamming-LSH near-dup mining certified end to end (engine addition
    §2.12; the pair-mining stage over 64-bit perceptual/simhash codes —
    at corpus scale "which pairs sit within distance t" is never
    answerable all-pairs): the corpus simhash (the certified d_simhash
    lineage) is widened into an id-mixed 64-bit code with the sign bit set
    on odd ids — negative codes, and the arithmetic-shift-plus-mask band
    keys they produce, are IN the certified hash — then
    hamming_neardup_pairs bands it (4×16 bits), anti-joins hot buckets,
    and verifies candidates with exact bit_count(xor) ≤ 3. Recall is
    pigeonhole-exact below the band count (pinned as a hypothesis law in
    tests/test_hamming.py). Plan: one projection fans each code into 4
    (band, key) rows; the self-join is co-bucketed on (band, key) — the
    only shuffle — with the hot-bucket cap before the quadratic step."""
    from ..operators.dedup import simhash
    from ..operators.hamming import hamming_neardup_pairs

    docs = read_table(spark, sf_dir, "documents")
    MIN64 = -(1 << 63)
    fps = simhash(docs, bits=16).select(
        F.col("doc_id").alias("id"),
        (
            F.col("simhash")
            + F.shiftleft(F.col("simhash"), 16)
            + F.shiftleft(F.pmod(F.col("doc_id"), F.lit(7)), 32)
        )
        .cast("bigint")
        .bitwiseXOR(
            F.when(F.pmod("doc_id", F.lit(2)) == 1, F.lit(MIN64))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        .alias("h"),
    )
    return hamming_neardup_pairs(fps, "h", "id", threshold=3, bands=4)


# ---------------------------------------------------------------------------
# t_html_extract (operators/htmltext.py — built round 12, VERDICT r11 #3:
# the crawl-ingest step BEFORE textnorm/boilerplate)
# ---------------------------------------------------------------------------

#: per-doc markup wrappers keyed by doc_id % 6 — the documents table is
#: markup-free (probed: zero '<', '>', '&' at sf0.01 AND sf0.1), so the
#: injections fully control the repertoire the query certifies. Each
#: variant exercises one removal/decode leg with ~1/6 of the corpus behind
#: it: inline tags+attributes, a script block whose CONTENT contains a
#: bare '<', style+comment blocks, the pinned entity set INCLUDING the
#: single-level &amp;amp; edge and a passthrough entity, and uppercase
#: tags + a void element.
_HTML_WRAPS = [
    ("", ""),
    ('<p class="intro">', " has <b>bold</b> and <i>italic</i></p>"),
    ("", '<script type="text/javascript">var x = 1 < 2; alert("hi");'
         "</script> after script"),
    ("<style>.c{color:red}</style>", "<!-- hidden comment --> tail"),
    ("", " &lt;tag&gt; &amp;amp; Tom &amp; Jerry &#39;q&#39;&nbsp;SP"
         " &copy; stays"),
    ('<DIV CLASS="x">', "</DIV><BR/> done"),
]


def _html_oracle() -> str:
    """DuckDB rebuilds the identical wrapped corpus and runs the IDENTICAL
    extraction chain (operators/htmltext.html_text_sql — one pattern table
    shared with the operator, parity-pinned in tests/test_htmltext.py)."""
    from ..operators.htmltext import html_text_sql

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    pres = ", ".join(lit(p) for p, _ in _HTML_WRAPS)
    sufs = ", ".join(lit(s) for _, s in _HTML_WRAPS)
    clean = html_text_sql("raw")
    return f"""
    WITH wrapped AS (
      SELECT source,
             (LIST_VALUE({pres}))[CAST(doc_id % 6 AS INT) + 1] || text ||
             (LIST_VALUE({sufs}))[CAST(doc_id % 6 AS INT) + 1] AS raw
      FROM documents),
    x AS (SELECT source, raw, {clean} AS clean FROM wrapped)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(length(raw)) AS BIGINT) AS total_raw_chars,
           CAST(SUM(length(clean)) AS BIGINT) AS total_clean_chars,
           CAST(SUM(CASE WHEN clean <> raw THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(SUM(CAST(('0x' || substring(md5(clean), 1, 8)) AS BIGINT))
             AS BIGINT) AS fp_sum
    FROM x GROUP BY source
    """


@query("t_html_extract", oracle=_html_oracle())
def t_html_extract(spark, sf_dir):
    """HTML/markup-to-text extraction certified end to end (engine
    addition §2.12; VERDICT r11 #3 — the stage every web-crawl pipeline
    runs before boilerplate removal and normalization): per doc a
    deterministic markup wrapper (see _HTML_WRAPS) is concatenated in
    Catalyst, operators/htmltext.extract_html_text strips blocks/tags and
    decodes the pinned entity set, and the per-source rollup pins raw/
    clean char counts, how many docs changed, and the SUM of 32-bit md5
    prefixes of the extracted text — the fingerprint sum certifies the
    exact extracted BYTES, so a wrong removal order, a double-decoded
    entity, or a tag fused to '' instead of ' ' flips the hash. Plan:
    pure projection (regexp_replace + literal replace chain inside
    whole-stage codegen, zero UDFs/shuffles) into one combinable
    groupBy."""
    from ..operators.htmltext import extract_html_text

    docs = read_table(spark, sf_dir, "documents")
    pre = F.element_at(
        F.array(*[F.lit(p) for p, _ in _HTML_WRAPS]),
        (F.col("doc_id") % 6).cast("int") + 1,
    )
    suf = F.element_at(
        F.array(*[F.lit(s) for _, s in _HTML_WRAPS]),
        (F.col("doc_id") % 6).cast("int") + 1,
    )
    raw = docs.select(
        "source", F.concat(pre, F.col("text"), suf).alias("raw")
    )
    cleaned = extract_html_text(raw, text_col="raw", out_col="clean")
    fp = F.conv(F.substring(F.md5("clean"), 1, 8), 16, 10).cast("long")
    return cleaned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("raw")).alias("total_raw_chars"),
        F.sum(F.length("clean")).alias("total_clean_chars"),
        F.sum((F.col("clean") != F.col("raw")).cast("long")).alias("n_changed"),
        F.sum(fp).alias("fp_sum"),
    )
