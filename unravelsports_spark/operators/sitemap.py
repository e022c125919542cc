"""Sitemap ingestion (engine addition §2.12; built round 13, driver
registration queued r14 as `t_sitemap_extract`) — the third leg of the
crawl-planning triad: sitemap DISCOVERY (this module) feeds frontier
SCHEDULING (operators/frontier.py) under robots COMPLIANCE
(operators/robots.py). A sitemaps.org document is either a ``<urlset>``
(entries = ``<url>`` blocks with ``<loc>`` + optional ``<lastmod>``) or a
``<sitemapindex>`` (entries = ``<sitemap>`` blocks pointing at child
sitemaps); a crawler extracts the locs, fetches child sitemaps from index
rows, and schedules the urlset rows.

Spark-first shape (pure Catalyst, exactly SQL-certifiable): entry blocks
come from ONE ``regexp_extract_all`` + ``posexplode`` per document —
patterns in the Java/RE2-portable subset ((?is) flags, non-greedy blocks,
explicit whitespace classes; the htmltext discipline) so a DuckDB oracle
runs them verbatim. loc values decode the XML-pinned entity set with the
SAME ordering rule htmltext earned the hard way (non-amp entities first
as literal replaces, the amp family LAST in one alternation pass so
``&amp;lt;`` decodes exactly one level).

Deliberate simplifications (documented contract): no CDATA sections
(sitemaps.org examples never use them for loc); no XML namespace
RESOLUTION — tags match by local name with an optional literal prefix
(``<url>`` and ``<ns0:url>`` both match; a prefix bound to a non-sitemap
namespace is not distinguished); index recursion is the CALLER's loop —
each fetch round is a DataFrame pass, ``kind = 'index'`` rows are the
frontier of that loop. Entries without a ``<loc>`` are dropped (nothing
to fetch); a NULL document yields zero entries (this is an entry
extractor, not a fetch auditor — track failed fetches upstream where the
fetch status lives). Classification reads the first 64 KiB of the
comment-stripped document (the root tag can only be preceded by the
declaration/doctype and whitespace; a sitemapindex buried past 64 KiB of
preamble would misclassify — far beyond any real document's prolog).
MALFORMED documents degrade lenient, not loud: an entry
missing its close tag merges with following entries up to the next close
tag (their locs are lost — only the block's first survives); validate
feeds upstream when that matters (no RE2-portable regex can express
"stop at the next <url" without lookahead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import PORTABLE_WS as _WS  # the ONE portable whitespace class

#: optional XML namespace prefix (r13 review pass 18 #1: ElementTree
#: serializes '<ns0:url>' — 'tags match by local name' as the docstring
#: promises requires matching the prefix, no lookaround so RE2-portable)
_NSP = "(?:[a-z0-9._-]+:)?"

#: entry-block patterns: the tag name must be followed by whitespace or
#: '>' — a bare ``<url[^>]*>`` would also match ``<urlset ...>`` and
#: swallow the whole document as one block (found at design time; pinned)
_URL_BLOCK = f"(?is)<{_NSP}url(?:>|[{_WS}][^>]*>).*?</{_NSP}url[{_WS}]*>"
_SITEMAP_BLOCK = (
    f"(?is)<{_NSP}sitemap(?:>|[{_WS}][^>]*>).*?</{_NSP}sitemap[{_WS}]*>"
)
_INDEX_MARK = f"(?is)<[{_WS}]*{_NSP}sitemapindex[{_WS}>]"

#: XML's five predefined entities + numeric twins — DERIVED from
#: htmltext.ENTITIES (the &nbsp;-free subset: nbsp is HTML, not XML), so
#: a future correction there reaches this decode automatically; the
#: decode itself is htmltext.entity_decode_expr, the ONE copy of the
#: load-bearing amp-last-one-pass ordering rule (r13 review passes: a
#: verbatim copy of either the loop or the table is the divergence class
#: the reviews keep removing)
from .htmltext import ENTITIES as _HTML_ENTITIES

_XML_ENTITIES = tuple(
    (s, d) for s, d in _HTML_ENTITIES if s not in ("&nbsp;", "&#160;")
)


def xml_entity_decode(col) -> F.Column:
    """Single-level decode of XML's predefined entities (portable; the
    shared htmltext ordering rule — ``&amp;#38;`` yields the literal
    ``&#38;``, never a double-decoded ``&``)."""
    from .htmltext import entity_decode_expr

    return entity_decode_expr(col, _XML_ENTITIES)


def parse_sitemaps(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "sitemap_xml",
) -> DataFrame:
    """One sitemap document per row → one row per entry:
    (domain, kind 'urlset'|'index', pos, loc, lastmod). ``loc`` is
    entity-decoded and whitespace-trimmed; ``lastmod`` is the raw string
    (W3C datetime — cast downstream) or NULL when absent. Entries with no
    loc are dropped. Pure projection + one explode — no shuffle; at
    100 TB this fuses into the fetch-result scan."""
    from .htmltext import COMMENT_PATTERN

    # comments are stripped BEFORE classification and block extraction
    # (r13 review pass 17 #1: '<!-- <sitemapindex> retired -->' in a
    # urlset flipped is_index and silently dropped every <url> entry —
    # the htmltext comment-first discipline, SAME shared pattern). The
    # stripped document and the classification MATERIALIZE as columns
    # (pass 20 #1: inlined, the full-document comment strip ran 3× per
    # row and the rlike 2× — CollapseProject never re-inlines a non-cheap
    # expression referenced more than once; sitemaps.org allows 50 MB
    # documents, so duplicated full-document passes dominate).
    # comments strip to '' here, NOT htmltext's ' ' (pass 22 #1: a
    # comment INSIDE <loc> injected a space into the URL; the space
    # discipline is load-bearing for prose, wrong for XML values)
    stripped = F.regexp_replace(F.col(text_col), COMMENT_PATTERN, "")
    # any '<!--' that SURVIVES the closed-comment strip opens an
    # UNTERMINATED comment (truncated fetch — this module's domain);
    # it runs to EOF, so everything after it is dead text (pass 21 #1:
    # left in place, a commented '<sitemapindex' in a truncated doc
    # flipped classification and dropped every real entry)
    stripped = F.regexp_replace(stripped, r"(?s)<!--.*$", "")
    prepared = df.select(
        F.col(domain_col).alias("domain"),
        stripped.alias("_xml"),
    ).withColumn(
        # classification reads a bounded PREFIX (pass 21 #2: the root tag
        # can only be preceded by the declaration/doctype + whitespace
        # once comments are gone, and an unbounded rlike re-scans the
        # whole 50 MB-max document just to say 'not an index')
        "_is_index",
        F.substring(F.col("_xml"), 1, 65536).rlike(_INDEX_MARK),
    )
    blocks = F.when(
        F.col("_is_index"),
        F.regexp_extract_all(F.col("_xml"), F.lit(_SITEMAP_BLOCK), F.lit(0)),
    ).otherwise(F.regexp_extract_all(F.col("_xml"), F.lit(_URL_BLOCK), F.lit(0)))
    rows = prepared.select(
        "domain",
        F.when(F.col("_is_index"), F.lit("index"))
        .otherwise(F.lit("urlset"))
        .alias("kind"),
        F.posexplode(blocks).alias("pos", "_block"),
    )
    loc_pat = (
        f"(?is)<{_NSP}loc(?:>|[{_WS}][^>]*>)[{_WS}]*(.*?)[{_WS}]*"
        f"</{_NSP}loc[{_WS}]*>"
    )
    mod_pat = (
        f"(?is)<{_NSP}lastmod(?:>|[{_WS}][^>]*>)[{_WS}]*(.*?)[{_WS}]*"
        f"</{_NSP}lastmod[{_WS}]*>"
    )
    # filter on the RAW extract, decode only survivors (pass 20 #2: a
    # filter on the decoded loc re-ran the extract + 9-step decode chain
    # per entry; decode never turns a non-empty loc empty, so the raw
    # filter is equivalent at half the per-entry regex work)
    rows = rows.withColumn(
        "_rawloc", F.regexp_extract(F.col("_block"), loc_pat, 1)
    ).where(F.length("_rawloc") > 0)
    lastmod = F.regexp_extract(F.col("_block"), mod_pat, 1)
    return (
        rows.withColumn("loc", xml_entity_decode(F.col("_rawloc")))
        .withColumn("lastmod", F.nullif(lastmod, F.lit("")))
        .drop("_block", "_rawloc")
    )
