"""Round-2 corpus-pipeline queries: TF-IDF / vocabulary, domain-mixture
resampling, exact quantiles, and k-means clustering — each with an exact
DuckDB oracle unless noted. Registered additively; existing query names are
never touched (registry stability, VERDICT r1 action #1).

Float-parity rules applied here (measured, see tests/test_vocab.py):
- `ln()` differs by 1 ulp between JVM and libm on ~5% of inputs → every IDF
  is rounded to 6 decimals on BOTH sides.
- `CAST(double AS BIGINT)` truncates in Spark but rounds in DuckDB → all
  ppm rates go through an explicit FLOOR on both sides.
- double sums are order-dependent → inertia sums ride through DECIMAL
  (`dsum`), max-based stats (max is order-independent) stay double.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.sampling import PPM, mixture_rates, sample_mixture
from ..operators.similarity import with_nearest_centroid
from ..operators.vocab import tfidf_terms, vocab_topk
from ..session import read_table, widen_narrow_scan
from .relational import dec, dsum, query

_TOK = r"regexp_extract_all(lower(text), '[a-z0-9]+')"


@query(
    "t_tfidf_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    stats AS (
      SELECT term, COUNT(*) AS doc_freq, CAST(SUM(tf) AS BIGINT) AS total_tf,
             MAX(tf) AS max_tf
      FROM tf GROUP BY term
    )
    SELECT term, doc_freq, total_tf,
           ROUND(LN((n_docs + 1.0) / (doc_freq + 1.0)) + 1.0, 6) AS idf,
           ROUND(max_tf * ROUND(LN((n_docs + 1.0) / (doc_freq + 1.0)) + 1.0, 6), 6) AS max_tfidf
    FROM stats, n
    WHERE doc_freq >= 2
    """,
)
def t_tfidf_terms(spark, sf_dir):
    """Corpus TF-IDF term statistics (engine addition §2.12): explode + two
    map-side-combinable aggregations; N broadcast as a 1-row agg."""
    d = read_table(spark, sf_dir, "documents")
    return tfidf_terms(d, min_doc_freq=2)


@query(
    "t_vocab_top100",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK}) AS term FROM documents
    )
    SELECT term, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY term
    ORDER BY n_occurrences DESC, term
    LIMIT 100
    """,
)
def t_vocab_top100(spark, sf_dir):
    """Top-100 vocabulary (engine addition §2.12): partial HashAggregate →
    TakeOrderedAndProject, deterministic tie-break by term."""
    return vocab_topk(read_table(spark, sf_dir, "documents"), k=100)


#: mixture targets for the oracle pair (shares sum to 1; the other 17
#: sources get rate 0)
MIX_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


@query(
    "t_domain_mixture",
    oracle=f"""
    WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tgt(source, target) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
    c2 AS (
      SELECT c.source, c.n_docs, COALESCE(t.target, 0.0) AS target
      FROM counts c LEFT JOIN tgt t USING (source)
    ),
    tt AS (SELECT MIN(n_docs / target) AS t FROM c2 WHERE target > 0),
    rates AS (
      SELECT source, n_docs,
             CAST(FLOOR(target * {PPM}) AS BIGINT) AS target_ppm,
             LEAST({PPM}, CAST(FLOOR(target * t / n_docs * {PPM}) AS BIGINT)) AS rate_ppm
      FROM c2, tt
    ),
    samp AS (
      SELECT d.source, COUNT(*) AS n_sampled
      FROM documents d JOIN rates r USING (source)
      WHERE CAST(('0x' || substring(md5(d.text), 1, 15)) AS BIGINT) % {PPM} < r.rate_ppm
      GROUP BY d.source
    )
    SELECT r.source, r.n_docs, r.target_ppm, r.rate_ppm,
           COALESCE(s.n_sampled, 0) AS n_sampled
    FROM rates r LEFT JOIN samp s USING (source)
    """,
)
def t_domain_mixture(spark, sf_dir):
    """Domain-mixture resampling (engine addition §2.12): per-domain
    keep-rates for a 50/30/20 target mix, deterministic md5 Bernoulli
    sampling, per-domain sampled counts. The corpus never shuffles — rates
    are a broadcast dim, the sample is a codegen filter."""
    d = read_table(spark, sf_dir, "documents")
    rates = mixture_rates(d, MIX_TARGETS)
    sampled = (
        sample_mixture(d, MIX_TARGETS, rates=rates)
        .groupBy("source")
        .agg(F.count("*").alias("_n_sampled"))
    )
    return (
        rates.join(F.broadcast(sampled), "source", "left")
        .withColumn("n_sampled", F.coalesce(F.col("_n_sampled"), F.lit(0)))
        .drop("_n_sampled")
    )


@query(
    "a10_quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a10_quantiles(spark, sf_dir):
    """Exact per-group quantiles (A-family addition): Spark's exact
    `percentile` (sort-based within groups) vs DuckDB `quantile_cont`; both
    use linear interpolation on order statistics. Rounded to 4 decimals —
    the interpolation arithmetic can differ in the last ulp. At scale the
    exact percentile is a per-group sort; for the approximate path see
    a9_approx_distinct's KLL/HLL family."""
    li = read_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").alias("qs"),
        F.count("*").alias("n"),
    )
    return q.select(
        "l_returnflag",
        F.round(F.element_at("qs", 1), 4).alias("p25"),
        F.round(F.element_at("qs", 2), 4).alias("p50"),
        F.round(F.element_at("qs", 3), 4).alias("p75"),
        "n",
    )


_KMEANS_D2 = """
      list_reduce(
        list_transform(range(1, len(e.embedding) + 1),
          i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE))
             * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE))),
        (a, b) -> a + b)
"""


@query(
    "s_kmeans_assign",
    oracle=f"""
    WITH cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cemb
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    d AS (
      SELECT e.vec_id, c.cell, {_KMEANS_D2} AS d2
      FROM embeddings e CROSS JOIN cent c
    ),
    best AS (
      SELECT vec_id, cell, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
      FROM d
    )
    SELECT cell, COUNT(*) AS n_members,
           CAST(SUM(CAST(d2 AS DECIMAL(18,8))) AS DOUBLE) AS inertia
    FROM best WHERE rn = 1 GROUP BY cell
    """,
)
def s_kmeans_assign(spark, sf_dir):
    """K-means assignment step (engine addition §2.12), exact oracle:
    deterministic init (8 lowest vec_ids), literal-centroid projection —
    zero shuffles for the assignment, one map-side-combinable agg for the
    per-cell stats. d2 folds left with acc=0.0 in both engines (0.0 + x is
    exact), inertia sums ride DECIMAL for order-independence."""
    emb = read_table(spark, sf_dir, "embeddings")
    init = emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    centroids = [[float(v) for v in r[1]] for r in init]
    import numpy as np

    assigned = with_nearest_centroid(emb, np.asarray(centroids))
    return assigned.groupBy("cell").agg(
        F.count("*").alias("n_members"),
        dsum("d2", 8).alias("inertia"),
    )


# NOTE: s_kmeans_fit moved to plans/corpus4.py in round 5 — it now runs the
# exact int64 Lloyd (2^-20 grid, the PQ trainer with one subspace) and is
# hash-certified against a CTE-unrolled DuckDB oracle. The float-path
# operator (kmeans_fit_distributed) remains tested in tests/test_vocab.py.


@query(
    "t_sentences",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                        x -> trim(x)), x -> x != '') AS sents
      FROM documents WHERE doc_id % 25 = 0
    ),
    e AS (
      SELECT doc_id,
             unnest(list_transform(sents,
                    (x, i) -> struct_pack(sentence_idx := i - 1, sentence := x))) AS u
      FROM s
    )
    SELECT doc_id, CAST(u.sentence_idx AS INT) AS sentence_idx, u.sentence AS sentence
    FROM e
    """,
)
def t_sentences(spark, sf_dir):
    """Sentence segmentation (engine addition §2.12): split + transform +
    filter + posexplode, all inside whole-stage codegen. The native Python
    UDTF twin (`make_sentence_udtf`) is asserted equal in tests — the U4
    surface without putting Python in the hot path."""
    from ..operators.text import split_sentences

    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return split_sentences(d)


@query(
    "t_chunking",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             1 + GREATEST(0, CAST(CEIL((len(toks) - 32) / 24.0) AS INT)) AS n_chunks
      FROM d
    ),
    e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) AS INT) AS chunk_len,
           array_to_string(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ') AS chunk_text
    FROM e
    """,
)
def t_chunking(spark, sf_dir):
    """Overlapping token-window chunking (engine addition §2.12): 32-token
    windows every 24 tokens — the RAG/pretraining chunk primitive. Integer
    arithmetic only; projection + explode, no shuffle, no UDF."""
    from ..operators.text import chunk_tokens

    return chunk_tokens(read_table(spark, sf_dir, "documents"))


@query(
    "mm_video_real",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 25 = 0),
    f AS (
      SELECT doc_id,
             unnest(range(0, 2 + doc_id % 4, 2)) AS frame_index
      FROM d
    )
    SELECT doc_id, CAST(frame_index AS INT) AS frame_index,
           CAST(16 + doc_id % 8 AS INT) AS frame_width,
           CAST(12 + doc_id % 4 AS INT) AS frame_height
    FROM f
    """,
)
def mm_video_real(spark, sf_dir):
    """REAL video pipeline, exact oracle on the integer metadata: per doc a
    genuine MJPEG-AVI clip is muxed in an Arrow batch stage (frame count /
    dims derived from doc_id arithmetic), then `sample_avi_frames` parses
    the container, samples every 2nd frame, and DECODES each sampled JPEG —
    the emitted width/height come from the decoder (SOF0), so the oracle
    (which recomputes the expected geometry in SQL) certifies container
    parse + JPEG decode end-to-end. frame_mean is excluded: JPEG DC
    quantization makes it near- but not bit-exact."""
    import pandas as pd

    from pyspark.sql import types as T

    from ..functions.jpegcodec import encode_jpeg
    from ..operators.multimodal import sample_avi_frames

    # the per-row AVI synth + frame resample below is CPU-bound Python; a
    # sub-4MB documents scan is ONE split, which would serialize the whole
    # kernel on a single task (guide §2: spread CPU-bound stages; no-op on
    # a wide cluster scan)
    d = widen_narrow_scan(
        read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0).select("doc_id")
    )

    def build(batches):
        import numpy as np

        from ..sources.avi import write_mjpeg_avi
        import os, tempfile

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 2 + int(doc_id) % 4
                w, h = 16 + int(doc_id) % 8, 12 + int(doc_id) % 4
                frames = [
                    encode_jpeg(np.full((h, w, 3), (i * 10) % 200, np.uint8), 95)
                    for i in range(n)
                ]
                fd, path = tempfile.mkstemp(suffix=".avi")
                os.close(fd)
                write_mjpeg_avi(path, frames, w, h, fps=10)
                with open(path, "rb") as fh:
                    payloads.append(fh.read())
                os.unlink(path)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    clips = d.mapInPandas(
        build,
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
        ),
    )
    return sample_avi_frames(clips, every_k=2).select(
        "doc_id", "frame_index", "frame_width", "frame_height"
    )


# -- data-quality / warehouse additions --------------------------------------


def _pair_degree_sql() -> str:
    from .pipeline import _lsh_sql

    return f"""
    WITH pairs AS ({_lsh_sql()}),
    ends AS (
      SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b FROM pairs
    )
    SELECT doc_id, COUNT(*) AS degree FROM ends GROUP BY doc_id
    """


@query("d_pair_degrees", oracle=_pair_degree_sql())
def d_pair_degrees(spark, sf_dir):
    """Candidate-pair graph degrees (dedup-family addition): how many
    near-dup candidates each document participates in — the triage signal
    for boilerplate/template detection (very high degree = boilerplate,
    not plagiarism). Runs on the pruned LSH pair set, never all-pairs."""
    from ..operators.dedup import doc_shingles, lsh_candidate_pairs, minhash_signatures

    shingled = doc_shingles(read_table(spark, sf_dir, "documents"), distinct=False)
    pairs = lsh_candidate_pairs(minhash_signatures(shingled, num_hashes=8), bands=4, rows_per_band=2)
    ends = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    return ends.groupBy("doc_id").agg(F.count("*").alias("degree"))


@query(
    "w11_scd2_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts_ms,
             LEAD(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) AS next_ts_ms
      FROM seq WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
           COALESCE(next_ts_ms, 9223372036854775807) AS valid_to_ms,
           (next_ts_ms IS NULL) AS is_current
    FROM changes
    """,
)
def w11_scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension type-2 derivation (W-family addition):
    collapse consecutive equal states, then LEAD gives each state version
    its [valid_from, valid_to) interval with an open-ended current row —
    the standard snapshot→history transformation, two window passes over
    one sort."""
    from .relational import ms

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", ms("ts").alias("ts_ms"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = seq.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_ms")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_ms").alias("valid_from_ms"),
        F.coalesce(F.lead("ts_ms").over(w2), F.lit(9223372036854775807)).alias("valid_to_ms"),
        F.lead("ts_ms").over(w2).isNull().alias("is_current"),
    )


@query(
    "a17_sortedness",
    oracle="""
    WITH o AS (
      SELECT user_id,
             CASE WHEN event_id < LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS viol
      FROM events
    )
    SELECT user_id, CAST(SUM(viol) AS BIGINT) AS n_violations, COUNT(*) AS n_rows
    FROM o GROUP BY user_id
    """,
)
def a17_sortedness(spark, sf_dir):
    """Monotonicity validation (data-quality addition): count order
    inversions of one column under another's ordering, per key — the cheap
    invariant check before relying on sortedness (as-of joins, dedup
    ledgers, incremental processing all assume it)."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    viol = F.when(F.col("event_id") < F.lag("event_id").over(w), 1).otherwise(0)
    return (
        e.select("user_id", viol.alias("viol"))
        .groupBy("user_id")
        .agg(F.sum("viol").alias("n_violations"), F.count("*").alias("n_rows"))
    )


@query(
    "a18_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type, e.event_id, e.value,
             ROUND((e.value - s.sx / s.n)
               / SQRT(s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n)), 6) AS zscore
      FROM events e JOIN s USING (event_type)
    )
    SELECT event_type, event_id, value, zscore
    FROM z WHERE ABS(zscore) > 2.5
    """,
)
def a18_outliers(spark, sf_dir):
    """Z-score outlier detection (data-quality addition): per-group moments
    from DECIMAL sufficient statistics (order-independent, same trick as
    a12), z computed in an identical expression tree both engines, rounded
    at 6. The group stats are a tiny agg-back broadcast join — the corpus
    scans once."""
    e = read_table(spark, sf_dir, "events")
    v = dec("value")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("sx"),
        F.sum(v * v).cast("double").alias("sxx"),
    )
    j = e.join(F.broadcast(s), "event_type")
    mean = F.col("sx") / F.col("n")
    z = F.round((F.col("value") - mean) / F.sqrt(F.col("sxx") / F.col("n") - mean * mean), 6)
    return (
        j.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 2.5)
        .select("event_type", "event_id", "value", "zscore")
    )


@query(
    "mm_gif_real",
    oracle="""
    WITH d AS (SELECT doc_id, source,
                      3 + doc_id % 11 AS w, 3 + doc_id % 5 AS h,
                      (doc_id * 37) % 256 AS c
               FROM documents WHERE doc_id % 5 = 0)
    SELECT source, COUNT(*) AS n_images,
           CAST(SUM(w) AS BIGINT) AS sum_width,
           CAST(SUM(h) AS BIGINT) AS sum_height,
           CAST(SUM(c) AS BIGINT) AS sum_color
    FROM d GROUP BY source
    """,
)
def mm_gif_real(spark, sf_dir):
    """REAL GIF codec end-to-end (mirror of mm_decode_real for the LZW
    path): synthesize a solid-color GIF per document, decode through the
    shared multimodal path, aggregate decoded metadata. GIF is lossless for
    palettized content so round(mean*255) recovers the exact color —
    integer-exact oracle certifying LZW encode+decode, palette handling and
    dispatch."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from ..functions.gifcodec import encode_gif
    from ..operators.multimodal import decode_images

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "source")
    )

    def synth(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                encode_gif(
                    np.full((3 + int(i) % 5, 3 + int(i) % 11, 3), (int(i) * 37) % 256, np.uint8)
                )
                for i in pdf["doc_id"]
            ]
            yield pdf

    media = docs.mapInPandas(
        synth,
        T.StructType(docs.schema.fields + [T.StructField("payload", T.BinaryType())]),
    )
    dec_df = decode_images(media, fake=False)
    return dec_df.groupBy("source").agg(
        F.count("*").alias("n_images"),
        F.sum("dec_width").cast("bigint").alias("sum_width"),
        F.sum("dec_height").cast("bigint").alias("sum_height"),
        F.sum(F.round(F.col("mean_pixel") * 255).cast("bigint")).alias("sum_color"),
    )


def _triangle_sql() -> str:
    from .pipeline import _lsh_sql

    return f"""
    WITH pairs AS ({_lsh_sql()})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM pairs e1
    JOIN pairs e2 ON e1.id_b = e2.id_a
    JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    """


@query("d_triangle_count", oracle=_triangle_sql())
def d_triangle_count(spark, sf_dir):
    """Triangle counting on the near-dup candidate graph (dedup-family
    addition): the density signal distinguishing template clusters (many
    triangles) from chance collisions (none). Edges are canonically ordered
    (id_a < id_b) so each triangle counts exactly once; two joins on the
    pruned pair set — the standard distributed triangle enumeration, never
    touching the full corpus."""
    from ..operators.dedup import doc_shingles, lsh_candidate_pairs, minhash_signatures

    shingled = doc_shingles(read_table(spark, sf_dir, "documents"), distinct=False)
    pairs = lsh_candidate_pairs(
        minhash_signatures(shingled, num_hashes=8), bands=4, rows_per_band=2
    ).select("id_a", "id_b")
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.id_b") == F.col("e2.id_a"))
        .join(
            e3,
            (F.col("e3.id_a") == F.col("e1.id_a")) & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
    )
    return tri.agg(F.count("*").alias("n_triangles"))


@query(
    "t_bigram_pmi",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    uni AS (
      SELECT unnest(toks) AS w FROM tok
    ),
    unic AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM unic),
    bi AS (
      SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM tok
    ),
    bic AS (SELECT bg, COUNT(*) AS c FROM bi GROUP BY bg HAVING COUNT(*) >= 5),
    btot AS (SELECT CAST(SUM(c) AS DOUBLE) AS bn FROM (SELECT COUNT(*) AS c FROM bi))
    SELECT bg AS bigram, bic.c AS n_bigram,
           ROUND(LN((bic.c / btot.bn)
             / ((u1.c / tot.n) * (u2.c / tot.n))), 6) AS pmi
    FROM bic, btot, tot
    JOIN unic u1 ON u1.w = string_split(bic.bg, ' ')[1]
    JOIN unic u2 ON u2.w = string_split(bic.bg, ' ')[2]
    """,
)
def t_bigram_pmi(spark, sf_dir):
    """Bigram PMI (corpus-analysis addition): pointwise mutual information
    of adjacent-token pairs with count ≥5 — the collocation / multi-word-
    expression signal. Unigram and bigram counts are two combinable aggs;
    the probability ratio is one broadcast join per side; ln rounded at 6
    (measured JVM/libm ulp divergence)."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
    t = d.select(F.col("doc_id"), toks.alias("toks"))
    uni = t.select(F.explode("toks").alias("w"))
    unic = uni.groupBy("w").agg(F.count("*").alias("c"))
    tot = unic.agg(F.sum("c").cast("double").alias("n"))
    bi = t.select(
        F.explode(
            F.expr("transform(sequence(1, size(toks) - 1), i -> concat(toks[i - 1], ' ', toks[i]))")
        ).alias("bg")
    )
    bic = bi.groupBy("bg").agg(F.count("*").alias("c")).filter(F.col("c") >= 5)
    btot = bi.agg(F.count("*").cast("double").alias("bn"))
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    j = (
        bic.withColumn("w1", w1).withColumn("w2", w2)
        # unigram counts are vocabulary-sized — no forced broadcast (AQE
        # broadcasts when genuinely small; see retrieval.py term_lp note)
        .join(unic.selectExpr("w as w1", "c as c1"), "w1")
        .join(unic.selectExpr("w as w2", "c as c2"), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
    )
    pmi = F.round(
        F.log((F.col("c") / F.col("bn")) / ((F.col("c1") / F.col("n")) * (F.col("c2") / F.col("n")))), 6
    )
    return j.select(F.col("bg").alias("bigram"), F.col("c").alias("n_bigram"), pmi.alias("pmi"))


@query(
    "t_filter_funnel",
    oracle=r"""
    WITH q AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             ROUND(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 6) AS alpha_ratio,
             ROUND(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text), 6) AS punct_ratio
      FROM documents),
    f AS (
      SELECT doc_id,
             (n_chars >= 100) AS p1,
             (n_chars >= 100 AND n_tokens >= 10) AS p2,
             (n_chars >= 100 AND n_tokens >= 10 AND alpha_ratio > 0.6) AS p3,
             (n_chars >= 100 AND n_tokens >= 10 AND alpha_ratio > 0.6 AND punct_ratio < 0.1) AS p4
      FROM q)
    SELECT 'p0_total' AS stage, COUNT(*) AS n_surviving FROM f
    UNION ALL SELECT 'p1_min_chars', CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
    UNION ALL SELECT 'p2_min_tokens', CAST(SUM(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) FROM f
    UNION ALL SELECT 'p3_alpha', CAST(SUM(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) FROM f
    UNION ALL SELECT 'p4_punct', CAST(SUM(CASE WHEN p4 THEN 1 ELSE 0 END) AS BIGINT) FROM f
    """,
)
def t_filter_funnel(spark, sf_dir):
    """Corpus filter funnel (pipeline addition): cumulative survival counts
    through the standard cheap pre-filters — the attrition report every
    corpus-cleaning run ships. One scan, conditional sums (no per-stage
    passes)."""
    from ..operators.text import with_quality

    d = with_quality(read_table(spark, sf_dir, "documents"))
    p1 = F.col("n_chars") >= 100
    p2 = p1 & (F.col("n_tokens") >= 10)
    p3 = p2 & (F.col("alpha_ratio") > 0.6)
    p4 = p3 & (F.col("punct_ratio") < 0.1)
    agg = d.agg(
        F.count("*").alias("p0_total"),
        F.sum(p1.cast("long")).alias("p1_min_chars"),
        F.sum(p2.cast("long")).alias("p2_min_tokens"),
        F.sum(p3.cast("long")).alias("p3_alpha"),
        F.sum(p4.cast("long")).alias("p4_punct"),
    )
    stack = ", ".join(f"'{c}', {c}" for c in
                      ["p0_total", "p1_min_chars", "p2_min_tokens", "p3_alpha", "p4_punct"])
    return agg.selectExpr(f"stack(5, {stack}) as (stage, n_surviving)")


def _minhash_accuracy_sql() -> str:
    from ..operators.dedup import MINHASH_COEFFS, MINHASH_PRIME
    from .pipeline import _SHINGLE_SQL

    mh = ", ".join(
        f"MIN(((shingle_hash % {MINHASH_PRIME}) * {a} + {b}) % {MINHASH_PRIME}) AS minhash_{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS[:8])
    )
    bands = []
    for b in range(4):
        cols = [f"minhash_{b * 2 + r}" for r in range(2)]
        concat = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        bands.append(f"SELECT doc_id, {b} AS band, {concat} AS key FROM sig")
    banded = " UNION ALL ".join(bands)
    agree = " + ".join(
        f"CASE WHEN sa.minhash_{i} = sb.minhash_{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    return (
        _SHINGLE_SQL
        + f"""
    , sig AS (SELECT doc_id, {mh} FROM shingled GROUP BY doc_id),
    banded AS ({banded}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM shingled a JOIN shingled b
        ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT p.id_a, p.id_b,
           CAST({agree} AS BIGINT) AS n_agree,
           ROUND(({agree}) / 8.0, 6) AS estimate,
           ROUND(COALESCE(c.n_common, 0) * 1.0
                 / (na.n + nb.n - COALESCE(c.n_common, 0)), 6) AS jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
    JOIN sizes na ON na.doc_id = p.id_a
    JOIN sizes nb ON nb.doc_id = p.id_b
    LEFT JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
    """
    )


@query("d_minhash_accuracy", oracle=_minhash_accuracy_sql())
def d_minhash_accuracy(spark, sf_dir):
    """MinHash estimator calibration (dedup-family addition): per LSH
    candidate pair, the signature-agreement estimate (n_agree/8) next to
    the EXACT Jaccard — the measurement that tells you whether the band
    configuration is over/under-recalling. Runs only on the pruned pair
    set; both estimates come from data already materialized by the dedup
    chain."""
    from ..operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    shingled = doc_shingles(read_table(spark, sf_dir, "documents"))
    sigs = minhash_signatures(shingled, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).select("id_a", "id_b")
    sa = sigs.select(F.col("doc_id").alias("id_a"), *[F.col(f"minhash_{i}").alias(f"a{i}") for i in range(8)])
    sb = sigs.select(F.col("doc_id").alias("id_b"), *[F.col(f"minhash_{i}").alias(f"b{i}") for i in range(8)])
    agree = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(8))
    est = pairs.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b",
        agree.cast("bigint").alias("n_agree"),
        F.round(agree / 8.0, 6).alias("estimate"),
    )
    exact = jaccard_pairs(shingled, candidates=pairs).select("id_a", "id_b", "jaccard")
    return (
        est.join(exact, ["id_a", "id_b"], "left")
        .withColumn("jaccard", F.coalesce(F.col("jaccard"), F.lit(0.0)))
    )
