"""WARC source/sink (engine addition §2.1 surface; built round 12, driver
registration queued r13 as `o19_warc_roundtrip`) — the container format
web crawls actually ship in (ISO 28500; Common Crawl, Internet Archive,
Heritrix/wget output). This completes the repo's crawl-ingest story at the
true boundary: WARC → :mod:`~unravelsports_spark.operators.htmltext`
(markup extraction) → textnorm → boilerplate → fingerprint/dedup.

Spark-first plumbing, repo-codec discipline (like the PNG/WAV/AVI codecs:
no external WARC library, the format is simple enough to own):

- :func:`write_warc` — DISTRIBUTED sharded export: one Arrow batch per
  shard file via ``mapInPandas``, returning a manifest frame (shard path,
  record/byte counts) whose collection drives the write. Shards are
  uuid-named (concurrent writers never collide) and optionally
  per-record-gzipped (``gzip_records=True`` — the Common Crawl layout,
  each record its own gzip member).
- :func:`read_warc` — ``spark.read.format("binaryFile")`` over the shard
  glob, then one Arrow decode pass per file. Output carries the SAME
  ``_corrupt_record`` quarantine contract as sources/jsonl + sources/csvio
  (:func:`~unravelsports_spark.sources.jsonl.quarantine_counts` works on
  it unchanged): a malformed span surfaces as ONE quarantine row (prefix
  of the undecodable bytes), and the parser RESYNCS at the next
  ``WARC/1.`` magic so one bad record never eats the rest of the shard.

Pruning note: unlike the CSV/JSON datasources there is NO pruned-parse
hazard here — the decode is our own Arrow stage, which always parses the
full record before projection, so quarantine semantics hold under any
downstream projection without a checked-read wrapper.

Scale caveat (documented like multiLine CSV): ``binaryFile`` reads each
shard whole, so shards are the parallelism unit — keep them bounded (the
writer's batch sharding does this naturally; resize with
``spark.sql.execution.arrow.maxRecordsPerBatch`` upstream or repartition
before writing). A 100 TB crawl should land as many O(100 MB) shards,
never a few giant files.
"""

from __future__ import annotations

import gzip
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"WARC/1."
_GZ_MAGIC = b"\x1f\x8b"

#: read_warc output schema — payload is binary; _corrupt_record carries
#: the jsonl/csvio quarantine contract
WARC_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def encode_warc_records(records: list, gzip_records: bool = False) -> bytes:
    """Serialize records (dicts with rec_type, record_id, warc_date,
    target_uri, content_type, payload: bytes) to WARC/1.0 bytes —
    header block, CRLF-CRLF, payload, CRLF-CRLF; optionally one gzip
    member per record (the Common Crawl layout)."""
    out = []
    for r in records:
        payload = bytes(r.get("payload") or b"")
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + str(r.get("rec_type", "response")).encode(),
            b"WARC-Record-ID: " + str(r.get("record_id", "")).encode(),
            b"WARC-Date: " + str(r.get("warc_date", "")).encode(),
        ]
        if r.get("target_uri"):
            headers.append(b"WARC-Target-URI: " + str(r["target_uri"]).encode())
        headers += [
            b"Content-Type: " + str(r.get("content_type", "text/plain")).encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        rec = b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        out.append(gzip.compress(rec) if gzip_records else rec)
    return b"".join(out)


def _split_gzip_members(data: bytes) -> list:
    """Split a multi-member gzip stream into decompressed members (the
    per-record-gzip WARC layout). A truncated/corrupt trailing member
    comes back as a RAW undecodable bytes marker (None, tail)."""
    import zlib

    members, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            return members, data[pos:]
        if not d.eof:  # truncated final member — the PARTIAL decompression
            # must not leak as a member (it would double-count as both a
            # truncated-record row and the raw-tail quarantine row)
            return members, data[pos:]
        members.append(out)
        pos = len(data) - len(d.unused_data)
    return members, b""


def decode_warc_records(data: bytes) -> list:
    """Parse WARC bytes into row dicts (WARC_SCHEMA minus shard). A
    malformed span becomes ONE quarantine dict (``_corrupt_record`` =
    printable prefix of the bad bytes, everything else None) and the
    parser resyncs at the next ``WARC/1.`` magic — the jsonl/csv
    PERMISSIVE discipline in codec form."""
    if data[:2] == _GZ_MAGIC:
        members, tail = _split_gzip_members(data)
        rows = []
        for m in members:
            rows.extend(decode_warc_records(m))
        if tail:
            rows.append(_corrupt_row(tail))
        return rows

    rows, pos = [], 0
    while pos < len(data):
        if data[pos:pos + len(_MAGIC)] != _MAGIC:
            nxt = data.find(_MAGIC, pos + 1)
            bad = data[pos:] if nxt < 0 else data[pos:nxt]
            if bad.strip(b"\r\n"):  # inter-record CRLF padding is legal
                rows.append(_corrupt_row(bad))
            if nxt < 0:
                break
            pos = nxt
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            rows.append(_corrupt_row(data[pos:]))
            break
        headers = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError):
            rows.append(_corrupt_row(data[pos:hdr_end]))
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        if len(payload) < length:  # truncated record
            rows.append(_corrupt_row(data[pos:]))
            break
        rows.append(
            {
                "rec_type": headers.get(b"warc-type", b"").decode("utf-8", "replace"),
                "record_id": headers.get(b"warc-record-id", b"").decode("utf-8", "replace"),
                "warc_date": headers.get(b"warc-date", b"").decode("utf-8", "replace"),
                "target_uri": headers.get(b"warc-target-uri", b"").decode("utf-8", "replace") or None,
                "content_type": headers.get(b"content-type", b"").decode("utf-8", "replace"),
                "payload": payload,
                "_corrupt_record": None,
            }
        )
        pos = body_start + length
    return rows


def _corrupt_row(bad: bytes) -> dict:
    return {
        "rec_type": None,
        "record_id": None,
        "warc_date": None,
        "target_uri": None,
        "content_type": None,
        "payload": None,
        "_corrupt_record": bad[:256].decode("utf-8", "replace"),
    }


def write_warc(
    df: DataFrame,
    path: str,
    gzip_records: bool = False,
    date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """Distributed sharded WARC export. ``df`` columns: ``target_uri``
    (string), ``payload`` (binary), optional ``record_id`` (string;
    uuid-generated when absent). One shard file per Arrow batch, uuid
    named under ``path`` (caller creates/owns the directory — on a real
    cluster point it at shared storage). Returns the MANIFEST frame
    (shard, n_records, n_bytes); collecting it drives the write —
    ``write_warc(df, p).collect()`` is the complete export. ``date`` is a
    fixed WARC-Date for reproducible exports (pass per-record dates via a
    ``warc_date`` column instead when present)."""
    import os

    import pandas as pd

    cols = df.columns

    def writer(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            records = []
            for _, row in pdf.iterrows():
                records.append(
                    {
                        "rec_type": "response",
                        "record_id": (
                            str(row["record_id"])
                            if "record_id" in cols
                            else f"<urn:uuid:{uuid.uuid4()}>"
                        ),
                        "warc_date": (
                            str(row["warc_date"]) if "warc_date" in cols else date
                        ),
                        "target_uri": str(row["target_uri"]),
                        "content_type": "text/html",
                        "payload": bytes(row["payload"]),
                    }
                )
            blob = encode_warc_records(records, gzip_records)
            ext = ".warc.gz" if gzip_records else ".warc"
            shard = os.path.join(path, f"part-{uuid.uuid4().hex}{ext}")
            with open(shard, "wb") as fh:
                fh.write(blob)
            yield pd.DataFrame(
                {
                    "shard": [shard],
                    "n_records": [len(records)],
                    "n_bytes": [len(blob)],
                }
            )

    return df.mapInPandas(
        writer, "shard string, n_records long, n_bytes long"
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC shards (plain or per-record-gzip) into WARC_SCHEMA rows
    with the shared quarantine contract — one Arrow decode pass per
    shard; no pruned-parse hazard (see module note)."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def decode(batches):
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for row in decode_warc_records(bytes(content)):
                    row["shard"] = p
                    out.append(row)
            yield pd.DataFrame(
                out,
                columns=[f.name for f in WARC_SCHEMA.fields],
            )

    return files.mapInPandas(decode, WARC_SCHEMA)


def warc_to_documents(df: DataFrame) -> DataFrame:
    """Clean WARC rows → the (source, text) document shape the text
    stages consume: utf-8 decoded payloads of clean ``response`` records,
    source = the URI host (the t_url_domains convention)."""
    clean = df.where(
        F.col("_corrupt_record").isNull() & (F.col("rec_type") == "response")
    )
    host = F.regexp_extract(F.col("target_uri"), r"^[a-z]+://([^/]+)", 1)
    return clean.select(
        host.alias("source"),
        F.col("target_uri").alias("url"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )
