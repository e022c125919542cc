"""Shared shard-decode plumbing for binaryFile-backed boundary readers
(WARC, TFRecord): ONE chunked Arrow decode stage, so the quarantine
contract and the max_records_per_batch emission semantics cannot drift
between formats (r13 review pass 25 — tfrecord.py had re-implemented
warc.py's loop shape verbatim, the divergence class the reviews keep
removing; warc.py's own r12 comment already said a copy per reader would
let the contract drift)."""

from __future__ import annotations


def decode_shard_batches(
    batches, iter_records, columns, max_records_per_batch: int | None
):
    """Yield pandas DataFrames of decoded rows over binaryFile (path,
    content) batches. ``iter_records(bytes)`` yields row dicts (the
    format's lazy record iterator — quarantine rows included);
    ``columns`` fixes the emission schema; ``max_records_per_batch``
    flushes every N rows so a large decoded shard never materializes
    whole (None = whole-shard emission)."""
    import pandas as pd

    if not max_records_per_batch:
        # normalize falsy (0) to whole-shard mode (pass 28 #4: 0 skipped
        # BOTH flush branches and buffered the whole partition)
        max_records_per_batch = None
    out = []
    for pdf in batches:
        for p, content in zip(pdf["path"], pdf["content"]):
            for row in iter_records(bytes(content)):
                row["shard"] = p
                out.append(row)
                if max_records_per_batch and len(out) >= max_records_per_batch:
                    yield pd.DataFrame(out, columns=columns)
                    out = []
        if max_records_per_batch is None and out:
            # whole-shard mode flushes PER INPUT BATCH (r13 review pass
            # 26 #1: buffering across batches accumulated the whole
            # partition's decoded rows — the documented None semantics
            # are the r12 per-batch behavior, bounded by one input batch)
            yield pd.DataFrame(out, columns=columns)
            out = []
    if out:
        yield pd.DataFrame(out, columns=columns)


def write_shard(path: str, pid: int, batch_idx: int, ext: str, blob: bytes) -> str:
    """The ONE shard-publish scaffold (r13 review pass 26 #4 — warc and
    tfrecord writers carried verbatim copies): DETERMINISTIC
    ``part-<partition>-<batch><ext>`` name so task retries / speculative
    attempts / manifest re-collection rewrite the SAME file, landed via a
    DOTFILE tmp + ``os.replace`` (atomic on POSIX — overlapping attempts
    each publish a complete shard, last rename wins; the tmp name carries
    no extension so neither readers' globs nor Spark's hidden-file filter
    can pick up a crash leftover). Returns the shard path."""
    import os
    import uuid

    # create the output dir like Spark's native writers do (ADVICE r13
    # #1: open() on the dotfile tmp raised FileNotFoundError for a
    # not-yet-created path); exist_ok makes it safe under concurrent tasks
    os.makedirs(path, exist_ok=True)
    shard = os.path.join(path, f"part-{pid:05d}-{batch_idx:04d}{ext}")
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, shard)
    return shard
