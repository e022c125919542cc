"""Motion-JPEG MP4 (ISO BMFF) writer — pure stdlib struct packing, no ffmpeg.

Closes the last S5 surface gap (the reference exports pitch videos as MP4 via
matplotlib's FFMpegWriter, `unravel/soccer/graphs/graph_converter.py:1302`):
each frame is an independent baseline JPEG (`functions/jpegcodec.py`) carried
as an MPEG-4 Visual stream with objectTypeIndication 0x6C (ISO/IEC 10918-1 —
JPEG), the exact signaling ffmpeg emits for ``-c:v mjpeg -f mp4``, so the
file is a standard ``.mp4`` any ffmpeg/VLC/QuickTime build decodes.

Layout: ``ftyp`` + ``mdat`` (concatenated JPEG frames) + ``moov`` with one
video track whose sample table points straight into the mdat (one sample per
chunk, constant frame duration). All box arithmetic is 32-bit — fine for the
bounded driver-side exports this sink serves (``media.MAX_COLLECT_ROWS``
guards the collect; ``max_frames`` guards the frame count).
"""

from __future__ import annotations

import struct
from collections.abc import Iterable

_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def _desc(tag: int, payload: bytes) -> bytes:
    """MPEG-4 descriptor with the canonical 4-byte expandable length ffmpeg
    writes (0x80-continued base-128), so strict parsers agree on the size."""
    n = len(payload)
    return bytes(
        [tag, 0x80 | (n >> 21) & 0x7F, 0x80 | (n >> 14) & 0x7F, 0x80 | (n >> 7) & 0x7F, n & 0x7F]
    ) + payload


def _esds(max_frame: int, avg_rate: int, max_rate: int) -> bytes:
    dec_cfg = _desc(
        0x04,
        struct.pack(
            ">BBBHII",
            0x6C,              # objectTypeIndication: Visual ISO/IEC 10918-1 (JPEG)
            (0x04 << 2) | 1,   # streamType visual | reserved bit
            (max_frame >> 16) & 0xFF,
            max_frame & 0xFFFF,  # bufferSizeDB (24-bit)
            max_rate,          # maxBitrate: peak one-second window >= avg
            avg_rate,
        ),
    )
    sl_cfg = _desc(0x06, b"\x02")  # SLConfig: MP4 predefined
    es = _desc(0x03, struct.pack(">HB", 1, 0) + dec_cfg + sl_cfg)
    return _full(b"esds", 0, 0, es)


def _sample_entry(
    width: int, height: int, max_frame: int, avg_rate: int, max_rate: int
) -> bytes:
    name = b"MJPEG in MP4"
    compressor = bytes([len(name)]) + name + b"\x00" * (31 - len(name))
    payload = (
        b"\x00" * 6                      # reserved
        + struct.pack(">H", 1)           # data_reference_index
        + b"\x00" * 16                   # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4                    # reserved
        + struct.pack(">H", 1)           # frame_count
        + compressor
        + struct.pack(">Hh", 0x0018, -1)  # depth, pre_defined
        + _esds(max_frame, avg_rate, max_rate)
    )
    return _box(b"mp4v", payload)


def write_mjpeg_mp4(
    path: str,
    jpeg_frames: Iterable[bytes],
    width: int,
    height: int,
    fps: int = 25,
) -> str:
    """Write JPEG-encoded frames as an MJPEG MP4. Returns the path.

    Media timescale is ``fps`` with per-sample delta 1, so durations are
    exact integers at any frame rate."""
    frames = [bytes(f) for f in jpeg_frames]
    if not frames:
        raise ValueError("no frames to write")
    n = len(frames)
    max_frame = max(len(f) for f in frames)
    # both bitrate fields are unsigned 32-bit in the DecoderConfigDescriptor
    avg_rate = min((sum(len(f) for f in frames) * 8 * fps) // n, 0xFFFFFFFF)
    # maxBitrate = the peak one-second window, bounded above by the largest
    # frame repeated for a second (exact for fps=1; a safe upper bound
    # otherwise, and always >= avgBitrate as strict validators require —
    # ADVICE r7 #4: previously avg_rate was written in both fields).
    # Clamped to the descriptor's 32-bit field (a >21 MB frame at 25 fps
    # would otherwise overflow struct.pack(">I")).
    max_rate = min(max_frame * 8 * fps, 0xFFFFFFFF)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)

    # absolute file offsets of each frame: ftyp + mdat header precede them
    base = len(ftyp) + 8
    offsets, pos = [], base
    for f in frames:
        offsets.append(pos)
        pos += len(f)

    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + _sample_entry(width, height, max_frame, avg_rate, max_rate))
        + _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
        + _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames))
        + _full(b"stco", 0, 0, struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offsets)),
    )
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")))
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)) + dinf + stbl,
    )
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0)  # language 'und'
    )
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, n)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, fps, n)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)

    with open(path, "wb") as fh:
        fh.write(ftyp + mdat + moov)
    return path


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        typ = data[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError(f"corrupt box {typ!r} at {pos}")
        yield typ, pos + 8, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]) -> tuple[int, int]:
    for typ, b, e in _boxes(data, start, end):
        if typ == path[0]:
            return (b, e) if len(path) == 1 else _find(data, b, e, path[1:])
    raise ValueError(f"box {path[0]!r} not found")


def read_mjpeg_mp4(path: str) -> list[bytes]:
    """Minimal reader for verification/tests: walks the sample table and
    returns the JPEG frame blobs the stco/stsz entries point at."""
    with open(path, "rb") as fh:
        data = fh.read()
    stbl_path = [b"moov", b"trak", b"mdia", b"minf", b"stbl"]
    sb, se = _find(data, 0, len(data), stbl_path)
    zb, _ = _find(data, sb, se, [b"stsz"])
    cb, _ = _find(data, sb, se, [b"stco"])
    fixed, n = struct.unpack(">II", data[zb + 4 : zb + 12])
    sizes = (
        [fixed] * n
        if fixed
        else list(struct.unpack(f">{n}I", data[zb + 12 : zb + 12 + 4 * n]))
    )
    n_off = struct.unpack(">I", data[cb + 4 : cb + 8])[0]
    if n_off != n:
        raise ValueError(f"stco/stsz disagree: {n_off} chunks vs {n} samples")
    offsets = struct.unpack(f">{n}I", data[cb + 8 : cb + 8 + 4 * n])
    return [data[o : o + s] for o, s in zip(offsets, sizes)]
