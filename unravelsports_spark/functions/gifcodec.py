"""GIF87a/89a codec in pure Python + NumPy — palette images with LZW
compression per the public GIF specification. Decode handles global/local
color tables, interlacing, and the GCE transparency flag (first frame);
encode writes a single-frame GIF89a from any image with ≤256 distinct
colors (exact roundtrip — GIF is lossless for palettized content).

Completes the no-external-codec image family (PNG/BMP in imagecodec.py,
JPEG in jpegcodec.py) for the multimodal decode path."""

from __future__ import annotations

import struct

import numpy as np


# --- LZW --------------------------------------------------------------------


class _LSBBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise EOFError("LZW stream exhausted")
            v |= ((self.data[byte] >> (self.bitpos & 7)) & 1) << i
            self.bitpos += 1
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    br = _LSBBitReader(data)
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev = None
    next_code = end + 1
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            table, width = reset()
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out_bits = []

    def emit(code, width):
        for i in range(width):
            out_bits.append((code >> i) & 1)

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(end, width)
    data = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, bit in enumerate(out_bits[i:i + 8]):
            byte |= bit << j
        data.append(byte)
    return bytes(data)


# --- container --------------------------------------------------------------


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF → HxWx3 uint8 RGB (transparent pixels, if the
    GCE flags one, come back as the palette color — GIF has no alpha)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension — skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image has no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                sz = data[pos]
                lzw += data[pos + 1:pos + 1 + sz]
                pos += 1 + sz
            pos += 1
            idx = np.frombuffer(
                bytes(_lzw_decode(bytes(lzw), mcs, w * h)[: w * h]), np.uint8
            ).reshape(h, w)
            if iflags & 0x40:  # interlaced: reorder rows
                deinter = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for row in range(start, h, step):
                        deinter[row] = idx[src]
                        src += 1
                idx = deinter
            return pal[np.minimum(idx, len(pal) - 1)]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray) -> bytes:
    """HxWx3 (or HxW grayscale) uint8 with ≤256 distinct colors → GIF89a.
    Lossless for palettized content (exact roundtrip)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.dstack([img] * 3)
    img = img[..., :3]
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors exceed GIF's 256-color palette")
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table_size = 1 << depth
    pal_bytes = np.zeros((table_size, 3), np.uint8)
    pal_bytes[: len(palette)] = palette
    mcs = max(2, depth)
    lzw = _lzw_encode(bytes(inverse.astype(np.uint8)), mcs)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += pal_bytes.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
