"""Baseline JFIF (JPEG) encoder/decoder in pure NumPy + stdlib — no PIL,
no libjpeg. Implements the ITU-T T.81 baseline process with the public
Annex-K quantization and Huffman tables: 8x8 DCT-II, 4:4:4 sampling (no
chroma subsampling — simplest valid form), differential DC + run-length AC
Huffman coding, JFIF APP0 wrapper.

Scope: quality-scalable encode of RGB/grayscale uint8 arrays; decode of
baseline non-progressive 4:4:4 or grayscale streams without restart markers
(exactly what the encoder produces, plus the common subset). The point is
closing the video/export surface (MJPEG-AVI in `sources/media.py`) and the
multimodal `jpeg` decode path without external codecs; see
reference `unravel/soccer/graphs/graph_converter.py:738-1314` (pitch video
export, ffmpeg-backed there).
"""

from __future__ import annotations

import struct

import numpy as np

# --- public Annex-K tables --------------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II basis: dct(block) = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.clip(np.stack([y, cb, cr], axis=-1).round(), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blockify(comp: np.ndarray) -> np.ndarray:
    """HxW (multiple of 8) → (nby, nbx, 8, 8)."""
    h, w = comp.shape
    return comp.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """RGB (HxWx3) or grayscale (HxW) uint8 → baseline JFIF bytes."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    if gray:
        comps = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img[..., :3])
        comps = [ycc[..., i] for i in range(3)]
    comps = [np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge") for c in comps]

    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    quants = [ql] + ([] if gray else [qc, qc])

    # vectorized DCT + quantization per component
    coefs = []
    for comp, q in zip(comps, quants):
        blocks = _blockify(comp - 128.0)
        d = np.einsum("ij,nmjk,lk->nmil", _C, blocks, _C)
        coefs.append(np.round(d / q).astype(np.int32))

    dc_l = _huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    tables = [(dc_l, ac_l)] + ([] if gray else [(dc_c, ac_c), (dc_c, ac_c)])

    bw = _BitWriter()
    pred = [0] * len(comps)
    nby, nbx = ph // 8, pw // 8
    zz = [c.reshape(nby, nbx, 64)[:, :, ZIGZAG] for c in coefs]
    for by in range(nby):
        for bx in range(nbx):
            for ci, (dct_tab, act_tab) in enumerate(tables):
                blk = zz[ci][by, bx]
                dc = int(blk[0])
                diff = dc - pred[ci]
                pred[ci] = dc
                cat = _category(diff)
                code, length = dct_tab[cat]
                bw.write(code, length)
                if cat:
                    bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
                run = 0
                nz = np.nonzero(blk[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for i in range(1, last + 1):
                    v = int(blk[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c16, l16 = act_tab[0xF0]
                        bw.write(c16, l16)
                        run -= 16
                    cat = _category(v)
                    code, length = act_tab[(run << 4) | cat]
                    bw.write(code, length)
                    bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
                    run = 0
                if last < 63:
                    code, length = act_tab[0x00]  # EOB
                    bw.write(code, length)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT
    for tid, q in enumerate([ql] + ([] if gray else [qc])):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(int(x) for x in q.flatten()[ZIGZAG])
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    # DHT
    for tc_th, bits, vals in [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ] + ([] if gray else [
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"
    out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError("JPEG bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise EOFError("marker in bitstream")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF → uint8 array (HxWx3 RGB, or HxW for grayscale).
    Supports non-progressive, non-subsampled (4:4:4) or grayscale streams
    without restart markers — the encoder's output plus the common subset."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huffs: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    scan_comps = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                n = 64 * (2 if pq else 1)
                raw = seg[p + 1:p + 1 + n]
                tbl = np.frombuffer(raw, dtype=">u2" if pq else np.uint8).astype(np.int32)
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = tbl
                quants[tq] = q.reshape(8, 8)
                p += 1 + n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                huffs[tc_th] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError("chroma subsampling unsupported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG process unsupported")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF) for i in range(ns)]
            pos += seglen
            break
        pos += seglen
    if frame is None or scan_comps is None:
        raise ValueError("truncated JPEG (no frame/scan)")

    h, w, fcomps = frame
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    nby, nbx = ph // 8, pw // 8
    br = _BitReader(data[pos:])
    planes = [np.zeros((ph, pw)) for _ in fcomps]
    pred = [0] * len(fcomps)
    qmap = {cid: quants[tq] for cid, tq in fcomps}
    order = {cid: i for i, (cid, _) in enumerate(fcomps)}
    for by in range(nby):
        for bx in range(nbx):
            for cid, td, ta in scan_comps:
                ci = order[cid]
                blk = np.zeros(64, dtype=np.int32)
                cat = _huff_decode(br, huffs[td])
                diff = _extend(br.read_bits(cat), cat) if cat else 0
                pred[ci] += diff
                blk[0] = pred[ci]
                i = 1
                while i < 64:
                    sym = _huff_decode(br, huffs[0x10 | ta])
                    if sym == 0x00:
                        break
                    run, cat = sym >> 4, sym & 0xF
                    if cat == 0:
                        i += 16  # ZRL
                        continue
                    i += run
                    if i > 63:
                        raise ValueError("AC coefficient index overflow")
                    blk[i] = _extend(br.read_bits(cat), cat)
                    i += 1
                deq = np.zeros(64)
                deq[ZIGZAG] = blk * qmap[cid].flatten()[ZIGZAG]
                sb = deq.reshape(8, 8)
                px = _C.T @ sb @ _C + 128.0
                planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = px
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
