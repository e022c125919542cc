"""GIF codec: exact roundtrip for palettized content (GIF is lossless),
LZW table-growth/reset paths, interlaced decode, format gates."""

import struct

import numpy as np
import pytest

from unravelsports_spark.functions.gifcodec import (
    _INTERLACE_PASSES,
    decode_gif,
    encode_gif,
)

rng = np.random.default_rng(11)


@pytest.mark.parametrize("n_colors", [2, 7, 64, 256])
def test_roundtrip_exact(n_colors):
    colors = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    colors = np.unique(colors, axis=0)
    idx = rng.integers(0, len(colors), (19, 27))
    img = colors[idx]
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_large_image_lzw_growth_and_reset():
    # 300x400 random 4-color: LZW dictionary grows to 4096 and resets
    colors = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = rng.integers(0, 4, (300, 400))
    img = colors[idx]
    data = encode_gif(img)
    np.testing.assert_array_equal(decode_gif(data), img)


def test_grayscale_input_broadcasts():
    g = rng.integers(0, 16, (9, 13), dtype=np.uint8) * 16
    out = decode_gif(encode_gif(g))
    np.testing.assert_array_equal(out, np.dstack([g] * 3))


def test_palette_overflow_raises():
    with pytest.raises(ValueError):
        encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))


def test_not_a_gif_raises():
    with pytest.raises(ValueError):
        decode_gif(b"II*\x00nope")


def test_interlaced_decode():
    """Hand-build an interlaced GIF: rows stored in 4-pass order, interlace
    flag set — decoder must reassemble the original row order."""
    img_idx = np.arange(16, dtype=np.uint8).reshape(16, 1) * np.ones((1, 8), np.uint8)
    img_idx %= 16
    h, w = img_idx.shape
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    stored = img_idx[order]

    plain = encode_gif(np.dstack([img_idx * 16] * 3))  # get palette layout from encoder
    # rebuild manually with the interlace bit and reordered rows
    from unravelsports_spark.functions.gifcodec import _lzw_encode

    palette = np.stack([np.arange(16, dtype=np.uint8) * 16] * 3, axis=1)
    pal_bytes = palette.tobytes()
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 3, 0, 0) + pal_bytes
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    mcs = 4
    lzw = _lzw_encode(bytes(stored.reshape(-1)), mcs)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    dec = decode_gif(bytes(out))
    np.testing.assert_array_equal(dec, np.dstack([img_idx * 16] * 3))
    assert plain  # silence unused warning


# -- property test -----------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def _pal_images(draw):
        h = draw(st.integers(1, 16))
        w = draw(st.integers(1, 16))
        k = draw(st.integers(1, 8))
        colors = np.array(
            draw(
                st.lists(
                    st.tuples(*[st.integers(0, 255)] * 3),
                    min_size=k, max_size=k, unique=True,
                )
            ),
            np.uint8,
        )
        n = h * w
        idx = np.frombuffer(draw(st.binary(min_size=n, max_size=n)), np.uint8) % len(colors)
        return colors[idx.reshape(h, w)]

    @given(_pal_images())
    @settings(max_examples=40, deadline=None)
    def test_gif_roundtrip_property(img):
        np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)

except ImportError:  # pragma: no cover
    pass
