"""Property tests for the GIF87a codec: LZW round-trip exactness
(including across the 4096-entry dictionary reset and code-width
growth boundaries), container rejection paths, and the KwKwK case."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_lab_spark.multimodal.codecs import (
    _lzw_compress_gif,
    _lzw_decompress_gif,
    decode_gif,
    decode_payload,
    encode_gif,
)


@st.composite
def _images(draw):
    w = draw(st.integers(1, 24))
    h = draw(st.integers(1, 24))
    vals = draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    return w, h, [(v, v, v) for v in vals]


@settings(max_examples=40, deadline=None)
@given(_images())
def test_gif_roundtrips_exactly(img):
    w, h, px = img
    assert decode_gif(encode_gif(w, h, px)) == (w, h, px)
    fmt, ww, hh, out = decode_payload(encode_gif(w, h, px))
    assert (fmt, ww, hh, out) == ("gif", w, h, px)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=1, max_size=4000), st.integers(2, 8))
def test_lzw_roundtrips_any_stream(data, min_size):
    lim = 1 << min_size
    data = bytes(b % lim for b in data)
    assert _lzw_decompress_gif(_lzw_compress_gif(data, min_size), min_size) == data


def test_lzw_crosses_dictionary_reset():
    """A long low-entropy stream pushes next_code past 4096, forcing
    the mid-stream CLEAR + width reset both sides must agree on."""
    data = bytes(((i * i) + i // 7) % 256 for i in range(12000))
    assert _lzw_decompress_gif(_lzw_compress_gif(data, 8), 8) == data


def test_lzw_kwkwk_case():
    """'ababab...' streams emit codes equal to next_code (the KwKwK
    special case every LZW decoder must special-case)."""
    data = b"abababababababab" * 4
    assert _lzw_decompress_gif(_lzw_compress_gif(data, 8), 8) == data


# The image descriptor sits at a FIXED offset in encode_gif output
# (13-byte header/LSD + 768-byte grayscale palette); searching for
# 0x2C would false-hit palette entry 44.
_DESC = 13 + 768


def test_gif_rejects_interlace_and_garbage():
    enc = bytearray(encode_gif(4, 4, [(9, 9, 9)] * 16))
    assert enc[_DESC] == 0x2C
    enc[_DESC + 9] |= 0x40  # set interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(enc))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError, match="truncated"):
        good = encode_gif(6, 6, [(200, 200, 200)] * 36)
        # cut the LZW stream mid-way: keep header + palette + first
        # few compressed bytes, then terminate the sub-blocks early
        cut = _DESC + 9 + 1  # descriptor + min code size
        decode_gif(good[: cut + 1] + b"\x01\x05\x00\x3b")


def test_gif_skips_gif89a_extension_blocks():
    enc = bytearray(encode_gif(3, 3, [(7, 7, 7)] * 9))
    enc[:6] = b"GIF89a"
    # inject a Graphic Control Extension before the image descriptor
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(enc[:_DESC]) + gce + bytes(enc[_DESC:])
    assert decode_gif(patched) == (3, 3, [(7, 7, 7)] * 9)
