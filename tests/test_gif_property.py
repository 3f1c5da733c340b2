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


def test_lzw_terminal_code_on_width_boundary():
    """Pinned falsifying example from the round-11 Hypothesis run
    (VERDICT r11 #1): the FINAL data code's decoder-side table add
    lands exactly on 2^width, so the decoder reads EOI at width+1.
    The encoder's terminal flush must apply the same growth check
    before writing EOI or the stream is malformed for ANY conforming
    decoder."""
    data = bytes([2, 2, 0, 1, 1, 2, 1, 0, 0, 2, 3])
    assert _lzw_decompress_gif(_lzw_compress_gif(data, 2), 2) == data
    # byte-literal twin of the same example, as reported
    raw = b"\x02\x02\x00\x01\x01\x02\x01\x00\x00\x02\x03"
    assert _lzw_decompress_gif(_lzw_compress_gif(raw, 2), 2) == raw


def test_lzw_terminal_boundary_sweep():
    """Deterministic sweep: for each min_code_size, walk stream
    lengths so the terminal add lands on/around every early width
    boundary — catches any remaining encoder/decoder width skew at
    stream end without relying on Hypothesis luck."""
    for mcs in (2, 3, 4, 8):
        lim = 1 << mcs
        base = bytes((i * 7 + i // 3) % lim for i in range(600))
        for n in range(1, 140):
            data = base[:n]
            assert (
                _lzw_decompress_gif(_lzw_compress_gif(data, mcs), mcs) == data
            ), f"mcs={mcs} n={n}"


def test_lzw_terminal_code_after_reset():
    """The analogous terminal interaction across the 4096 CLEAR: after
    a mid-stream reset the decoder's prev is None, so the terminal
    code must NOT trigger encoder-side growth. Build a stream whose
    final literal lands immediately after the dictionary reset."""
    data = bytes(((i * i) + i // 7) % 256 for i in range(12000))
    # find a length where compression ends right after a reset by
    # scanning a window near the reset point; round-trip must hold
    # for every cut in the window regardless of where the reset falls
    for n in range(9000, 9064):
        cut = data[:n]
        assert _lzw_decompress_gif(_lzw_compress_gif(cut, 8), 8) == cut


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
