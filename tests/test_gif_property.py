"""Property tests for the GIF87a codec: LZW round-trip exactness
(including across the 4096-entry dictionary reset and code-width
growth boundaries), container rejection paths, and the KwKwK case."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# Soak knob (VERDICT r11 #4): CODEC_FUZZ_SCALE multiplies every
# max_examples below (default 1 = CI budget). The round-12 soak ran
# at scale 25; census in docs/NOTES.md.
import os as _os

_FUZZ = max(1, int(_os.environ.get("CODEC_FUZZ_SCALE", "1")))

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


@settings(max_examples=40 * _FUZZ, deadline=None)
@given(_images())
def test_gif_roundtrips_exactly(img):
    w, h, px = img
    assert decode_gif(encode_gif(w, h, px)) == (w, h, px)
    fmt, ww, hh, out = decode_payload(encode_gif(w, h, px))
    assert (fmt, ww, hh, out) == ("gif", w, h, px)


@settings(max_examples=20 * _FUZZ, deadline=None)
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


# --- round-12 container-edge widening (VERDICT r11 #4) -------------------------


def _regif(payload: bytes, chunk: int, local_palette: bool) -> bytes:
    """Repackage an encode_gif stream: re-split the LZW bytes into
    sub-blocks of size `chunk` and optionally move the palette from
    the logical screen to a LOCAL color table on the image descriptor
    (reversed, with indices remapped so pixels are unchanged)."""
    assert payload[_DESC] == 0x2C
    # descriptor = separator + <HHHHB> = 10 bytes; packed flag last
    min_code = payload[_DESC + 10]
    comp = bytearray()
    pos = _DESC + 11
    while payload[pos] != 0:
        ln = payload[pos]
        comp += payload[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    tail = payload[pos + 1 :]  # trailer
    palette = payload[13 : 13 + 768]
    hdr = bytearray(payload[:13])
    desc = bytearray(payload[_DESC : _DESC + 10])
    out = bytearray()
    if local_palette:
        hdr[10] &= 0x7F  # drop global table flag
        out += hdr[:13]
        desc[9] = (desc[9] & 0x38) | 0x80 | 0x07  # local table, 256 entries
        out += desc
        out += palette  # same palette; indices unchanged
    else:
        out += payload[: _DESC + 10]
    out += bytes([min_code])
    for i in range(0, len(comp), chunk):
        blk = comp[i : i + chunk]
        out += bytes([len(blk)]) + blk
    out += b"\x00" + tail
    return bytes(out)


def test_subblock_fragmentation_and_local_color_table():
    """The LZW stream split into 1-byte sub-blocks (maximal
    fragmentation), at 255 (the spec max), and mid-range — and the
    palette moved to a LOCAL color table with the global flag dropped
    — must all decode to identical pixels."""
    w, h = 19, 13
    px = [((x * 41 + y * 3) % 256,) * 3 for y in range(h) for x in range(w)]
    base = encode_gif(w, h, px)
    expect = decode_gif(base)
    assert expect == (w, h, px)
    for chunk in (1, 2, 254, 255):
        assert decode_gif(_regif(base, chunk, False)) == expect, chunk
        assert decode_gif(_regif(base, chunk, True)) == expect, chunk


def test_extension_with_255_byte_subblocks_skipped():
    """A GIF89a application extension whose sub-blocks are the full
    255 bytes must be skipped without desyncing the walk."""
    enc = bytearray(encode_gif(4, 4, [(3, 3, 3)] * 16))
    enc[:6] = b"GIF89a"
    ext = b"\x21\xff" + b"\xff" + b"A" * 255 + b"\x20" + b"B" * 32 + b"\x00"
    patched = bytes(enc[:_DESC]) + ext + bytes(enc[_DESC:])
    assert decode_gif(patched) == (4, 4, [(3, 3, 3)] * 16)
