"""Property tests for the dependency-free baseline JPEG codec.

JPEG is lossy, so — unlike the PNG twin (test_png_property.py) — the
general roundtrip contract is a TOLERANCE bound, not equality. The
exactness the oracled ``multimodal_jpeg_decode_stats`` query stands
on is pinned separately: with unit quantization tables, an image
whose every 8x8 block is a flat grayscale value round-trips EXACTLY
(the only nonzero coefficient per block is the integer DC; see the
codec's commentary for the float-residue argument).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# Soak knob (VERDICT r11 #4): CODEC_FUZZ_SCALE multiplies every
# max_examples below (default 1 = CI budget). The round-12 soak ran
# at scale 25; census in docs/NOTES.md.
import os as _os

_FUZZ = max(1, int(_os.environ.get("CODEC_FUZZ_SCALE", "1")))

import pytest

from mapreduce_lab_spark.multimodal.codecs import decode_jpeg, encode_jpeg

# Measured worst max-abs channel error over 90 random images (incl.
# saturated-color extremes) at quant=1 is 3; bound 6 = 2x margin.
MAX_ERR = 6

_dims = st.tuples(st.integers(1, 17), st.integers(1, 17))


@st.composite
def _images(draw):
    w, h = draw(_dims)
    px = draw(
        st.lists(
            st.tuples(*[st.integers(0, 255)] * 3),
            min_size=w * h,
            max_size=w * h,
        )
    )
    return w, h, px


@settings(max_examples=25 * _FUZZ, deadline=None)
@given(_images())
def test_roundtrip_dims_exact_and_pixels_within_tolerance(img):
    w, h, px = img
    ww, hh, out = decode_jpeg(encode_jpeg(w, h, px))
    assert (ww, hh) == (w, h)
    assert len(out) == w * h
    assert all(
        abs(a - b) <= MAX_ERR for p, q in zip(px, out) for a, b in zip(p, q)
    )


@settings(max_examples=25 * _FUZZ, deadline=None)
@given(_dims, st.integers(0, 255))
def test_flat_grayscale_roundtrips_exactly(dims, v):
    w, h = dims
    px = [(v, v, v)] * (w * h)
    assert decode_jpeg(encode_jpeg(w, h, px)) == (w, h, px)


@settings(max_examples=25 * _FUZZ, deadline=None)
@given(_dims, st.data())
def test_block_flat_grayscale_roundtrips_exactly(dims, data):
    """The exactness contract the oracled JPEG query relies on: one
    flat grayscale value per 8x8 block, values varying across blocks
    (so the DC prediction chain and EOB paths are real)."""
    w, h = dims
    nbx, nby = (w + 7) // 8, (h + 7) // 8
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=nbx * nby, max_size=nbx * nby)
    )
    px = [
        (vals[(y // 8) * nbx + x // 8],) * 3
        for y in range(h)
        for x in range(w)
    ]
    assert decode_jpeg(encode_jpeg(w, h, px)) == (w, h, px)


@settings(max_examples=15 * _FUZZ, deadline=None)
@given(_images())
def test_grayscale_single_component_mode(img):
    w, h, px = img
    gray = [(p[0], p[0], p[0]) for p in px]
    ww, hh, out = decode_jpeg(encode_jpeg(w, h, gray, grayscale=True))
    assert (ww, hh) == (w, h)
    assert all(
        abs(a - b) <= MAX_ERR for p, q in zip(gray, out) for a, b in zip(p, q)
    )
    # single-component output is replicated to (v, v, v)
    assert all(p[0] == p[1] == p[2] for p in out)


@settings(max_examples=10 * _FUZZ, deadline=None)
@given(_images(), st.integers(2, 16))
def test_coarser_quantization_still_decodes_with_exact_dims(img, q):
    w, h, px = img
    ww, hh, out = decode_jpeg(encode_jpeg(w, h, px, quant=q))
    assert (ww, hh) == (w, h) and len(out) == w * h


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    good = encode_jpeg(9, 9, [(5, 5, 5)] * 81)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])


def test_rejects_progressive_marker():
    good = bytearray(encode_jpeg(8, 8, [(5, 5, 5)] * 64))
    sof = good.find(b"\xff\xc0")
    good[sof + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))


def test_byte_stuffing_roundtrip():
    """Content tuned to emit 0xFF bytes in the entropy stream (dense
    random noise makes long Huffman runs); the unstuffing path must
    invert the writer's stuffing bit-exactly. Deterministic seeds."""
    import random

    for seed in range(5):
        random.seed(seed)
        w, h = 16, 16
        px = [
            tuple(random.randrange(256) for _ in range(3))
            for _ in range(w * h)
        ]
        enc = encode_jpeg(w, h, px)
        # entropy segment sits between SOS payload and EOI
        assert b"\xff\x00" in enc  # stuffing actually exercised
        ww, hh, out = decode_jpeg(enc)
        assert (ww, hh) == (w, h)
        assert all(
            abs(a - b) <= MAX_ERR
            for p, q in zip(px, out)
            for a, b in zip(p, q)
        )


@settings(max_examples=20 * _FUZZ, deadline=None)
@given(_dims, st.data())
def test_420_block_flat_grayscale_roundtrips_exactly(dims, data):
    """4:2:0 keeps the block-flat exactness contract: flat 8x8 luma
    blocks stay flat under the 16x16 MCU tiling (block boundaries are
    8-aligned and edge padding replicates a constant), and flat-128
    chroma survives 2x2 averaging exactly."""
    w, h = dims
    nbx = (w + 7) // 8
    nby = (h + 7) // 8
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=nbx * nby, max_size=nbx * nby)
    )
    px = [
        (vals[(y // 8) * nbx + x // 8],) * 3
        for y in range(h)
        for x in range(w)
    ]
    assert decode_jpeg(encode_jpeg(w, h, px, subsampling="420")) == (w, h, px)


@settings(max_examples=15 * _FUZZ, deadline=None)
@given(_images())
def test_420_grayscale_within_tolerance_and_dims_exact(img):
    w, h, px = img
    gray = [(p[0],) * 3 for p in px]
    ww, hh, out = decode_jpeg(encode_jpeg(w, h, gray, subsampling="420"))
    assert (ww, hh) == (w, h) and len(out) == w * h
    # flat chroma -> only luma quantization error (measured max 1)
    assert all(
        abs(a - b) <= MAX_ERR for p, q in zip(gray, out) for a, b in zip(p, q)
    )


@settings(max_examples=10 * _FUZZ, deadline=None)
@given(_images())
def test_420_color_decodes_with_exact_dims(img):
    """Chroma subsampling is lossy for saturated per-pixel color noise
    BY DESIGN (4 pixels share one chroma sample) — geometry and luma
    still hold; no per-channel bound is claimed for color content."""
    w, h, px = img
    ww, hh, out = decode_jpeg(encode_jpeg(w, h, px, subsampling="420"))
    assert (ww, hh) == (w, h) and len(out) == w * h


def test_rejects_sampling_above_two():
    good = bytearray(encode_jpeg(8, 8, [(5, 5, 5)] * 64, subsampling="420"))
    sof = good.find(b"\xff\xc0")
    good[sof + 11] = 0x33  # comp 1 sampling 3x3
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))


def test_rejects_multi_scan_partial_sos():
    """A legal multi-scan baseline JPEG emits one SOS per component;
    decoding only the first scan would leave the other planes zeroed
    and silently return garbage. The decoder must raise so
    decode_image falls through to PIL (ADVICE r10)."""
    good = bytearray(encode_jpeg(8, 8, [(200, 30, 90)] * 64))
    sos = good.find(b"\xff\xda")
    # Rewrite the 3-component SOS (len 12: ns=3, 3 (cs,tt) pairs,
    # Ss Se AhAl) as a 1-component scan (len 8) keeping component 1.
    patched = bytes(
        good[: sos + 2]           # up to and incl. FFDA
        + b"\x00\x08\x01"         # seglen=8, ns=1
        + good[sos + 5 : sos + 7]   # (cs1, tt1)
        + good[sos + 11 : sos + 14]  # Ss, Se, AhAl
        + good[sos + 14 :]        # entropy data (never reached)
    )
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(patched)


def test_rejects_noninterleaved_subsampled_single_component():
    """T.81 gives a single-component scan per-block geometry; with
    sampling factors above 1x1 that differs from the interleaved MCU
    layout this decoder implements, so it must refuse."""
    good = bytearray(encode_jpeg(8, 8, [(5, 5, 5)] * 64, grayscale=True))
    sof = good.find(b"\xff\xc0")
    good[sof + 11] = 0x22  # declare 2x2 sampling on the only component
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bytes(good))


# --- DRI/RSTn restart-interval fuzz (VERDICT r11 #4) --------------------------
#
# The encoder can now emit real restart markers (DRI segment + RSTn
# every N MCUs, predictors reset, stream byte-aligned with stuffed
# 1-padding). The strongest checkable contract: restart placement is
# pure framing — decode(stream with restarts) must equal
# decode(plain stream) BIT-EXACTLY in every mode, for any interval,
# including ri=1 (marker between every MCU pair, maximal boundary
# pressure on the bit reader's align/unstuff path) and intervals
# dividing the MCU count exactly (no trailing partial segment).


@settings(max_examples=60 * _FUZZ, deadline=None)
@given(_images(), st.integers(1, 9))
def test_restart_interval_is_pure_framing_444(img, ri):
    w, h, px = img
    plain = decode_jpeg(encode_jpeg(w, h, px))
    marked = decode_jpeg(encode_jpeg(w, h, px, restart_interval=ri))
    assert marked == plain


@settings(max_examples=40 * _FUZZ, deadline=None)
@given(_images(), st.integers(1, 9))
def test_restart_interval_is_pure_framing_420(img, ri):
    w, h, px = img
    plain = decode_jpeg(encode_jpeg(w, h, px, subsampling="420"))
    marked = decode_jpeg(
        encode_jpeg(w, h, px, subsampling="420", restart_interval=ri)
    )
    assert marked == plain


@settings(max_examples=40 * _FUZZ, deadline=None)
@given(_dims, st.data(), st.integers(1, 9))
def test_restart_grayscale_block_flat_exact(dims, data, ri):
    """Restart markers + the exact-roundtrip class: flat 8x8 blocks
    round-trip exactly even with predictors reset at every boundary."""
    w, h = dims
    bw, bh = (w + 7) // 8, (h + 7) // 8
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=bw * bh, max_size=bw * bh)
    )
    px = [
        (vals[(y // 8) * bw + (x // 8)],) * 3
        for y in range(h)
        for x in range(w)
    ]
    enc = encode_jpeg(w, h, px, grayscale=True, restart_interval=ri)
    assert decode_jpeg(enc) == (w, h, px)


def test_restart_interval_exactly_divides_mcu_count():
    """No trailing partial restart segment: 4x2 MCUs at ri=2 and ri=4
    (and ri=8 == total) — the encoder must never emit a marker AFTER
    the final MCU, and the decoder must not expect one."""
    w, h = 32, 16  # 4x2 = 8 MCUs at 444
    px = [((x * 7 + y * 13) % 256,) * 3 for y in range(h) for x in range(w)]
    plain = decode_jpeg(encode_jpeg(w, h, px))
    for ri in (1, 2, 4, 8):
        assert decode_jpeg(encode_jpeg(w, h, px, restart_interval=ri)) == plain


def test_restart_marker_bytes_present_and_cycling():
    """The emitted stream must contain REAL RSTn markers cycling
    D0..D7 and a DRI segment — not just decode by luck."""
    w, h = 80, 8  # 10 MCUs at 444, ri=1 -> 9 markers, cycle wraps
    px = [((x * 31 + y * 17) % 256,) * 3 for y in range(h) for x in range(w)]
    enc = encode_jpeg(w, h, px, restart_interval=1)
    assert b"\xff\xdd" in enc  # DRI segment
    import re

    markers = [
        m.group(0)[1] - 0xD0 for m in re.finditer(rb"\xff[\xd0-\xd7]", enc)
    ]
    # 9 boundaries: n cycles 0,1,...,7,0
    assert markers == [i % 8 for i in range(9)], markers
