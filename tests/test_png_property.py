"""Property tests for the dependency-free PNG codec: any image
round-trips through encode_png, and the unfilter inverts every
spec filter on arbitrary pixel data (filters chosen per row, the
way real encoders emit them)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# Soak knob (VERDICT r11 #4): CODEC_FUZZ_SCALE multiplies every
# max_examples below (default 1 = CI budget). The round-12 soak ran
# at scale 25; census in docs/NOTES.md.
import os as _os

_FUZZ = max(1, int(_os.environ.get("CODEC_FUZZ_SCALE", "1")))

from mapreduce_lab_spark.multimodal.codecs import decode_png, encode_png
from tests.test_multimodal import _png_with_filters

_dims = st.tuples(st.integers(1, 9), st.integers(1, 9))


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


@settings(max_examples=40 * _FUZZ, deadline=None)
@given(_images())
def test_encode_decode_roundtrip(img):
    w, h, px = img
    assert decode_png(encode_png(w, h, px)) == (w, h, px)


@settings(max_examples=40 * _FUZZ, deadline=None)
@given(_images(), st.data())
def test_unfilter_inverts_every_filter_choice(img, data):
    w, h, px = img
    ftypes = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    assert decode_png(_png_with_filters(w, h, px, ftypes)) == (w, h, px)


# --- round-12 adversarial widening (VERDICT r11 #4) ---------------------------
#
# Filter-type x width x COLOR-TYPE edges: w=1 rows (the k >= channels
# guard never fires for Sub/Paeth's left/upper-left taps), grayscale
# (1 channel: the guard boundary is at byte 1, not 3) and RGBA
# (4 channels; alpha participates in filtering then gets dropped),
# plus IDAT split at arbitrary byte boundaries (decoders must
# concatenate IDAT payloads before inflating) and unknown ancillary
# chunks between critical ones.


def _png_any(w, h, channels, raw_samples, ftypes, idat_split=None, extra=None):
    """Assemble a PNG with per-row spec filtering over `channels`
    samples/pixel, optional IDAT split points and an injected
    ancillary chunk."""
    import struct
    import zlib

    from mapreduce_lab_spark.multimodal.codecs import (
        _paeth,
        _png_chunk,
        _PNG_SIG,
    )

    stride = w * channels
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        raw = bytes(raw_samples[y * stride : (y + 1) * stride])
        f = ftypes[y]
        out.append(f)
        for k in range(stride):
            a = raw[k - channels] if k >= channels else 0
            b = prev[k]
            c = prev[k - channels] if k >= channels else 0
            if f == 0:
                v = raw[k]
            elif f == 1:
                v = raw[k] - a
            elif f == 2:
                v = raw[k] - b
            elif f == 3:
                v = raw[k] - ((a + b) >> 1)
            else:
                v = raw[k] - _paeth(a, b, c)
            out.append(v & 0xFF)
        prev = raw
    color = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    z = zlib.compress(bytes(out))
    payload = bytearray(_PNG_SIG + _png_chunk(b"IHDR", ihdr))
    if extra:
        payload += _png_chunk(b"tEXt", extra)
    cuts = sorted(set(idat_split or []))
    last = 0
    for cut in cuts:
        if 0 < cut < len(z):
            payload += _png_chunk(b"IDAT", z[last:cut])
            last = cut
    payload += _png_chunk(b"IDAT", z[last:])
    payload += _png_chunk(b"IEND", b"")
    return bytes(payload)


@settings(max_examples=120 * _FUZZ, deadline=None)
@given(st.data())
def test_unfilter_inverts_across_color_types_and_widths(data):
    w = data.draw(st.integers(1, 6))
    h = data.draw(st.integers(1, 6))
    channels = data.draw(st.sampled_from([1, 3, 4]))
    n = w * h * channels
    samples = data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    ftypes = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    payload = _png_any(w, h, channels, samples, ftypes)
    ww, hh, px = decode_png(payload)
    assert (ww, hh) == (w, h)
    # expected RGB projection
    exp = []
    for i in range(w * h):
        s = samples[i * channels : (i + 1) * channels]
        exp.append((s[0], s[0], s[0]) if channels == 1 else tuple(s[:3]))
    assert px == exp


@settings(max_examples=60 * _FUZZ, deadline=None)
@given(st.data())
def test_idat_split_anywhere_and_ancillary_chunks_skipped(data):
    w, h = 5, 4
    n = w * h * 3
    samples = data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    ftypes = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    cuts = data.draw(st.lists(st.integers(1, 120), max_size=4))
    payload = _png_any(
        w, h, 3, samples, ftypes, idat_split=cuts, extra=b"k\x00v"
    )
    exp = [tuple(samples[i * 3 : i * 3 + 3]) for i in range(w * h)]
    assert decode_png(payload) == (w, h, exp)


def test_width_one_every_filter_every_color_type():
    """w=1: Sub/Paeth left taps are always zero; the guard boundary
    IS the whole row. Deterministic sweep of all 5 filters x 3 color
    types at h=5."""
    for channels in (1, 3, 4):
        n = 5 * channels
        samples = [(i * 37 + channels * 11) % 256 for i in range(n)]
        for f in range(5):
            payload = _png_any(1, 5, channels, samples, [f] * 5)
            ww, hh, px = decode_png(payload)
            assert (ww, hh) == (1, 5)
            exp = []
            for i in range(5):
                s = samples[i * channels : (i + 1) * channels]
                exp.append(
                    (s[0], s[0], s[0]) if channels == 1 else tuple(s[:3])
                )
            assert px == exp, (channels, f)
