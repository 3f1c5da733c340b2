"""Mu-law codec pins: exhaustive bit-parity with the stdlib reference
implementation (CPython audioop, present on 3.11) in both directions,
plus the companding error bound."""

from __future__ import annotations

import struct
import warnings

import pytest

from mapreduce_lab_spark.multimodal.codecs import mulaw_decode, mulaw_encode


def _audioop():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        try:
            import audioop
        except ImportError:  # removed in 3.13+
            return None
    return audioop


def test_encode_matches_reference_exhaustively():
    audioop = _audioop()
    if audioop is None:
        pytest.skip("stdlib audioop not available on this Python")
    for x in range(-32768, 32768):
        assert (
            audioop.lin2ulaw(struct.pack("<h", x), 2)[0] == mulaw_encode(x)
        ), x


def test_decode_matches_reference_exhaustively():
    audioop = _audioop()
    if audioop is None:
        pytest.skip("stdlib audioop not available on this Python")
    for b in range(256):
        assert (
            struct.unpack("<h", audioop.ulaw2lin(bytes([b]), 2))[0]
            == mulaw_decode(b)
        ), b


def test_companding_error_bound():
    """Quantization error grows with the segment: bounded by half the
    segment's step size (<= 2^(seg+3) in the 16-bit domain) and the
    decode is idempotent through a second round trip."""
    for x in range(-32768, 32768, 17):
        y = mulaw_decode(mulaw_encode(x))
        assert abs(y - x) <= 1024 + 132, (x, y)  # top-segment bound
        assert mulaw_decode(mulaw_encode(y)) == y, "companding fixpoint"
