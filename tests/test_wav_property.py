"""Property tests for the dependency-free RIFF/WAVE PCM codec: PCM
is lossless, so roundtrips are exact for every width/channel combo,
and the chunk walker must survive files with extra metadata chunks
(the shape real recorders emit)."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from mapreduce_lab_spark.multimodal.codecs import decode_wav, encode_wav


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 192000),
    st.integers(1, 4),
    st.lists(st.integers(-32768, 32767), max_size=300),
)
def test_pcm16_roundtrip_exact(rate, channels, frames):
    samples = [s for s in frames for _ in range(channels)]
    assert decode_wav(encode_wav(rate, samples, bits=16, channels=channels)) == (
        rate,
        channels,
        16,
        samples,
    )


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 192000),
    st.integers(1, 4),
    st.lists(st.integers(0, 255), max_size=301),
)
def test_pcm8_roundtrip_exact(rate, channels, frames):
    samples = [s for s in frames for _ in range(channels)]
    assert decode_wav(encode_wav(rate, samples, bits=8, channels=channels)) == (
        rate,
        channels,
        8,
        samples,
    )


def test_extra_chunks_are_skipped():
    """Insert a LIST metadata chunk (odd-length, so word-alignment is
    exercised too) between fmt and data; decode must ignore it."""
    enc = encode_wav(8000, [1, -2, 3], bits=16)
    fmt_at = enc.find(b"fmt ")
    fmt_end = fmt_at + 8 + struct.unpack("<I", enc[fmt_at + 4 : fmt_at + 8])[0]
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    patched = enc[:fmt_end] + meta + enc[fmt_end:]
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    assert decode_wav(patched) == (8000, 1, 16, [1, -2, 3])


def test_rejects_non_wav_and_non_pcm():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI LIST")
    enc = bytearray(encode_wav(8000, [0, 0], bits=16))
    tag_at = enc.find(b"fmt ") + 8
    enc[tag_at] = 3  # IEEE float format tag
    with pytest.raises(ValueError):
        decode_wav(bytes(enc))


def test_rejects_data_before_fmt_and_missing_data():
    with pytest.raises(ValueError):
        decode_wav(
            b"RIFF" + struct.pack("<I", 12) + b"WAVE"
            + b"data" + struct.pack("<I", 2) + b"\x01\x02"
        )
    enc = encode_wav(8000, [1], bits=16)
    data_at = enc.find(b"data")
    with pytest.raises(ValueError):
        decode_wav(enc[:data_at])


def test_encode_validates_inputs():
    with pytest.raises(ValueError):
        encode_wav(8000, [1, 2, 3], bits=16, channels=2)  # not a multiple
    with pytest.raises(ValueError):
        encode_wav(8000, [1], bits=12)
