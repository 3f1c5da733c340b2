"""Property tests for the dependency-free RIFF/WAVE PCM codec: PCM
is lossless, so roundtrips are exact for every width/channel combo,
and the chunk walker must survive files with extra metadata chunks
(the shape real recorders emit)."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

# Soak knob (VERDICT r11 #4): CODEC_FUZZ_SCALE multiplies every
# max_examples below (default 1 = CI budget). The round-12 soak ran
# at scale 25; census in docs/NOTES.md.
import os as _os

_FUZZ = max(1, int(_os.environ.get("CODEC_FUZZ_SCALE", "1")))

import pytest

from mapreduce_lab_spark.multimodal.codecs import decode_wav, encode_wav


@settings(max_examples=40 * _FUZZ, deadline=None)
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


@settings(max_examples=40 * _FUZZ, deadline=None)
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


# --- round-12 adversarial widening (VERDICT r11 #4) ---------------------------
#
# RIFF's subtle rule: chunks are WORD-aligned — an odd-sized chunk is
# followed by one pad byte that is NOT counted in its length field. A
# walker that forgets the pad desyncs by one byte and misreads every
# subsequent chunk id. Fuzz arbitrary metadata chunks of odd/even
# sizes around fmt/data, plus odd-length 8-bit mono data chunks.


def _wav_with_chunks(rate, channels, bits, samples, pre, mid, post):
    """RIFF/WAVE with arbitrary metadata chunks before fmt (pre),
    between fmt and data (mid), and after data (post) — each entry is
    (id4, body_bytes), padded per spec."""
    import struct

    def chunk(cid, body):
        return (
            cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) % 2 else b"")
        )

    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = bytes(samples)
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits
    )
    body = b"WAVE"
    for cid, cb in pre:
        body += chunk(cid, cb)
    body += chunk(b"fmt ", fmt)
    for cid, cb in mid:
        body += chunk(cid, cb)
    body += chunk(b"data", data)
    for cid, cb in post:
        body += chunk(cid, cb)
    return b"RIFF" + struct.pack("<I", len(body)) + body


_chunk_ids = st.sampled_from([b"LIST", b"fact", b"cue ", b"junk", b"bext"])
_chunks = st.lists(
    st.tuples(_chunk_ids, st.binary(min_size=0, max_size=9)), max_size=3
)


@settings(max_examples=80 * _FUZZ, deadline=None)
@given(
    st.integers(8000, 48000),
    st.sampled_from([8, 16]),
    st.data(),
)
def test_odd_padded_metadata_chunks_never_desync_the_walk(rate, bits, data):
    channels = data.draw(st.integers(1, 2))
    n = data.draw(st.integers(1, 9)) * channels
    if bits == 16:
        samples = data.draw(
            st.lists(st.integers(-32768, 32767), min_size=n, max_size=n)
        )
    else:
        samples = data.draw(
            st.lists(st.integers(0, 255), min_size=n, max_size=n)
        )
    pre = data.draw(_chunks)
    mid = data.draw(_chunks)
    post = data.draw(_chunks)
    payload = _wav_with_chunks(rate, channels, bits, samples, pre, mid, post)
    assert decode_wav(payload) == (rate, channels, bits, samples)


def test_odd_length_8bit_data_chunk_then_trailer():
    """Odd data length (8-bit mono, odd sample count): the pad byte
    after data must not leak into the sample list, and the trailing
    chunk after the pad must still parse (proving the walk stayed
    aligned)."""
    samples = [7, 250, 0]
    payload = _wav_with_chunks(
        8000, 1, 8, samples, [], [], [(b"LIST", b"INFOx")]
    )
    assert decode_wav(payload) == (8000, 1, 8, samples)
    # encoder-side twin: encode_wav pads odd 8-bit data too
    from mapreduce_lab_spark.multimodal.codecs import encode_wav

    enc = encode_wav(8000, samples, bits=8, channels=1)
    assert len(enc) % 2 == 0
    assert decode_wav(enc) == (8000, 1, 8, samples)


def test_odd_fmt_extension_chunk():
    """A 17-byte fmt chunk (odd: 16 spec bytes + 1 extension byte)
    exercises the pad rule on fmt itself; the decoder reads the first
    16 bytes and must skip the pad to find data."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8) + b"\x05"
    data = bytes([1, 2, 3, 4])
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"\x00"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(payload) == (8000, 1, 8, [1, 2, 3, 4])
