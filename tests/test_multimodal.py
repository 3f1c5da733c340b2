"""Unit tests for the multimodal decode seam and fake decoder."""

from __future__ import annotations

import pytest

from mapreduce_lab_spark.multimodal.binary_ops import decode_image, fake_decode


def test_decode_image_gates_compressed_formats_only():
    """BMP/PPM/PNG decode natively (see the codec tests below); only
    JPEG stays behind the PIL import gate."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: gate not exercised in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16, "jpeg")


def test_decode_image_png_native_no_pil():
    """A real PNG payload decodes through the seam with no PIL."""
    from mapreduce_lab_spark.multimodal.codecs import encode_png

    px = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    assert decode_image(encode_png(2, 2, px), "png") == ("png", 2, 2, px)


def test_fake_decode_deterministic_shape():
    px = fake_decode(b"abc", width=4, height=3)
    assert px == [97, 98, 99, 97, 98, 99, 97]
    assert fake_decode(b"", width=2, height=2) == [0, 0, 0, 0]
    assert fake_decode(b"abc", width=4, height=3) == px


# --- pure-Python BMP / PPM codecs ------------------------------------------


def test_bmp_roundtrip_exercises_padding_and_flip():
    """Widths 1..6 hit every 4-byte row-padding case; pixel order must
    survive the bottom-up storage flip and BGR channel swap."""
    from mapreduce_lab_spark.multimodal.codecs import decode_bmp, encode_bmp

    for w in range(1, 7):
        h = 3
        px = [((x * 7 + y * 31) % 256, (x + y) % 256, (x * y) % 256)
              for y in range(h) for x in range(w)]
        blob = encode_bmp(w, h, px)
        assert blob[:2] == b"BM"
        # row stride is padded to 4 bytes: total size is header + h*stride
        stride = (w * 3 + 3) & ~3
        assert len(blob) == 54 + h * stride
        assert decode_bmp(blob) == (w, h, px)


def test_ppm_roundtrip_and_comment_header():
    from mapreduce_lab_spark.multimodal.codecs import decode_ppm, encode_ppm

    px = [(i % 256, (i * 3) % 256, (i * 7) % 256) for i in range(12)]
    blob = encode_ppm(4, 3, px)
    assert decode_ppm(blob) == (4, 3, px)
    # Spec allows comments anywhere in the header.
    commented = b"P6\n# a comment line\n4 3\n255\n" + blob.split(b"255\n", 1)[1]
    assert decode_ppm(commented) == (4, 3, px)


def test_decode_payload_dispatches_on_magic():
    import pytest

    from mapreduce_lab_spark.multimodal.codecs import (
        decode_payload, encode_bmp, encode_ppm,
    )

    from mapreduce_lab_spark.multimodal.codecs import encode_png

    px = [(9, 8, 7)] * 6
    assert decode_payload(encode_bmp(3, 2, px))[0] == "bmp"
    assert decode_payload(encode_ppm(3, 2, px))[0] == "ppm"
    assert decode_payload(encode_png(3, 2, px))[0] == "png"
    # 4 bytes of PNG magic without the full 8-byte signature is junk
    with pytest.raises(ValueError, match="unknown image magic"):
        decode_payload(b"\x89PNG....")


# --- PNG codec: round-trip, all five filters, integrity ---------------------


def test_png_roundtrip_rgb():
    from mapreduce_lab_spark.multimodal.codecs import decode_png, encode_png

    px = [((x * 37) % 256, (x * 89) % 256, (x * 151) % 256) for x in range(12)]
    assert decode_png(encode_png(4, 3, px)) == (4, 3, px)


def _png_with_filters(w, h, px, ftypes):
    """Assemble a PNG whose row r uses filter ftypes[r], applying the
    spec's forward filtering so the decoder's unfilter must invert
    exactly (PNG spec §9: Sub/Up/Average/Paeth over raw bytes)."""
    import struct
    import zlib

    from mapreduce_lab_spark.multimodal.codecs import _paeth, _png_chunk, _PNG_SIG

    stride = w * 3
    rows = [
        bytes(b for x in range(w) for b in px[y * w + x]) for y in range(h)
    ]
    out = bytearray()
    prev = bytes(stride)
    for y, raw in enumerate(rows):
        f = ftypes[y]
        out.append(f)
        for k in range(stride):
            a = raw[k - 3] if k >= 3 else 0
            b = prev[k]
            c = prev[k - 3] if k >= 3 else 0
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
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_unfilters_all_five_filter_types():
    from mapreduce_lab_spark.multimodal.codecs import decode_png

    w, h = 5, 5
    px = [((x * 13 + 7) % 256, (x * 31) % 256, (255 - x * 17) % 256)
          for x in range(w * h)]
    payload = _png_with_filters(w, h, px, ftypes=[0, 1, 2, 3, 4])
    assert decode_png(payload) == (w, h, px)


def test_png_grayscale_and_rgba_normalize_to_rgb():
    import struct
    import zlib

    from mapreduce_lab_spark.multimodal.codecs import (
        _png_chunk, _PNG_SIG, decode_png,
    )

    # 2x1 grayscale, filter 0: values 10, 200
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    pay = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes([0, 10, 200])))
           + _png_chunk(b"IEND", b""))
    assert decode_png(pay) == (2, 1, [(10, 10, 10), (200, 200, 200)])
    # 1x1 RGBA, filter 0: alpha dropped
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    pay = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes([0, 1, 2, 3, 128])))
           + _png_chunk(b"IEND", b""))
    assert decode_png(pay) == (1, 1, [(1, 2, 3)])


def test_png_rejects_corrupt_crc_and_truncation():
    from mapreduce_lab_spark.multimodal.codecs import decode_png, encode_png

    px = [(1, 2, 3)] * 4
    good = bytearray(encode_png(2, 2, px))
    good[20] ^= 0xFF  # flip a byte inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError):
        decode_png(encode_png(2, 2, px)[:-30])


def test_decode_image_seam_uses_real_codecs():
    """The seam decodes BMP/PPM for real (no PIL needed); only
    compressed formats still raise without a codec library."""
    import pytest

    from mapreduce_lab_spark.multimodal.binary_ops import decode_image
    from mapreduce_lab_spark.multimodal.codecs import encode_bmp

    px = [(1, 2, 3)] * 4
    assert decode_image(encode_bmp(2, 2, px), "bmp") == ("bmp", 2, 2, px)
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG\r\n\x1a\n", "png")


def test_decode_image_falls_through_to_pil_on_unsupported_variant():
    """A payload with a BMP/PPM magic but a variant the pure-Python
    codec rejects (e.g. 8-bit BMP) must try the PIL path — not die on
    the codec's ValueError (ADVICE r4). Without PIL installed that
    surfaces as NotImplementedError; either way, never ValueError."""
    import pytest

    from mapreduce_lab_spark.multimodal.binary_ops import decode_image

    # Minimal BMP header claiming 8 bits per pixel (unsupported).
    bogus = b"BM" + b"\x00" * 26 + b"\x08\x00" + b"\x00" * 20
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        with pytest.raises(Exception) as exc:
            decode_image(bogus, "bmp")
        assert not isinstance(exc.value, ValueError)
    else:
        with pytest.raises(NotImplementedError):
            decode_image(bogus, "bmp")


def test_decode_oracle_ascii_assumption(spark, sf_dir):
    """_DECODE_SQL's oracle indexes text by CHARACTER while the Spark
    side cycles utf-8 BYTES; parity needs the fixture corpus to be
    pure ASCII and the empty-text guard to hold. Pin both so a future
    fixture with unicode or empty docs fails HERE, not as a silent
    driver hash mismatch."""
    from pyspark.sql import functions as F

    from mapreduce_lab_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    non_ascii = docs.filter(
        F.octet_length(F.encode("text", "utf-8")) != F.length("text")
    ).count()
    assert non_ascii == 0, f"{non_ascii} non-ASCII documents break _DECODE_SQL parity"


def test_bmp_ppm_roundtrip_fuzz():
    """Round-12 codec-lane fuzz parity for the two simplest formats:
    BMP stride padding at every width mod 4, top-down vs bottom-up
    row order, and PPM header whitespace/comment variants over
    random pixels (deterministic seed)."""
    import random

    from mapreduce_lab_spark.multimodal.codecs import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = random.Random(12)
    for _ in range(40):
        w, h = rng.randint(1, 13), rng.randint(1, 13)
        px = [
            tuple(rng.randint(0, 255) for _ in range(3)) for _ in range(w * h)
        ]
        assert decode_bmp(encode_bmp(w, h, px)) == (w, h, px)
        blob = encode_ppm(w, h, px)
        assert decode_ppm(blob) == (w, h, px)
        # header laundering: comments + extra whitespace before fields
        hdr_end = blob.index(b"255\n") + 4
        wild = (
            b"P6\n# c1\n  # c2\n "
            + f"{w}".encode()
            + b"\t\n"
            + f"{h}".encode()
            + b" # trailing\n 255\n"
            + blob[hdr_end:]
        )
        assert decode_ppm(wild) == (w, h, px)
