"""Pure-Python image codecs: 24-bit BMP, binary PPM (P6), and (round
9) 8-bit PNG via stdlib zlib.

The real decode path behind the multimodal seam (``binary_ops``).
All three are fully specified public formats implementable
dependency-free — which is the point: the container ships no PIL,
and until round 4 ``decode_image`` was the repo's one stub. With
these, image payloads in the fixtures are REAL encoded images and
the decode query is oracle-checked end to end; only JPEG remains
PIL-gated.

Format notes (all from the public specs):

- BMP (Windows device-independent bitmap): 14-byte file header
  (``BM``, file size, pixel-array offset) + 40-byte
  ``BITMAPINFOHEADER`` (width, height, planes=1, bpp=24,
  compression=0). Pixel rows are stored BOTTOM-UP, each row padded to
  a 4-byte boundary, channels in BGR order.
- PPM ``P6`` (netpbm): ASCII header ``P6 <width> <height> <maxval>``
  terminated by one whitespace byte, then width*height RGB triplets
  top-down.
- PNG (RFC 2083 / W3C spec): 8-byte signature, CRC-checked chunks
  (IHDR/IDAT/IEND), scanlines = 1 filter byte + row bytes inside a
  zlib stream; decode supports bit depth 8, color types 0/2/6,
  no interlace, and all five filters (None/Sub/Up/Average/Paeth);
  encode emits color type 2 with filter 0 rows.

Decoding returns rows TOP-DOWN as a flat list of (r, g, b) tuples in
both cases, so pixel order is format-independent — the property the
oracle relies on.

This module is registered for cloudpickle BY-VALUE serialization in
``binary_ops`` so executors never need the repo on ``sys.path``
(the same constraint that forced earlier mapInPandas closures to be
self-contained).
"""

from __future__ import annotations

import struct
import zlib

Pixel = tuple[int, int, int]

_BMP_HEADER_SIZE = 14
_DIB_HEADER_SIZE = 40


def _bmp_row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_bmp(width: int, height: int, pixels: list[Pixel]) -> bytes:
    """Encode top-down RGB pixels as a 24-bit bottom-up BMP."""
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    stride = _bmp_row_stride(width)
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in reversed(range(height)):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR channel order
        rows.append(bytes(row) + pad)
    pixel_array = b"".join(rows)
    offset = _BMP_HEADER_SIZE + _DIB_HEADER_SIZE
    file_header = struct.pack(
        "<2sIHHI", b"BM", offset + len(pixel_array), 0, 0, offset
    )
    dib = struct.pack(
        "<IiiHHIIiiII",
        _DIB_HEADER_SIZE,
        width,
        height,  # positive height = bottom-up
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB, uncompressed
        len(pixel_array),
        2835,  # 72 DPI in pixels/metre
        2835,
        0,
        0,
    )
    return file_header + dib + pixel_array


def decode_bmp(payload: bytes) -> tuple[int, int, list[Pixel]]:
    """Decode a 24-bit uncompressed BMP to (width, height, top-down
    RGB pixels). Validates the header fields it relies on."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if dib_size < _DIB_HEADER_SIZE:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    stride = _bmp_row_stride(width)
    pixels: list[Pixel] = []
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        base = offset + src_y * stride
        for x in range(width):
            b, g, r = payload[base + x * 3 : base + x * 3 + 3]
            pixels.append((r, g, b))
    return width, height, pixels


def encode_ppm(width: int, height: int, pixels: list[Pixel]) -> bytes:
    """Encode top-down RGB pixels as binary PPM (P6, maxval 255)."""
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    return header + b"".join(bytes(p) for p in pixels)


def decode_ppm(payload: bytes) -> tuple[int, int, list[Pixel]]:
    """Decode binary PPM (P6) to (width, height, top-down RGB pixels).
    Handles comments and arbitrary whitespace in the header, per spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    i += 1  # exactly one whitespace byte after maxval
    data = payload[i : i + width * height * 3]
    pixels = [
        (data[k], data[k + 1], data[k + 2]) for k in range(0, len(data), 3)
    ]
    if len(pixels) != width * height:
        raise ValueError("truncated PPM pixel data")
    return width, height, pixels


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png(width: int, height: int, pixels: list[Pixel]) -> bytes:
    """Encode top-down RGB pixels as an 8-bit truecolor PNG (color
    type 2, no interlace, filter 0 on every scanline — the simplest
    spec-conformant stream; real encoders pick filters per row for
    compression, which only affects size, not pixels)."""
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        for x in range(width):
            raw += bytes(pixels[y * width + x])
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/above/upper-
    left to the linear estimate a + b - c, ties left > above > UL."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, list[Pixel]]:
    """Decode an 8-bit non-interlaced PNG (grayscale / RGB / RGBA) to
    (width, height, top-down RGB pixels) — dependency-free via stdlib
    zlib inflate + full five-filter unfiltering (None/Sub/Up/Average/
    Paeth, PNG spec §9). Alpha is dropped; grayscale replicates to
    (v, v, v) so pixel order and shape stay format-independent, the
    property the decode oracle relies on. CRCs are verified (a real
    ingest path rejects truncated/corrupt chunks here)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while i + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, i)
        if i + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, i + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced PNG supported "
            f"(depth={depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    prev = bytearray(stride)
    pixels: list[Pixel] = []
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for k in range(channels, stride):
                line[k] = (line[k] + line[k - channels]) & 0xFF
        elif ftype == 2:  # Up
            for k in range(stride):
                line[k] = (line[k] + prev[k]) & 0xFF
        elif ftype == 3:  # Average
            for k in range(stride):
                a = line[k - channels] if k >= channels else 0
                line[k] = (line[k] + ((a + prev[k]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for k in range(stride):
                a = line[k - channels] if k >= channels else 0
                c = prev[k - channels] if k >= channels else 0
                line[k] = (line[k] + _paeth(a, prev[k], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        for x in range(width):
            base = x * channels
            if channels == 1:
                v = line[base]
                pixels.append((v, v, v))
            else:
                pixels.append((line[base], line[base + 1], line[base + 2]))
        prev = line
    return width, height, pixels


def decode_payload(payload: bytes) -> tuple[str, int, int, list[Pixel]]:
    """Dispatch on magic bytes: (format, width, height, pixels)."""
    if payload[:2] == b"BM":
        w, h, px = decode_bmp(payload)
        return "bmp", w, h, px
    if payload[:2] == b"P6":
        w, h, px = decode_ppm(payload)
        return "ppm", w, h, px
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        w, h, px = decode_png(payload)
        return "png", w, h, px
    raise ValueError(f"unknown image magic {payload[:2]!r}")
