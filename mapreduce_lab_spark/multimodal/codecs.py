"""Pure-Python image codecs: 24-bit BMP, binary PPM (P6), 8-bit PNG
via stdlib zlib (round 9), baseline-sequential JPEG (round 10), and
GIF87a with from-scratch variable-width LZW (round 11).

The real decode path behind the multimodal seam (``binary_ops``).
All four are fully specified public formats implementable
dependency-free — which is the point: the container ships no PIL,
and until round 4 ``decode_image`` was the repo's one stub. With
these, image payloads in the fixtures are REAL encoded images and
the decode queries are oracle-checked end to end; PIL remains only
as the fallback for variants outside the baseline scope.

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
    if payload[:2] == b"\xff\xd8":
        w, h, px = decode_jpeg(payload)
        return "jpeg", w, h, px
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, px = decode_gif(payload)
        return "gif", w, h, px
    raise ValueError(f"unknown image magic {payload[:2]!r}")


# --- JPEG (baseline sequential, ITU-T T.81) ----------------------------------

# Round-10 closure of the last PIL-gated codec: a dependency-free
# baseline-sequential JPEG encoder/decoder. Scope (all from the
# public T.81 spec + JFIF colour conventions):
#
# - encode: 8-bit 3-component YCbCr 4:4:4 or 4:2:0 (2x2-averaged
#   chroma) or 1-component grayscale, unit quantization tables by
#   default (max fidelity), the Annex K.3 example Huffman tables, no
#   restart markers.
# - decode: baseline DCT (SOF0), 8-bit, general sampling factors up
#   to 2x2 (4:4:4, 4:2:0, 4:2:2, grayscale; nearest-sample chroma
#   upsampling), DHT/DQT from the stream (multi-table segments),
#   DRI/RSTn restart handling, APPn/COM skipped. Progressive (SOF2),
#   12-bit, and sampling factors above 2 raise ValueError — the ``decode_image`` seam falls through to PIL for
#   those exactly as before.
#
# Exactness note (what makes the oracled JPEG query possible): with
# unit quant tables, an image whose every 8x8 block is a FLAT
# grayscale value round-trips EXACTLY — the only nonzero coefficient
# per block is DC = 8*(v-128) (an exact integer after the rounded
# quantize; the float residue of the AC cancellation is ~1e-13 and
# rounds to 0), the IDCT of a DC-only block is v-128 +- ~1e-11, and
# the JFIF luma weights sum to 1 so grayscale survives both colour
# conversions. tests/test_jpeg_property.py pins this plus a measured
# tolerance bound for arbitrary images.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.3 example Huffman tables (BITS per code length 1..16,
# then the symbol values in canonical order).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> list[list[float]]:
    import math

    m = []
    for u in range(8):
        c = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        m.append(
            [c * math.cos((2 * x + 1) * u * math.pi / 16.0) / 2.0 for x in range(8)]
        )
    return m


_DCT_M = _dct_matrix()


def _round_half_away(x: float) -> int:
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _fdct_quant(block: list[list[float]], qt: list[int]) -> list[int]:
    """Forward 8x8 DCT (separable, level-shifted input) + quantize;
    returns the 64 coefficients in ZIGZAG order."""
    m = _DCT_M
    # rows pass: t = block @ m^T   (t[y][u] = sum_x block[y][x] m[u][x])
    t = [[sum(row[x] * m[u][x] for x in range(8)) for u in range(8)] for row in block]
    # cols pass: S[v][u] = sum_y m[v][y] t[y][u]
    s = [[sum(m[v][y] * t[y][u] for y in range(8)) for u in range(8)] for v in range(8)]
    return [
        _round_half_away(s[z // 8][z % 8] / qt[i])
        for i, z in enumerate(_ZIGZAG)
    ]


def _idct_block(coef_zz: list[int], qt: list[int]) -> list[list[int]]:
    """Dequantize zigzag coefficients, inverse 8x8 DCT, level-unshift;
    returns an 8x8 grid of clamped 0..255 ints."""
    m = _DCT_M
    s = [[0.0] * 8 for _ in range(8)]
    for i, z in enumerate(_ZIGZAG):
        if coef_zz[i]:
            s[z // 8][z % 8] = coef_zz[i] * qt[i]
    # t = m^T @ S  (t[y][u] = sum_v m[v][y] s[v][u])
    t = [[sum(m[v][y] * s[v][u] for v in range(8)) for u in range(8)] for y in range(8)]
    out = []
    for y in range(8):
        row = []
        for x in range(8):
            v = _round_half_away(sum(t[y][u] * m[u][x] for u in range(8)) + 128.0)
            row.append(0 if v < 0 else (255 if v > 255 else v))
        out.append(row)
    return out


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """Byte-align with 1-padding (stuffed if it lands on 0xFF) and
        emit the RSTn marker RAW — markers are never byte-stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (n & 7)])


def _category(v: int) -> int:
    a = abs(v)
    n = 0
    while a:
        a >>= 1
        n += 1
    return n


def _encode_block(
    w: _BitWriter,
    coef: list[int],
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    diff = coef[0] - pred
    size = _category(diff)
    code, length = dc_tab[size]
    w.write(code, length)
    if size:
        bits = diff if diff >= 0 else diff + (1 << size) - 1
        w.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = coef[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_tab[0xF0]  # ZRL
            w.write(zc, zl)
            run -= 16
        size = _category(v)
        code, length = ac_tab[(run << 4) | size]
        w.write(code, length)
        bits = v if v >= 0 else v + (1 << size) - 1
        w.write(bits, size)
        run = 0
    if run:
        code, length = ac_tab[0x00]  # EOB
        w.write(code, length)
    return coef[0]


def _plane_blocks(plane: list[list[float]], w: int, h: int):
    """Yield 8x8 level-shifted blocks in MCU scan order, edge-padded."""
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            yield [
                [
                    plane[min(by + y, h - 1)][min(bx + x, w - 1)] - 128.0
                    for x in range(8)
                ]
                for y in range(8)
            ]


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def _block_at(
    plane: list[list[float]], h: int, w: int, oy: int, ox: int
) -> list[list[float]]:
    """8x8 level-shifted block at pixel origin (oy, ox), edge-clamped."""
    return [
        [plane[min(oy + y, h - 1)][min(ox + x, w - 1)] - 128.0 for x in range(8)]
        for y in range(8)
    ]


def encode_jpeg(
    width: int,
    height: int,
    pixels: list[Pixel],
    quant: int = 1,
    grayscale: bool = False,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down RGB pixels as a baseline-sequential JFIF JPEG.

    ``subsampling``: "444" (no chroma subsampling, 1x1 everywhere) or
    "420" (2x2 luma sampling, chroma downsampled by 2x2 AVERAGING —
    the layout that dominates real-world JPEGs). ``quant`` fills both
    quantization tables with a constant — 1 = maximum fidelity.
    Grayscale ignores subsampling (single component).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that-many MCUs (DC predictors reset, bit stream re-aligned)
    — the real-world error-resilience layout, and the encoder-side
    twin of the decoder's align_restart path so the round-trip
    property tests can walk restart boundaries (VERDICT r11 #4)."""
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    qt = [max(1, min(255, quant))] * 64
    # colour planes (JFIF YCbCr)
    ys, cbs, crs = [], [], []
    for y in range(height):
        yr, cbr, crr = [], [], []
        for x in range(width):
            r, g, b = pixels[y * width + x]
            yr.append(0.299 * r + 0.587 * g + 0.114 * b)
            cbr.append(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
            crr.append(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
        ys.append(yr)
        cbs.append(cbr)
        crs.append(crr)
    dc_l = _huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    bw = _BitWriter()
    is420 = subsampling == "420" and not grayscale
    ri = max(0, int(restart_interval))
    mcu_i = 0

    def _maybe_restart(preds: list[int]) -> None:
        nonlocal mcu_i
        if ri and mcu_i and mcu_i % ri == 0:
            bw.restart((mcu_i // ri - 1) % 8)
            for i in range(len(preds)):
                preds[i] = 0
        mcu_i += 1
    if grayscale:
        preds = [0]
        blocks = [_plane_blocks(ys, width, height)]
        tabs = [(dc_l, ac_l)]
    elif not is420:
        preds = [0, 0, 0]
        blocks = [
            _plane_blocks(ys, width, height),
            _plane_blocks(cbs, width, height),
            _plane_blocks(crs, width, height),
        ]
        tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    if is420:
        # chroma downsample by 2x2 averaging over edge-clamped pixels
        chh, cw = (height + 1) // 2, (width + 1) // 2

        def down(p):
            return [
                [
                    (
                        p[min(2 * cy, height - 1)][min(2 * cx, width - 1)]
                        + p[min(2 * cy, height - 1)][min(2 * cx + 1, width - 1)]
                        + p[min(2 * cy + 1, height - 1)][min(2 * cx, width - 1)]
                        + p[min(2 * cy + 1, height - 1)][min(2 * cx + 1, width - 1)]
                    )
                    / 4.0
                    for cx in range(cw)
                ]
                for cy in range(chh)
            ]

        cbd, crd = down(cbs), down(crs)
        preds = [0, 0, 0]
        n_mcux = (width + 15) // 16
        n_mcuy = (height + 15) // 16
        tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
        for my in range(n_mcuy):
            for mx in range(n_mcux):
                _maybe_restart(preds)
                for jy in range(2):  # four luma blocks, raster order
                    for jx in range(2):
                        coef = _fdct_quant(
                            _block_at(
                                ys, height, width,
                                my * 16 + jy * 8, mx * 16 + jx * 8,
                            ),
                            qt,
                        )
                        preds[0] = _encode_block(bw, coef, preds[0], *tabs[0])
                for ci, cp in ((1, cbd), (2, crd)):
                    coef = _fdct_quant(
                        _block_at(cp, chh, cw, my * 8, mx * 8), qt
                    )
                    preds[ci] = _encode_block(bw, coef, preds[ci], *tabs[ci])
    else:
        n_mcux = (width + 7) // 8
        n_mcuy = (height + 7) // 8
        for _ in range(n_mcux * n_mcuy):
            _maybe_restart(preds)
            for ci, gen in enumerate(blocks):
                coef = _fdct_quant(next(gen), qt)
                preds[ci] = _encode_block(bw, coef, preds[ci], *tabs[ci])
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes(qt[i] for i in range(64)))
    if ri:
        out += _seg(0xDD, struct.pack(">H", ri))  # restart interval
    ncomp = 1 if grayscale else 3
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for cid in range(1, ncomp + 1):
        hv = 0x22 if (is420 and cid == 1) else 0x11
        sof += bytes([cid, hv, 0x00])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _seg(0xC4, _dht_body(0x10, _AC_LUMA_BITS, _AC_LUMA_VALS))
    if not grayscale:
        out += _seg(0xC4, _dht_body(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_body(0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-stuffing marker (RSTn are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise ValueError("marker inside entropy-coded segment")
        self.pos += 1
        return b

    def bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("missing restart marker")
        self.pos += 2


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(bits_val: int, size: int) -> int:
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


def decode_jpeg(payload: bytes) -> tuple[int, int, list[Pixel]]:
    """Decode a baseline-sequential JPEG: 8-bit, single interleaved
    scan, sampling factors up to 2x2 per component (4:4:4, 4:2:2,
    4:2:0, grayscale), multi-table DQT/DHT, DRI restart markers.
    Raises ValueError for progressive / 12-bit / >2x2 sampling /
    multi-scan (non-interleaved) streams — the PIL fallback's job."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, qt, h, v) in SOF order
    width = height = 0
    restart = 0
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                qtabs[tq] = list(body[i + 1 : i + 65])
                i += 65
            pos += seglen
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + n
            pos += seglen
        elif marker == 0xC0:  # SOF0 baseline
            prec = body[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(
                        f"sampling factors {hs}x{vs} unsupported (needs PIL)"
                    )
                comps.append((cid, tq, hs, vs))
            pos += seglen
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/etc) unsupported")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
            pos += seglen
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                ci = next(i for i, c in enumerate(comps) if c[0] == cs)
                scan.append((ci, tt >> 4, tt & 0x0F))
            pos += seglen
            break  # entropy data follows
        else:  # APPn, COM, anything else: skip
            pos += seglen
    if not comps or not scan or width == 0 or height == 0:
        raise ValueError("incomplete JPEG header")
    # This decoder implements only the single interleaved scan of
    # T.81 §A.2.3. A legal multi-scan baseline stream (one SOS per
    # component) would leave the later components' planes at zero and
    # return garbage silently; reject it so decode_image falls through
    # to PIL (ADVICE r10). Same for a single-component scan whose
    # sampling factors exceed 1x1 — T.81 §A.2.2 gives non-interleaved
    # scans per-BLOCK geometry, not the hs x vs MCU layout below.
    if len(scan) != len(comps):
        raise ValueError(
            f"multi-scan JPEG (scan covers {len(scan)}/{len(comps)} "
            "components) unsupported (needs PIL)"
        )
    if len(scan) == 1 and (comps[scan[0][0]][2] > 1 or comps[scan[0][0]][3] > 1):
        raise ValueError(
            "non-interleaved scan of a subsampled component unsupported"
        )
    br = _BitReader(payload, pos)
    h_max = max(h for _, _, h, _ in comps)
    v_max = max(v for _, _, _, v in comps)
    n_mcux = (width + 8 * h_max - 1) // (8 * h_max)
    n_mcuy = (height + 8 * v_max - 1) // (8 * v_max)
    planes = [
        [[0] * (n_mcux * h * 8) for _ in range(n_mcuy * v * 8)]
        for _, _, h, v in comps
    ]
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_restart()
                preds = [0] * len(comps)
            for ci, tdc, tac in scan:
                dc_tab = htabs.get((0, tdc))
                ac_tab = htabs.get((1, tac))
                qt = qtabs.get(comps[ci][1])
                if dc_tab is None or ac_tab is None or qt is None:
                    raise ValueError("JPEG scan references missing table")
                hs, vs = comps[ci][2], comps[ci][3]
                for jy in range(vs):
                    for jx in range(hs):
                        coef = [0] * 64
                        size = _read_symbol(br, dc_tab)
                        preds[ci] += _extend(br.bits(size), size)
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient index overflow"
                                )
                            coef[k] = _extend(br.bits(size), size)
                            k += 1
                        blk = _idct_block(coef, qt)
                        plane = planes[ci]
                        oy = (my * vs + jy) * 8
                        ox = (mx * hs + jx) * 8
                        for y in range(8):
                            prow = plane[oy + y]
                            brow = blk[y]
                            for x in range(8):
                                prow[ox + x] = brow[x]
            mcu_count += 1

    def comp_at(ci: int, x: int, y: int) -> int:
        # nearest-sample upsampling to full resolution (replication)
        hs, vs = comps[ci][2], comps[ci][3]
        return planes[ci][(y * vs) // v_max][(x * hs) // h_max]

    pixels: list[Pixel] = []
    if len(comps) == 1:
        yp = planes[0]
        for y in range(height):
            row = yp[y]
            for x in range(width):
                v = row[x]
                pixels.append((v, v, v))
    elif len(comps) == 3:
        full = all(h == h_max and v == v_max for _, _, h, v in comps)
        for y in range(height):
            for x in range(width):
                if full:
                    yy = planes[0][y][x]
                    cb = planes[1][y][x] - 128
                    cr = planes[2][y][x] - 128
                else:
                    yy = comp_at(0, x, y)
                    cb = comp_at(1, x, y) - 128
                    cr = comp_at(2, x, y) - 128
                r = _round_half_away(yy + 1.402 * cr)
                g = _round_half_away(yy - 0.344136 * cb - 0.714136 * cr)
                b = _round_half_away(yy + 1.772 * cb)
                pixels.append(
                    (
                        0 if r < 0 else (255 if r > 255 else r),
                        0 if g < 0 else (255 if g > 255 else g),
                        0 if b < 0 else (255 if b > 255 else b),
                    )
                )
    else:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    return width, height, pixels


# --- WAV (RIFF PCM, round 10) -------------------------------------------------

# The audio container twin of the image codecs above: RIFF/WAVE with
# a PCM ``fmt `` chunk and a ``data`` chunk (the original 1991
# Microsoft/IBM spec, public). PCM is LOSSLESS, so — unlike JPEG —
# the whole decode path (chunk walk, header fields, little-endian
# sample unpack) sits behind an exact hash gate
# (``multimodal_wav_decode_stats`` in binary_ops). Scope: 8-bit
# unsigned and 16-bit signed integer PCM, mono or interleaved
# multi-channel; float/ADPCM/extensible raise ValueError (the same
# fall-through-to-a-real-library seam as the image codecs).


def encode_wav(
    sample_rate: int, samples: list[int], bits: int = 16, channels: int = 1
) -> bytes:
    """Encode interleaved integer PCM samples as a RIFF/WAVE file.

    ``samples`` are signed 16-bit values for bits=16 (range -32768..
    32767) or unsigned bytes for bits=8 (0..255), interleaved by
    channel; ``len(samples)`` must be a multiple of ``channels``.
    """
    if bits not in (8, 16):
        raise ValueError(f"unsupported PCM width {bits}")
    if channels < 1 or len(samples) % channels:
        raise ValueError("samples not a multiple of channel count")
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = bytes(samples)
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunk padding
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a RIFF/WAVE PCM file: (sample_rate, channels, bits,
    interleaved samples — signed ints for 16-bit, unsigned for
    8-bit). Walks chunks (skipping LIST/fact/etc), so files with
    extra metadata chunks decode too."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt_seen = False
    sample_rate = channels = bits = 0
    samples: list[int] | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            tag, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise ValueError(f"non-PCM WAVE format tag {tag}")
            if bits not in (8, 16):
                raise ValueError(f"unsupported PCM width {bits}")
            fmt_seen = True
        elif cid == b"data":
            if not fmt_seen:
                raise ValueError("WAVE data chunk before fmt")
            if len(body) < clen:
                raise ValueError("truncated WAVE data chunk")
            if bits == 16:
                n = clen // 2
                samples = list(struct.unpack(f"<{n}h", body[: n * 2]))
            else:
                samples = list(body)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not fmt_seen or samples is None:
        raise ValueError("incomplete WAVE file (missing fmt or data)")
    return sample_rate, channels, bits, samples


# --- GIF87a (CompuServe GIF, LZW-compressed indexed color) -------------------

# Round-11 codec-family addition: GIF87a with the GIF flavor of LZW
# (variable-width codes, LSB-first bit packing, clear/EOI control
# codes, 12-bit code cap with dictionary reset). All from the public
# GIF87a specification. GIF is LOSSLESS for indexed content, so —
# like PNG and WAV, and unlike JPEG — the full pixel path sits behind
# an exact hash gate.
#
# Scope: encode emits a single image with a 256-entry grayscale
# global color table (the fixtures' pixel class), no interlace, no
# extensions. Decode handles any global/local color table, skips
# GIF89a extension blocks, and raises ValueError on interlaced images
# (the PIL seam, same contract as the other decoders).
#
# LZW width discipline (the subtle part, derived in-step with the
# canonical decoder): the DECODER grows its code width immediately
# after the dictionary add that makes next_code == 2^width (width
# capped at 12); the ENCODER therefore grows when ITS next_code
# (which runs exactly one entry ahead of the decoder's) reaches
# 2^width + 1. When the table is full (4096) the encoder emits CLEAR
# and both sides reset. Round-trip is property-tested across the
# reset boundary in tests/test_gif_property.py.

_GIF_MAX_CODE = 4096


def _lzw_compress_gif(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    codes.append((clear, width))
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    s = b""
    for byte in data:
        sc = s + bytes([byte])
        if sc in table:
            s = sc
            continue
        codes.append((table[s], width))
        if next_code < _GIF_MAX_CODE:
            table[sc] = next_code
            next_code += 1
            # one entry ahead of the decoder: grow at 2^width + 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        s = bytes([byte])
    if s:
        codes.append((table[s], width))
        # The decoder adds a table entry for EVERY data code it
        # receives (including this final one, unless a CLEAR just
        # reset it) and grows its width when that add lands exactly
        # on 2^width — so EOI must be written at the grown width.
        # Decoder next_code after its terminal add == our next_code
        # (we run one entry ahead; it catches up on the code we never
        # follow with an add). Found by the round-11 Hypothesis
        # round-trip test; falsifying example pinned in
        # tests/test_gif_property.py.
        if next_code == (1 << width) and width < 12:
            width += 1
    codes.append((eoi, width))
    # LSB-first bit packing
    out = bytearray()
    acc = nbits = 0
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress_gif(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(f"GIF LZW: first code {code} not a literal")
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW: code {code} ahead of table")
        if prev is not None and next_code < _GIF_MAX_CODE:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry


def encode_gif(width: int, height: int, pixels: list[Pixel]) -> bytes:
    """Encode grayscale pixels (r == g == b assumed; the red channel
    indexes a 256-entry grayscale palette) as a single-image GIF87a."""
    if len(pixels) != width * height:
        raise ValueError("pixel count mismatch")
    out = bytearray(b"GIF87a")
    # logical screen descriptor: global table, 8 bits/entry (size=7)
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x70 | 0x07, 0, 0)
    for i in range(256):  # grayscale global color table
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out.append(8)  # LZW minimum code size
    comp = _lzw_compress_gif(bytes(p[0] for p in pixels), 8)
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, list[Pixel]]:
    """Decode the first image of a GIF87a/GIF89a stream (no interlace;
    extensions skipped)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing signature)")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette: list[Pixel] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = [
            (payload[pos + 3 * i], payload[pos + 3 * i + 1], payload[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # GIF89a extension: label + sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _left, _top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported (needs PIL)")
        pal = palette
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = [
                (
                    payload[pos + 3 * i],
                    payload[pos + 3 * i + 1],
                    payload[pos + 3 * i + 2],
                )
                for i in range(n)
            ]
            pos += 3 * n
        if not pal:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        comp = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            comp += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decompress_gif(bytes(comp), min_code)
        if len(idx) < w * h:
            raise ValueError("GIF index stream shorter than image")
        return w, h, [pal[i] for i in idx[: w * h]]
    raise ValueError("GIF contains no image descriptor")


# --- G.711 mu-law companding (round 11) ----------------------------------------

# The telephony codec (ITU-T G.711, public spec): 16-bit linear PCM
# compands to 8-bit mu-law and back via closed-form INTEGER segment/
# mantissa arithmetic — no tables needed, which is what makes the
# decode-of-encode replayable as plain SQL in the oracle. Encoding is
# lossy (quantization) but encode→decode is a deterministic pure
# function of the sample, so the full path sits behind an exact hash
# gate. Constants and algorithm follow the standard reference
# implementation (the CCITT G.711 sample code); round-trip parity
# with the stdlib audioop implementation is pinned in tests.

_ULAW_BIAS = 0x84
# 14-bit-domain constants (the CCITT reference implementation works on
# pcm >> 2): clip 8159, bias 33, segment ends 0x3F..0x1FFF.
_ULAW_CLIP14 = 8159
_ULAW_SEG_END = [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]


def mulaw_encode(sample: int) -> int:
    """16-bit signed linear PCM -> 8-bit mu-law byte (bit-exact with
    the CCITT reference / CPython audioop: signed floor-shift to the
    14-bit domain FIRST, then sign split — (-val) >> 2 and
    -(val >> 2) differ on negatives and the reference does the
    latter)."""
    pcm = sample >> 2  # arithmetic (floor) shift
    if pcm < 0:
        pcm = -pcm
        mask = 0x7F
    else:
        mask = 0xFF
    if pcm > _ULAW_CLIP14:
        pcm = _ULAW_CLIP14
    pcm += _ULAW_BIAS >> 2  # 33
    for seg, end in enumerate(_ULAW_SEG_END):
        if pcm <= end:
            return ((seg << 4) | ((pcm >> (seg + 1)) & 0x0F)) ^ mask
    return 0x7F ^ mask


def mulaw_decode(byte: int) -> int:
    """8-bit mu-law byte -> canonical 16-bit linear PCM."""
    b = ~byte & 0xFF
    seg = (b >> 4) & 0x07
    mantissa = b & 0x0F
    mag = (((mantissa << 3) + _ULAW_BIAS) << seg) - _ULAW_BIAS
    return -mag if b & 0x80 else mag
