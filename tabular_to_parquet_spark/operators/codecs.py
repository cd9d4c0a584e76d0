"""Pure-Python media codecs for the multimodal operators.

Real decoders for two simple, fully public formats — uncompressed
24-bit BMP (BITMAPINFOHEADER) and PCM-16 mono WAV (RIFF) — so the
multimodal pipeline exercises genuine byte-level decode/resize work
even in a container without PIL/ffmpeg. ``decode_image`` in
multimodal.py prefers Pillow when installed and falls back here.

These are stdlib-only (struct) and deliberately strict: malformed
headers raise ``ValueError`` so "is this payload decodable" is a real
signal, not a guess.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# BMP (Windows bitmap, BITMAPINFOHEADER, 24 bpp, uncompressed)

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")   # magic, size, res, res, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def _row_stride(width: int) -> int:
    """BMP rows are padded to 4-byte boundaries (24 bpp → 3*w bytes)."""
    return (width * 3 + 3) & ~3


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode an RGB byte buffer (row-major, top-down, 3 bytes/px) as a
    bottom-up 24-bit BMP."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    stride = _row_stride(width)
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # BGR on disk
        rows.append(bytes(row) + pad)
    pixel_data = b"".join(rows)
    offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    info = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    head = _BMP_FILE_HEADER.pack(b"BM", offset + len(pixel_data), 0, 0, offset)
    return head + info + pixel_data


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP → (width, height, top-down RGB
    bytes). Raises ``ValueError`` on anything it cannot handle."""
    if len(data) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError("truncated BMP header")
    magic, _fsize, _r1, _r2, offset = _BMP_FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    (hsize, width, height, planes, bpp, compression, *_rest) = _BMP_INFO_HEADER.unpack_from(
        data, _BMP_FILE_HEADER.size
    )
    if hsize < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (hsize={hsize}, bpp={bpp})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0 or width > 1 << 16 or height > 1 << 16:
        raise ValueError(f"implausible dimensions {width}x{height}")
    stride = _row_stride(width)
    if offset + stride * height > len(data):
        raise ValueError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = offset + src_row * stride
        dst = y * width * 3
        for x in range(width):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            out[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return width, height, bytes(out)


def resize_nearest(width: int, height: int, rgb: bytes, tw: int, th: int) -> bytes:
    """Nearest-neighbor resize of a top-down RGB buffer:
    src_x = (dst_x * width) // tw (floor) — the standard integer map."""
    out = bytearray(tw * th * 3)
    for j in range(th):
        sy = (j * height) // th
        for i in range(tw):
            sx = (i * width) // tw
            s = (sy * width + sx) * 3
            d = (j * tw + i) * 3
            out[d : d + 3] = rgb[s : s + 3]
    return bytes(out)


# ---------------------------------------------------------------------------
# PNG (8-bit truecolor RGB, non-interlaced) — a COMPRESSED container:
# chunk framing + CRCs + zlib + per-row filters, all from the public spec

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down RGB as PNG, cycling through ALL five filter
    types (row y uses filter y % 5) so decoders must implement the
    full unfilter set — a deterministic, spec-complete stream."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    bpp = 3
    stride = width * bpp
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        for x in range(stride):
            left = row[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                raw.append(row[x])
            elif ft == 1:
                raw.append((row[x] - left) & 0xFF)
            elif ft == 2:
                raw.append((row[x] - up) & 0xFF)
            elif ft == 3:
                raw.append((row[x] - (left + up) // 2) & 0xFF)
            else:
                raw.append((row[x] - _paeth(left, up, ul)) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit truecolor non-interlaced PNG → (width, height,
    top-down RGB). Validates chunk CRCs; raises ``ValueError`` on
    anything outside that profile."""
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen or pos + 12 + clen > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_px, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype_px, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced PNG supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    if width <= 0 or height <= 0 or width > 1 << 16 or height > 1 << 16:
        raise ValueError(f"implausible dimensions {width}x{height}")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size does not match dimensions")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft > 4:
            raise ValueError(f"unknown PNG filter {ft}")
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ft == 1:
                line[x] = (line[x] + left) & 0xFF
            elif ft == 2:
                line[x] = (line[x] + up) & 0xFF
            elif ft == 3:
                line[x] = (line[x] + (left + up) // 2) & 0xFF
            elif ft == 4:
                line[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# AVI (RIFF) — uncompressed 24-bit DIB video frames. Completes the
# image/audio/video triple with a real container parser: nested RIFF
# LISTs, avih/strh/strf headers, '00db' frame chunks, word alignment,
# and the DIB bottom-up BGR row convention per frame.


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(body)) + list_type + body


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def encode_avi(width: int, height: int, frames: list[bytes], fps: int = 10) -> bytes:
    """Encode top-down RGB frames as an uncompressed 24-bit AVI."""
    stride = _row_stride(width)
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame size mismatch")
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, stride * height * fps, 0, 0x10, len(frames), 0, 1,
        stride * height, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), stride * height, 0, 0, 0)
    )
    strf = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, width, height, 1, 24, 0, stride * height, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = b"".join(
        _riff_chunk(b"00db", _rgb_to_dib(width, height, f)) for f in frames
    )
    movi = _riff_list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB → bottom-up padded BGR (the DIB frame payload)."""
    stride = _row_stride(width)
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):
        base = y * width * 3
        row = bytearray()
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))
        rows.append(bytes(row) + pad)
    return b"".join(rows)


def _dib_to_rgb(width: int, height: int, dib: bytes) -> bytes:
    stride = _row_stride(width)
    out = bytearray(width * height * 3)
    for y in range(height):
        base = (height - 1 - y) * stride
        dst = y * width * 3
        for x in range(width):
            b, g, r = dib[base + 3 * x : base + 3 * x + 3]
            out[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return bytes(out)


def decode_avi(data: bytes) -> tuple[int, int, list[bytes]]:
    """Decode an uncompressed 24-bit AVI → (width, height, top-down RGB
    frames). Walks the RIFF tree; raises ``ValueError`` outside that
    profile."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = None
    declared_frames = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, declared_frames
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if body_start + clen > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body_start + 4, body_start + clen)
            elif cid == b"avih":
                if clen < 56:
                    raise ValueError("short avih")
                vals = struct.unpack_from("<IIIIIIIIII", data, body_start)
                declared_frames, width, height = vals[4], vals[8], vals[9]
            elif cid == b"00db":
                frames.append(data[body_start : body_start + clen])
            pos = body_start + clen + (clen & 1)

    walk(12, len(data))
    if width is None or not frames:
        raise ValueError("missing avih header or frame chunks")
    if width <= 0 or height <= 0 or width > 1 << 16 or height > 1 << 16:
        raise ValueError(f"implausible dimensions {width}x{height}")
    if declared_frames != len(frames):
        raise ValueError(
            f"avih declares {declared_frames} frames, found {len(frames)}"
        )
    stride = _row_stride(width)
    if any(len(f) != stride * height for f in frames):
        raise ValueError("frame payload size mismatch")
    return width, height, [_dib_to_rgb(width, height, f) for f in frames]


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit mono)


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Encode signed-16-bit mono PCM samples as a canonical WAV file."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Decode a PCM-16 mono WAV → (sample_rate, samples). Walks RIFF
    chunks; raises ``ValueError`` on non-PCM/multi-channel/odd files."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM-16 mono supported")
        elif cid == b"data":
            if len(body) % 2:
                raise ValueError("odd data chunk length")
            samples = list(struct.unpack(f"<{len(body) // 2}h", body))
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81, SOF0), 8-bit grayscale, huffman-coded — a
# real COMPRESSED image codec: marker parsing, DQT/DHT tables, bit-level
# entropy decode with 0xFF00 byte-unstuffing, dequantization, zigzag,
# and a float IDCT. Completes the compressed-video story (MJPEG-in-AVI
# below); the reference has no media surface — pure engine extension.
#
# Exactness note for the parity fixtures: a block-constant 8x8 tile has
# ONLY a DC coefficient (all AC fold to ~1e-13 and round to 0); with a
# flat quantization table the DC = 8*(v-128) is stored exactly, so
# encode→decode roundtrips bit-exact and the oracle can recompute pixel
# sums from the generation formula. Arbitrary content decodes like any
# baseline JPEG (lossy).

import math as _math

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

# JPEG Annex K typical luminance huffman tables (BITS / HUFFVAL)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
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

#: flat quantization table — valid baseline JPEG, maximum fidelity
_FLAT_Q = [1] * 64

_COS = [
    [_math.cos((2 * x + 1) * u * _math.pi / 16) for x in range(8)]
    for u in range(8)
]
_CNORM = [1 / _math.sqrt(2)] + [1.0] * 7


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Spec C.2 canonical code assignment: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec F.1.2.3
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # skip stuffed zero
            self.buf = b
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v


def _category(v: int) -> int:
    a, n = abs(v), 0
    while a:
        n += 1
        a >>= 1
    return n


def _extend(v: int, n: int) -> int:
    """F.2.2.1 EXTEND: n-bit magnitude bits -> signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _fdct_quant(block: list[int], q: list[int]) -> list[int]:
    """Level-shifted spatial block (natural order) -> quantized zigzag."""
    out = [0] * 64
    for u in range(8):
        cu = _CNORM[u]
        for v in range(8):
            s = 0.0
            for y in range(8):
                cvy = _COS[u][y]
                base = y * 8
                for x in range(8):
                    s += block[base + x] * _COS[v][x] * cvy
            coef = 0.25 * cu * _CNORM[v] * s
            out[u * 8 + v] = coef
    return [int(round(out[_ZIGZAG[i]] / q[i])) for i in range(64)]


def _dequant_idct(zz: list[int], q: list[int]) -> list[int]:
    """Quantized zigzag coefficients -> spatial block (natural order,
    level-unshifted, clamped 0..255)."""
    coef = [0.0] * 64
    for i in range(64):
        coef[_ZIGZAG[i]] = zz[i] * q[i]
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cuy = _CNORM[u] * _COS[u][y]
                base = u * 8
                for v in range(8):
                    s += cuy * _CNORM[v] * coef[base + v] * _COS[v][x]
            px = int(round(0.25 * s)) + 128
            out[y * 8 + x] = 0 if px < 0 else 255 if px > 255 else px
    return out


def encode_jpeg_gray(width: int, height: int, gray: bytes,
                     qtable: list[int] | None = None) -> bytes:
    """Encode an 8-bit grayscale buffer (top-down, row-major) as a
    baseline JPEG (SOF0, one component, Annex K huffman tables). Edge
    blocks are padded by edge replication."""
    if len(gray) != width * height:
        raise ValueError(f"need {width * height} gray bytes, got {len(gray)}")
    q = qtable or _FLAT_Q
    if len(q) != 64 or any(not 1 <= v <= 255 for v in q):
        raise ValueError("qtable must be 64 values in 1..255")
    dc_enc = _huff_codes(_DC_BITS, _DC_VALS)
    ac_enc = _huff_codes(_AC_BITS, _AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            block = [
                gray[min(by + y, height - 1) * width + min(bx + x, width - 1)] - 128
                for y in range(8)
                for x in range(8)
            ]
            zz = _fdct_quant(block, q)
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            n = _category(diff)
            code, length = dc_enc[n]
            w.write(code, length)
            if n:
                w.write(diff if diff >= 0 else diff + (1 << n) - 1, n)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, length = ac_enc[0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                n = _category(zz[i])
                code, length = ac_enc[(run << 4) | n]
                w.write(code, length)
                w.write(zz[i] if zz[i] >= 0 else zz[i] + (1 << n) - 1, n)
                run = 0
            if last_nz < 63:
                code, length = ac_enc[0x00]  # EOB
                w.write(code, length)
    entropy = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0]) + bytes(q))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline single-component JPEG -> (width, height,
    top-down grayscale bytes). Raises ``ValueError`` outside the
    baseline grayscale profile (progressive, multi-component, restart
    intervals)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    width = height = None
    comp_q = comp_dc = comp_ac = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline supported")
            comp_q = body[8]  # component spec: id, sampling, quant-table id
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                (dc_maps if tc == 0 else ac_maps)[th] = _huff_decode_map(bits, vals)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
            if ri:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if body[0] != 1:
                raise ValueError("only single-component scans supported")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            pos = pos + 2 + seglen
            break
        pos = pos + 2 + seglen
    else:
        raise ValueError("no SOS marker")
    if width is None or comp_q not in qtables:
        raise ValueError("missing SOF/DQT before SOS")
    if width <= 0 or height <= 0 or width > 1 << 16 or height > 1 << 16:
        raise ValueError(f"implausible dimensions {width}x{height}")
    if comp_dc not in dc_maps or comp_ac not in ac_maps:
        raise ValueError("missing huffman tables")
    q = qtables[comp_q]
    dc_map, ac_map = dc_maps[comp_dc], ac_maps[comp_ac]

    def huff(r: _BitReader, table: dict) -> int:
        code = length = 0
        while length < 16:
            code = (code << 1) | r.bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid huffman code")

    r = _BitReader(data, pos)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    out = bytearray(width * height)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = [0] * 64
            n = huff(r, dc_map)
            prev_dc += _extend(r.bits(n), n)
            zz[0] = prev_dc
            i = 1
            while i < 64:
                rs = huff(r, ac_map)
                run, size = rs >> 4, rs & 0x0F
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    i += 16
                    continue
                i += run
                if i > 63:
                    raise ValueError("AC coefficient index out of range")
                zz[i] = _extend(r.bits(size), size)
                i += 1
            block = _dequant_idct(zz, q)
            for y in range(8):
                py = by * 8 + y
                if py >= height:
                    break
                base = py * width
                for x in range(8):
                    px = bx * 8 + x
                    if px < width:
                        out[base + px] = block[y * 8 + x]
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI: the compressed-video container — '00dc' chunks holding
# one baseline JPEG per frame, strh handler / strf biCompression 'MJPG'.

_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def encode_avi_mjpeg(width: int, height: int, jpeg_frames: list[bytes],
                     fps: int = 10) -> bytes:
    """Wrap pre-encoded JPEG frames in an AVI with the MJPG fourcc."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    max_size = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, max_size * fps, 0, 0x10, len(jpeg_frames), 0, 1,
        max_size, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(jpeg_frames), max_size, 0, 0, 0)
    )
    strf = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, width, height, 1, 24, _MJPG_FOURCC,
        max_size, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, list[bytes]]:
    """Decode an MJPEG AVI -> (width, height, top-down grayscale frame
    buffers). Validates the RIFF tree, the MJPG fourcc, the declared
    frame count, and per-frame JPEG dimensions against the header."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = None
    declared_frames = None
    compression = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, declared_frames, compression
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if body_start + clen > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body_start + 4, body_start + clen)
            elif cid == b"avih":
                if clen < 56:
                    raise ValueError("short avih")
                vals = struct.unpack_from("<IIIIIIIIII", data, body_start)
                declared_frames, width, height = vals[4], vals[8], vals[9]
            elif cid == b"strf" and clen >= _BMP_INFO_HEADER.size:
                compression = _BMP_INFO_HEADER.unpack_from(data, body_start)[5]
            elif cid == b"00dc":
                frames.append(data[body_start : body_start + clen])
            pos = body_start + clen + (clen & 1)

    walk(12, len(data))
    if width is None or not frames:
        raise ValueError("missing avih header or frame chunks")
    if compression != _MJPG_FOURCC:
        raise ValueError("not an MJPG stream (biCompression mismatch)")
    if declared_frames != len(frames):
        raise ValueError(
            f"avih declares {declared_frames} frames, found {len(frames)}"
        )
    decoded = []
    for f in frames:
        fw, fh, gray = decode_jpeg_gray(f)
        if (fw, fh) != (width, height):
            raise ValueError(f"frame is {fw}x{fh}, header says {width}x{height}")
        decoded.append(gray)
    return width, height, decoded


# ---------------------------------------------------------------------------
# GIF (GIF89a, global color table, real LZW) — public spec, original code


def _lzw_encode_gif(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: variable 9..12-bit codes, LSB-first packing.

    Width discipline (mirrored exactly by the decoder): one table
    assignment follows every emitted data code; width bumps when the
    assignment counter reaches 2^width; at 4096 the encoder emits
    CLEAR and resets instead of assigning."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    #: mirrors the ENCODER's next_code (one ahead of our table growth,
    #: because the encoder assigns right after emitting — see encoder)
    vnext = end + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # tolerant: missing END
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            vnext = end + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if vnext < 4096:
            vnext += 1
            if vnext == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """GIF89a with a global color table built from the image's
    distinct colors (≤256 required — GIF is palette-indexed)."""
    palette: list[bytes] = []
    index_of: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, len(rgb), 3):
        c = rgb[i:i + 3]
        j = index_of.get(c)
        if j is None:
            if len(palette) == 256:
                raise ValueError("encode_gif: more than 256 distinct colors")
            j = len(palette)
            index_of[c] = j
            palette.append(c)
        indices.append(j)
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0xF7)  # GCT present, 8 bits/channel, 256 entries
    out += b"\x00\x00"  # background index, aspect
    gct = b"".join(palette) + b"\x00\x00\x00" * (256 - len(palette))
    out += gct
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image descriptor at (0,0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x00)  # no local color table
    out.append(8)  # LZW min code size
    payload = _lzw_encode_gif(bytes(indices))
    for i in range(0, len(payload), 255):
        block = payload[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode a GIF87a/89a first frame → (width, height, RGB bytes)."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:
            iw = int.from_bytes(data[pos + 5:pos + 7], "little")
            ih = int.from_bytes(data[pos + 7:pos + 9], "little")
            iflags = data[pos + 9]
            if iflags & 0x40:
                # Interlaced row order isn't implemented; decoding anyway
                # would silently scramble rows. (Our encoder never sets it.)
                raise ValueError("interlaced GIF unsupported")
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 ** ((iflags & 0x07) + 1)
                pal = data[pos:pos + 3 * n]
                pos += 3 * n
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            indices = _lzw_decode_gif(bytes(lzw), min_code)
            if len(indices) < iw * ih:
                raise ValueError("short GIF pixel data")
            rgb = bytearray()
            for j in indices[: iw * ih]:
                rgb += pal[3 * j:3 * j + 3]
            return iw, ih, bytes(rgb)
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("no image data in GIF")
