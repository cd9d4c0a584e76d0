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
