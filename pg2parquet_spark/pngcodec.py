"""Vendored pure-Python PNG codec — the real-image decode path.

The container has no PIL/libpng, but PNG itself needs only stdlib ``zlib``
(RFC 2083: chunked container, DEFLATE-compressed scanlines, 5 byte-filters).
This module implements the subset a training-data pipeline meets in
practice — 8-bit depth, grayscale / RGB / gray+alpha / RGBA, non-interlaced
— so ``operators.multimodal.decode_real_image`` can decode REAL bytes
in-container instead of import-gating on PIL. PIL, when present, is still
preferred (C speed, full format coverage); this is the correctness anchor
and the fallback.

Scale shape: decode runs per-row inside Arrow-batched ``mapInPandas`` —
pure-Python per-pixel cost is the known slow path (documented; a real
deployment ships wheels), but the *plumbing* (batch shape, schema,
partitioning) is identical for any codec backend.

Not supported (explicit errors, never wrong answers): interlace, palette
(color type 3), bit depths other than 8.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(data: bytes):
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, raw pixel bytes row-major).

    Implements all five scanline filters (None/Sub/Up/Average/Paeth).
    """
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color}")
            if interlace != 0:
                raise PngError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise PngError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise PngError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev_start = -1  # row offsets into `out`
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        cur = y * stride
        if fbyte == 0:  # None
            pass
        elif fbyte == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif fbyte == 2:  # Up
            if y > 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif fbyte == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if y > 0 else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif fbyte == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if y > 0 else 0
                ul = out[prev_start + i - channels] if (y > 0 and i >= channels) else 0
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown filter byte {fbyte}")
        out[cur : cur + stride] = line
        prev_start = cur
    return width, height, channels, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Raw row-major pixel bytes → PNG (filter 0 per row, one IDAT).

    The writer half of the vendored codec: lets fixtures and tests build
    REAL standards-conformant PNG bytes without any external library.
    """
    color = {v: k for k, v in _CHANNELS.items()}.get(channels)
    if color is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        raw.extend(pixels[y * stride : (y + 1) * stride])

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
