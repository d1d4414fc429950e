"""Vendored PNG codec: filter math pinned by hand-computed expectations
(independent of the encoder, which only emits filter 0), plus roundtrips
and explicit error paths."""

from __future__ import annotations

import struct
import zlib

import pytest

from pg2parquet_spark.pngcodec import PngError, decode_png, encode_png


def _png_with_raw(width, height, color, raw: bytes, depth: int = 8) -> bytes:
    """Build a PNG from an explicit (filter byte + scanline)* stream —
    lets tests exercise filters 1-4, which encode_png never emits."""

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels,w,h", [(1, 3, 2), (2, 2, 2), (3, 5, 4), (4, 1, 3)])
def test_roundtrip_all_channel_counts(channels, w, h):
    px = bytes((i * 37 + channels) % 256 for i in range(w * h * channels))
    back = decode_png(encode_png(w, h, channels, px))
    assert back == (w, h, channels, px)


def test_filter_sub_and_up():
    # 2x2 grayscale: row0 Sub, row1 Up — expectations computed by hand
    raw = bytes([1, 10, 5]) + bytes([2, 1, 2])
    w, h, ch, px = decode_png(_png_with_raw(2, 2, 0, raw))
    assert (w, h, ch) == (2, 2, 1)
    assert list(px) == [10, 15, 11, 17]  # [10,10+5], [10+1,15+2]


def test_filter_average():
    raw = bytes([3, 10, 4]) + bytes([3, 6, 7])
    _, _, _, px = decode_png(_png_with_raw(2, 2, 0, raw))
    # row0: 10+(0+0)//2, 4+(10+0)//2 ; row1: 6+(0+10)//2, 7+(11+9)//2
    assert list(px) == [10, 9, 11, 17]


def test_filter_paeth():
    raw = bytes([4, 10, 5]) + bytes([4, 3, 2])
    _, _, _, px = decode_png(_png_with_raw(2, 2, 0, raw))
    # row0 predictors all 0 -> [10,15]; row1: paeth(0,10,0)=10 -> 13,
    # paeth(13,15,10): p=18, |18-13|=5 > |18-15|=3 -> up=15 -> 17
    assert list(px) == [10, 15, 13, 17]


def test_filter_sub_respects_channel_width():
    # gray+alpha (2 channels), 2 pixels, one Sub row: "left" is the same
    # CHANNEL one pixel back (i - channels), never byte i-1
    raw = bytes([1, 10, 20, 30, 5])
    w, h, ch, px = decode_png(_png_with_raw(2, 1, 4, raw))
    assert (w, h, ch) == (2, 1, 2)
    assert list(px) == [10, 20, 40, 25]


def test_decode_errors():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"JFIF" + b"\x00" * 20)
    with pytest.raises(PngError, match="bit depth"):
        decode_png(_png_with_raw(1, 1, 0, bytes([0, 1, 0, 1]), depth=16))
    with pytest.raises(PngError, match="color type"):
        decode_png(_png_with_raw(1, 1, 3, bytes([0, 1])))
    with pytest.raises(PngError, match="IEND"):
        decode_png(encode_png(2, 2, 1, bytes(4))[:-12])
    with pytest.raises(PngError, match="size mismatch"):
        decode_png(_png_with_raw(2, 2, 0, bytes([0, 1, 2])))  # short stream
    with pytest.raises(PngError, match="channel count"):
        encode_png(1, 1, 5, bytes(5))
