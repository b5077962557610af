"""Pure-stdlib PNG codec — real image decode without PIL.

The multimodal stack stubs decode behind the ``MediaDecoder`` seam
because PIL/libvips aren't in this container (multimodal.py:86-97).
PNG, however, needs nothing beyond ``zlib`` + ``struct``: this module
implements a minimal but SPEC-REAL subset of ISO/IEC 15948 (8-bit
greyscale and truecolor, non-interlaced, all five scanline filters),
so the decode path gets genuine runtime evidence end-to-end — actual
compressed image bytes in, actual pixel values out — instead of a
deterministic fake.

Scope: bit depth 8, color types 0 (grey), 2 (RGB), 4 (grey+alpha) and
6 (RGBA), interlace 0. That covers the fixtures any test needs while
keeping every byte of the wire format real: signature, chunk CRCs,
IHDR layout, zlib-deflated filtered scanlines. Anything outside the
subset (16-bit, palette, interlaced) raises ``ValueError`` — a real
deployment registers PIL via ``multimodal.register_decoder`` and this
module stays as the zero-dependency fallback + fixture factory.

The encoder exists for test fixtures (and supports emitting any single
filter type 0-4 so the decoder's five reconstruction branches are each
exercised against an independent implementation of the same math).
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql.types import IntegerType, LongType, StructField, StructType

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
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


def encode_png(
    width: int, height: int, pixels: bytes, channels: int = 1, filter_type: int = 0
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``
    bytes) as a PNG. ``filter_type`` 0-4 applies that one filter to
    every scanline (real encoders choose per-line; one fixed type is
    enough to exercise each decoder branch)."""
    if channels not in (1, 2, 3, 4):
        raise ValueError(
            "channels must be 1 (grey), 2 (grey+alpha), 3 (RGB) or 4 (RGBA)"
        )
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0-4")

    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        for i, x in enumerate(line):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                raw.append(x)
            elif filter_type == 1:
                raw.append((x - a) & 0xFF)
            elif filter_type == 2:
                raw.append((x - b) & 0xFF)
            elif filter_type == 3:
                raw.append((x - (a + b) // 2) & 0xFF)
            else:
                raw.append((x - _paeth(a, b, c)) & 0xFF)
        prev = line

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Decode a PNG within the supported subset. Returns
    ``{"width", "height", "channels", "pixels"}`` with ``pixels`` the
    reconstructed raw bytes (row-major)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG: chunk header cut short")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG: {ctype!r} chunk cut short")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"bad IHDR length {len(data)}")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0:
                raise ValueError(
                    f"unsupported PNG (compression={comp} filter_method={filt})"
                )
            if depth != 8 or color not in (0, 2, 4, 6) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace}); register PIL for full coverage"
                )
            channels = {0: 1, 4: 2, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed length mismatch")

    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ftype == 0:
                pass
            elif ftype == 1:
                line[i] = (line[i] + a) & 0xFF
            elif ftype == 2:
                line[i] = (line[i] + b) & 0xFF
            elif ftype == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ftype}")
        out += line
        prev = bytes(line)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }


def png_decoder():
    """A ``MediaDecoder`` for the registry seam (multimodal.py:51):
    decodes for real and emits width/height/channels plus the exact
    pixel-byte sum — an oracle-checkable content proof, not just
    container metadata."""
    from .multimodal import MediaDecoder

    def _decode(payload: bytes) -> dict:
        d = decode_png(payload)
        return {
            "width": d["width"],
            "height": d["height"],
            "channels": d["channels"],
            "px_sum": sum(d["pixels"]),
        }

    return MediaDecoder(
        name="stdlib-png",
        fields=StructType(
            [
                StructField("width", IntegerType()),
                StructField("height", IntegerType()),
                StructField("channels", IntegerType()),
                StructField("px_sum", LongType()),
            ]
        ),
        fn=_decode,
    )
