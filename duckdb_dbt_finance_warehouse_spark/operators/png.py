"""Pure-stdlib PNG codec (SURVEY §7.6 multimodal — the REAL decode).

The container has no PIL/libpng, but the PNG format itself needs only
``zlib`` + the spec: chunked layout with CRC-32, per-scanline filter
bytes, and the five defilter predictors (None/Sub/Up/Average/Paeth).
This module implements both directions for 8-bit non-interlaced
greyscale/RGB/RGBA so the multimodal pipeline's decode step is a
genuine image decode, not a byte-stat stand-in:

- ``encode_png`` deliberately cycles through ALL five filter types
  (row y uses filter y % 5), so a round-trip exercises every defilter
  path — a decoder that faked any predictor could not reproduce the
  pixels.
- ``decode_png`` validates the signature and every chunk CRC, merges
  IDAT chunks, inflates, and defilters scanline by scanline.

Images here are small (the synthesized corpus thumbnails), so the
per-scanline Python loop is fine; the Arrow batching lives in the
callers (operators/multimodal) — this module is pure bytes -> bytes.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): nearest of left/up/up-left
    to the linear estimate a + b - c, ties in that order."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Encode raw 8-bit samples (row-major, interleaved channels) as a
    valid PNG. Row y is filtered with type y % 5 so every predictor
    appears in the stream — deterministic output for identical input."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"encode_png: channels must be 1, 3 or 4 (got {channels})")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"encode_png: got {len(pixels)} bytes for {width}x{height}x{channels}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[x] - (line[x - channels] if x >= channels else 0)) & 0xFF
                for x in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((line[x] - prev[x]) & 0xFF for x in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (line[x] - ((line[x - channels] if x >= channels else 0) + prev[x]) // 2)
                & 0xFF
                for x in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[x]
                    - _paeth(
                        line[x - channels] if x >= channels else 0,
                        prev[x],
                        prev[x - channels] if x >= channels else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        prev = line
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to (width, height, channels, raw 8-bit samples).
    Verifies the signature and every chunk CRC; supports 8-bit
    non-interlaced greyscale/RGB/RGBA (what ``encode_png`` emits and
    what the synthesized corpus uses); raises on anything else."""
    if data[:8] != SIGNATURE:
        raise ValueError("decode_png: bad signature — not a PNG")
    pos = 8
    idat = bytearray()
    width = height = channels = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"decode_png: CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise NotImplementedError(
                    "decode_png: only 8-bit non-interlaced PNGs are supported "
                    f"(depth={depth}, interlace={interlace})"
                )
            if color not in _CHANNELS:
                raise NotImplementedError(f"decode_png: color type {color}")
            channels = _CHANNELS[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("decode_png: missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decode_png: inflated size does not match dimensions")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:
            for x in range(stride):
                line[x] = (line[x] + (line[x - channels] if x >= channels else 0)) & 0xFF
        elif ft == 2:
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:
            for x in range(stride):
                line[x] = (
                    line[x] + ((line[x - channels] if x >= channels else 0) + prev[x]) // 2
                ) & 0xFF
        elif ft == 4:
            for x in range(stride):
                line[x] = (
                    line[x]
                    + _paeth(
                        line[x - channels] if x >= channels else 0,
                        prev[x],
                        prev[x - channels] if x >= channels else 0,
                    )
                ) & 0xFF
        elif ft != 0:
            raise ValueError(f"decode_png: unknown filter type {ft} on row {y}")
        out += line
        prev = bytes(line)
    return width, height, channels, bytes(out)
