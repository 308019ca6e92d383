"""Pure-stdlib PNG codec (zlib + struct) — the real decode boundary.

The container has no PIL/ffmpeg, so the multimodal decode stage shipped as
a documented stub through round 9.  PNG, however, is fully decodable with
nothing but the standard library: chunk framing is ``struct``, IDAT is
``zlib``, and the five scanline filters (None/Sub/Up/Average/Paeth) are
byte arithmetic.  This module implements both directions:

- :func:`encode` — minimal, deterministic writer (used by fixtures and the
  ``multimodal_decode_png`` driver lane to synthesize real payloads);
- :func:`decode` — a strict reader: CRC-checked chunks, full filter
  reconstruction, 8-bit gray / RGB / RGBA.

Scope is declared, not hedged: interlaced (Adam7), paletted, and 16-bit
images raise ``ValueError`` with the exact unsupported feature named —
they are unsupported INPUTS to a working decoder, not an unimplemented
decoder.  The production posture is unchanged: decode runs inside
Arrow-batched ``mapInPandas`` (ext/multimodal.decode_features), one Python
roundtrip per batch, payload bytes never leave the executor.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by color type (only the bit-depth-8 types we decode)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filters: list[int] | None = None,
) -> bytes:
    """Write an 8-bit PNG. ``pixels``: row-major samples, ``channels *
    width * height`` bytes. ``filters``: per-row filter types 0..4 (default
    all 0) — the encoder APPLIES them, so a decoder must genuinely reverse
    each one; fixtures cycle all five to pin the reconstruction paths."""
    if color_type not in _CHANNELS:
        raise ValueError(f"encode: unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(
            f"encode: pixel buffer is {len(pixels)} bytes, expected "
            f"{stride * height} ({width}x{height}x{ch})"
        )
    if filters is None:
        filters = [0] * height
    if len(filters) != height or any(f not in range(5) for f in filters):
        raise ValueError("encode: filters must be one type in 0..4 per row")

    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = filters[y]
        raw.append(ft)
        if ft == 0:
            raw += row
        else:
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    raw.append((row[x] - a) & 0xFF)
                elif ft == 2:
                    raw.append((row[x] - b) & 0xFF)
                elif ft == 3:
                    raw.append((row[x] - (a + b) // 2) & 0xFF)
                else:
                    raw.append((row[x] - _paeth(a, b, c)) & 0xFF)
        prev = row

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode(data: bytes) -> dict:
    """Parse + inflate + reconstruct a PNG. Returns ``{"width", "height",
    "bit_depth", "color_type", "pixels": bytes}`` with ``pixels`` the
    defiltered row-major samples.  Strict: bad signature, bad chunk CRC,
    truncated stream, or an unsupported feature (palette, 16-bit,
    interlace) raise ``ValueError`` naming the problem."""
    if data[:8] != SIGNATURE:
        raise ValueError("decode: not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("decode: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError(f"decode: truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"decode: CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(
                    f"decode: bit depth {bit_depth} unsupported (8 only)"
                )
            if color_type not in _CHANNELS:
                raise ValueError(
                    f"decode: color type {color_type} unsupported "
                    f"(gray/RGB/RGBA; palette needs a PLTE reader)"
                )
            if interlace != 0:
                raise ValueError("decode: Adam7 interlace unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("decode: nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
    if width is None:
        raise ValueError("decode: missing IHDR")
    if not seen_end:
        raise ValueError("decode: missing IEND")

    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"decode: inflated stream is {len(raw)} bytes, expected "
            f"{(stride + 1) * height}"
        )

    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        row = bytearray(stride)
        if ft == 0:
            row[:] = line
        elif ft not in range(5):
            raise ValueError(f"decode: unknown filter type {ft} on row {y}")
        else:
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    row[x] = (line[x] + a) & 0xFF
                elif ft == 2:
                    row[x] = (line[x] + b) & 0xFF
                elif ft == 3:
                    row[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    row[x] = (line[x] + _paeth(a, b, c)) & 0xFF
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)

    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "pixels": bytes(out),
    }
