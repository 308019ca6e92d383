"""Pure-stdlib animated-GIF codec (subset): real LZW, real frames.

The multimodal frame-extraction stage (`ext/multimodal.frame_sample`)
documented a ``NotImplementedError`` boundary where ffmpeg would run.
Animation, unlike general video, does NOT need an external library: GIF's
pixel stream is LZW over palette indices, implementable in ~100 lines of
stdlib Python.  This module is the real codec behind
``ext/multimodal.extract_gif_frames`` — true multi-frame decode with a
genuine 1:N fan-out, leaving only ffmpeg-class containers (MP4/H.264...)
stubbed.

Scope (strict, fail-loud — same philosophy as :mod:`sparkgraft.ext.png`):
8-bit global grayscale palette, full-logical-screen frames, no interlace,
no transparency, no local color tables.  The ENCODER performs real LZW
compression (dictionary growth, 9->12-bit code widening, CLEAR on a full
table) so the decoder's dictionary reconstruction — including the
``code == next`` self-referential case — is genuinely exercised by
fixtures, not just the literal-passthrough path an "uncompressed GIF"
writer would produce.

Wire format implemented: GIF89a header, logical screen descriptor,
256-entry global color table, per-frame graphic control extension +
image descriptor + LZW-compressed sub-blocks, trailer.  Anything outside
the subset raises ``ValueError`` naming the problem — never a silently
wrong frame.
"""

from __future__ import annotations

import struct

HEADER = b"GIF89a"
_MIN_CODE_SIZE = 8  # 256-color palette -> 8-bit symbols, 9-bit initial codes
_CLEAR = 1 << _MIN_CODE_SIZE
_EOI = _CLEAR + 1
_MAX_CODE = 1 << 12  # GIF caps LZW at 12-bit codes


def _grayscale_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _lzw_compress(data: bytes) -> bytes:
    """Real GIF-flavor LZW: emits CLEAR, builds the string table, widens
    codes at each power of two, resets on a full table."""
    bw = _BitWriter()
    width = _MIN_CODE_SIZE + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _EOI + 1
    bw.write(_CLEAR, width)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        table[wk] = next_code
        next_code += 1
        # widen ONE STEP LATER than the obvious rule: the decoder's table
        # is one entry behind (it can only add after seeing the next
        # code), so it crosses the power-of-two after the read whose add
        # lands on 1<<width — the encoder must emit that read's code at
        # the OLD width and widen only for the following emission
        if width < 12 and next_code == (1 << width) + 1:
            width += 1
        if next_code == _MAX_CODE:
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _EOI + 1
            width = _MIN_CODE_SIZE + 1
        w = bytes([byte])
    if w:
        bw.write(table[w], width)
    bw.write(_EOI, width)
    return bw.flush()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode(width: int, height: int, frames: list[bytes], delay_cs: int = 4) -> bytes:
    """Write an animated GIF: 8-bit grayscale palette indices, one
    full-screen image per frame, real LZW compression per frame."""
    if width <= 0 or height <= 0 or not 1 <= width <= 0xFFFF or height > 0xFFFF:
        raise ValueError(f"encode: bad logical screen {width}x{height}")
    if not frames:
        raise ValueError("encode: need at least one frame")
    for i, f in enumerate(frames):
        if len(f) != width * height:
            raise ValueError(
                f"encode: frame {i} is {len(f)} bytes, expected "
                f"{width * height} ({width}x{height} indices)"
            )
    out = bytearray(HEADER)
    # logical screen descriptor: GCT present, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", width, height, 0b1111_0111, 0, 0)
    out += _grayscale_palette()
    for f in frames:
        # graphic control extension (fixed disposal, no transparency)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        # image descriptor: full screen, no local table, no interlace
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(_MIN_CODE_SIZE)
        out += _sub_blocks(_lzw_compress(f))
    out.append(0x3B)
    return bytes(out)


class _BitReader:
    """LSB-first bit reader over the concatenated sub-block payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("decode: LZW stream truncated mid-code")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_decompress(data: bytes, expected: int) -> bytes:
    br = _BitReader(data)
    width = _MIN_CODE_SIZE + 1
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = _MIN_CODE_SIZE + 1
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"decode: first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK self-reference case
        else:
            raise ValueError(f"decode: code {code} beyond table {len(table)}")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError(
                f"decode: LZW produced {len(out)} indices for a "
                f"{expected}-pixel frame"
            )
    if len(out) != expected:
        raise ValueError(
            f"decode: frame has {len(out)} indices, expected {expected}"
        )
    return bytes(out)


def decode(data: bytes) -> dict:
    """Parse an animated GIF within the module's declared subset.  Returns
    ``{"width", "height", "n_frames", "frames": [bytes, ...]}`` with each
    frame the full-screen palette indices (== gray values under the
    grayscale table).  Strict: unknown disposal needs, local color
    tables, interlace, partial-screen frames, truncation, or trailing
    garbage raise ``ValueError``."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError(f"decode: not a GIF (magic {data[:6]!r})")
    if len(data) < 13:
        raise ValueError("decode: truncated logical screen descriptor")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if not packed & 0x80:
        raise ValueError("decode: no global color table (outside subset)")
    gct_len = 3 * (2 << (packed & 0x07))
    palette = data[pos : pos + gct_len]
    if len(palette) < gct_len:
        raise ValueError("decode: truncated global color table")
    pos += gct_len
    frames: list[bytes] = []
    while True:
        if pos >= len(data):
            raise ValueError("decode: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("decode: truncated extension")
                size = data[pos]
                pos += 1 + size
                if size == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"decode: unexpected block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("decode: truncated image descriptor")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if (left, top, fw, fh) != (0, 0, width, height):
            raise ValueError(
                f"decode: partial-screen frame {fw}x{fh}@{left},{top} "
                f"(outside subset)"
            )
        if ipacked & 0x80:
            raise ValueError("decode: local color table (outside subset)")
        if ipacked & 0x40:
            raise ValueError("decode: interlaced frame (outside subset)")
        min_code = data[pos]
        pos += 1
        if min_code != _MIN_CODE_SIZE:
            raise ValueError(
                f"decode: LZW min code size {min_code} (subset is 8)"
            )
        payload = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("decode: truncated image data")
            size = data[pos]
            pos += 1
            if size == 0:
                break
            payload += data[pos : pos + size]
            pos += size
        frames.append(_lzw_decompress(bytes(payload), width * height))
    if not frames:
        raise ValueError("decode: no image frames before trailer")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }
