"""Pure-stdlib RIFF/WAVE PCM codec (struct only) — the audio decode boundary.

The container has no ffmpeg/soundfile, but uncompressed WAV needs nothing
beyond ``struct``: the container is RIFF chunk framing, and PCM samples are
fixed-width little-endian integers.  This module implements both
directions, completing the codec-retirement arc the PNG module
(:mod:`sparkgraft.ext.png`) started in round 10:

- :func:`encode` — minimal deterministic writer (used by fixtures and the
  ``multimodal_decode_wav`` driver lane to synthesize real payloads,
  including an unknown LIST chunk so the reader's chunk walker is
  genuinely exercised);
- :func:`decode` — a strict reader: RIFF size validation, chunk walking
  with odd-size padding, fmt/data consistency checks (block align, byte
  rate, whole frames), 8/16/24/32-bit integer PCM, plain (format tag 1)
  or WAVE_FORMAT_EXTENSIBLE wrapping PCM.

Scope is declared, not hedged: compressed formats (mu-law, ADPCM, MP3,
IEEE float, ...) raise ``ValueError`` with the format NAMED — they are
unsupported INPUTS to a working PCM decoder, not an unimplemented decoder.
Production posture matches the PNG path: decode runs inside Arrow-batched
``mapInPandas`` (ext/multimodal.decode_wav_features), one Python roundtrip
per batch, payload bytes never leave the executor.

Sample-value conventions (the WAV spec's, not an invention): 8-bit PCM is
UNSIGNED (0..255, silence at 128); 16/24/32-bit PCM is SIGNED little-endian
two's complement.  ``decode`` returns samples in those conventions so
integer feature math (sum, peak) is exact and SQL-stateable.
"""

from __future__ import annotations

import struct

SIGNATURE = b"RIFF"

#: registered wFormatTag values we refuse BY NAME (anything else refuses
#: by number).  1 (PCM) is the one we decode; 0xFFFE (extensible) is
#: unwrapped to its SubFormat and re-checked.
_FORMAT_NAMES = {
    2: "ADPCM",
    3: "IEEE float",
    6: "A-law",
    7: "mu-law",
    17: "IMA ADPCM",
    85: "MP3",
}

_EXTENSIBLE = 0xFFFE
_SUPPORTED_DEPTHS = (8, 16, 24, 32)


def pack_samples(samples: list[int], bit_depth: int) -> bytes:
    """Pack integer samples into raw little-endian PCM bytes (the exact
    content of the ``data`` chunk).  Exposed separately so fixture
    generators can digest the PCM they are about to encode and pin the
    decoder's reproduction against it."""
    if bit_depth == 8:
        for v in samples:
            if not 0 <= v <= 255:
                raise ValueError(f"8-bit PCM is unsigned 0..255, got {v}")
        return bytes(samples)
    if bit_depth == 16:
        return struct.pack(f"<{len(samples)}h", *samples)
    if bit_depth == 32:
        return struct.pack(f"<{len(samples)}i", *samples)
    if bit_depth == 24:
        out = bytearray()
        for v in samples:
            if not -(1 << 23) <= v < (1 << 23):
                raise ValueError(f"24-bit PCM sample out of range: {v}")
            out += (v & 0xFFFFFF).to_bytes(3, "little")
        return bytes(out)
    raise ValueError(f"unsupported bit depth {bit_depth}")


def _unpack_samples(data: bytes, bit_depth: int) -> list[int]:
    if bit_depth == 8:
        return list(data)
    if bit_depth == 16:
        return list(struct.unpack(f"<{len(data) // 2}h", data))
    if bit_depth == 32:
        return list(struct.unpack(f"<{len(data) // 4}i", data))
    # 24-bit: sign-extend each 3-byte group
    out = []
    for i in range(0, len(data), 3):
        v = int.from_bytes(data[i : i + 3], "little")
        out.append(v - (1 << 24) if v >= (1 << 23) else v)
    return out


def encode(
    samples: list[int],
    n_channels: int,
    sample_rate: int,
    bit_depth: int = 16,
    extra_chunk: tuple[bytes, bytes] | None = None,
) -> bytes:
    """Write a PCM WAV.  ``samples`` is the flat interleaved sample list
    (``n_frames * n_channels`` entries) in the decode conventions above.
    ``extra_chunk=(tag, body)`` inserts an arbitrary chunk between fmt and
    data — fixtures use a LIST chunk (odd-size bodies included) so the
    reader's skip-and-pad path is exercised by every synthesized payload.
    """
    if bit_depth not in _SUPPORTED_DEPTHS:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError(
            f"{len(samples)} samples do not tile {n_channels} channels"
        )
    block_align = n_channels * bit_depth // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,  # WAVE_FORMAT_PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bit_depth,
    )
    data = pack_samples(samples, bit_depth)

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    body = b"WAVE" + chunk(b"fmt ", fmt)
    if extra_chunk is not None:
        body += chunk(*extra_chunk)
    body += chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode(payload: bytes) -> dict:
    """Strict WAV decode.  Returns ``{sample_rate, n_channels, bit_depth,
    n_frames, samples, data}`` where ``samples`` is the flat interleaved
    integer list and ``data`` the raw PCM bytes (digest target).  Raises
    ``ValueError`` naming the defect for anything that is not a
    well-formed integer-PCM WAV."""
    if payload[:4] != SIGNATURE:
        raise ValueError(f"not RIFF (magic {payload[:4]!r})")
    if len(payload) < 12:
        raise ValueError("truncated RIFF header")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size != len(payload) - 8:
        raise ValueError(
            f"RIFF size {riff_size} != container size {len(payload) - 8}"
        )
    if payload[8:12] != b"WAVE":
        raise ValueError(f"not a WAVE form (type {payload[8:12]!r})")

    fmt = None
    data = None
    pos = 12
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError(f"truncated chunk header at offset {pos}")
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body_end = pos + 8 + size
        if body_end > len(payload):
            raise ValueError(
                f"chunk {tag!r} overruns container ({size} bytes at {pos})"
            )
        body = payload[pos + 8 : body_end]
        if tag == b"fmt ":
            if fmt is not None:
                raise ValueError("duplicate fmt chunk")
            fmt = body
        elif tag == b"data":
            if data is not None:
                raise ValueError("duplicate data chunk")
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            data = body
        # unknown chunks (LIST, fact, cue, ...) are skipped, spec-legal
        pos = body_end + (size % 2)  # chunks are word-aligned: pad byte

    if fmt is None:
        raise ValueError("no fmt chunk")
    if data is None:
        raise ValueError("no data chunk")
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk too short ({len(fmt)} bytes)")
    audio_format, n_channels, sample_rate, byte_rate, block_align, depth = (
        struct.unpack("<HHIIHH", fmt[:16])
    )
    if audio_format == _EXTENSIBLE:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the first two bytes
        # of the 16-byte SubFormat GUID in the extension block
        if len(fmt) < 26:
            raise ValueError("extensible fmt without SubFormat")
        (sub,) = struct.unpack("<H", fmt[24:26])
        audio_format = sub
    if audio_format != 1:
        name = _FORMAT_NAMES.get(audio_format, f"format tag {audio_format}")
        raise ValueError(
            f"unsupported codec: {name}; only integer PCM decodes with the "
            f"stdlib codec"
        )
    if depth not in _SUPPORTED_DEPTHS:
        raise ValueError(f"unsupported bit depth {depth}")
    if n_channels < 1:
        raise ValueError("zero channels")
    if block_align != n_channels * depth // 8:
        raise ValueError(
            f"block align {block_align} inconsistent with "
            f"{n_channels}ch x {depth}-bit"
        )
    if byte_rate != sample_rate * block_align:
        raise ValueError(
            f"byte rate {byte_rate} inconsistent with "
            f"{sample_rate}Hz x block align {block_align}"
        )
    if len(data) % block_align:
        raise ValueError(
            f"data size {len(data)} is not whole frames of {block_align}"
        )
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bit_depth": depth,
        "n_frames": len(data) // block_align,
        "samples": _unpack_samples(data, depth),
        "data": data,
    }
