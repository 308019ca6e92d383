"""Pure-stdlib WAV codec (ext/wav): roundtrip, chunk walking, strictness.

The decoder is the audio twin of the PNG retirement (round-10): it must
reproduce samples sign-correctly at every supported depth and fail LOUD —
with the offending format NAMED — on anything compressed, inconsistent, or
truncated.  A silently wrong sample is worse than no decode at all.
"""

from __future__ import annotations

import struct

import pytest

from sparkgraft.ext import wav


def _samples(n: int, bd: int, seed: int = 7) -> list[int]:
    out = []
    for j in range(n):
        raw = (seed * 37 + j * 101) % (1 << bd)
        if bd > 8 and raw >= (1 << (bd - 1)):
            raw -= 1 << bd
        out.append(raw)
    return out


@pytest.mark.parametrize("bd", [8, 16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_every_depth_and_channels(bd, ch):
    s = _samples(21 * ch, bd, seed=bd + ch)
    data = wav.encode(s, ch, 16000, bd)
    d = wav.decode(data)
    assert d["samples"] == s
    assert (d["sample_rate"], d["n_channels"], d["bit_depth"]) == (
        16000, ch, bd,
    )
    assert d["n_frames"] == 21


def test_odd_data_size_gets_pad_byte_and_roundtrips():
    # 8-bit mono with an odd frame count -> odd data chunk -> RIFF pad
    s = _samples(17, 8)
    data = wav.encode(s, 1, 8000, 8)
    assert len(data) % 2 == 0  # container stays word-aligned
    assert wav.decode(data)["samples"] == s


def test_unknown_chunks_are_skipped_including_odd_bodies():
    s = _samples(10, 16)
    for body in (b"INFOx", b"INFOxx"):  # odd and even sizes
        data = wav.encode(s, 1, 8000, 16, extra_chunk=(b"LIST", body))
        assert wav.decode(data)["samples"] == s


def test_negative_samples_sign_extend_at_24_bit():
    s = [-(1 << 23), -1, 0, 1, (1 << 23) - 1, -12345]
    d = wav.decode(wav.encode(s, 1, 44100, 24))
    assert d["samples"] == s


def test_extensible_format_wrapping_pcm_decodes():
    s = _samples(8, 16)
    data = bytearray(wav.encode(s, 1, 8000, 16))
    # rewrite the fmt chunk as WAVE_FORMAT_EXTENSIBLE with a PCM SubFormat
    fmt_at = data.index(b"fmt ")
    base = struct.unpack_from("<HHIIHH", data, fmt_at + 8)
    ext = struct.pack(
        "<HHIIHHHHIH14s", 0xFFFE, *base[1:], 22, 16, 0, 1, b"\x00" * 14
    )
    new = (
        bytes(data[: fmt_at + 4])
        + struct.pack("<I", len(ext))
        + ext
        + bytes(data[fmt_at + 8 + len(struct.pack('<HHIIHH', *base)) :])
    )
    new = new[:4] + struct.pack("<I", len(new) - 8) + new[8:]
    d = wav.decode(new)
    assert d["samples"] == s
    assert d["bit_depth"] == 16


def test_compressed_formats_refused_by_name():
    s = _samples(8, 16)
    data = bytearray(wav.encode(s, 1, 8000, 16))
    fmt_at = data.index(b"fmt ")
    struct.pack_into("<H", data, fmt_at + 8, 7)  # mu-law
    with pytest.raises(ValueError, match="mu-law"):
        wav.decode(bytes(data))
    struct.pack_into("<H", data, fmt_at + 8, 3)  # IEEE float
    with pytest.raises(ValueError, match="IEEE float"):
        wav.decode(bytes(data))


def test_strictness_refusals():
    s = _samples(8, 16)
    good = wav.encode(s, 1, 8000, 16)

    with pytest.raises(ValueError, match="not RIFF"):
        wav.decode(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="RIFF size"):
        wav.decode(good + b"trailing-garbage")
    with pytest.raises(ValueError, match="WAVE form"):
        wav.decode(good[:8] + b"AVI " + good[12:])
    with pytest.raises(ValueError, match="overruns"):
        wav.decode(
            good[:4] + struct.pack("<I", len(good) - 9) + good[8:-1]
        )

    bad = bytearray(good)
    fmt_at = bad.index(b"fmt ")
    struct.pack_into("<H", bad, fmt_at + 8 + 14, 12)  # bit depth 12
    with pytest.raises(ValueError, match="bit depth 12"):
        wav.decode(bytes(bad))

    bad = bytearray(good)
    struct.pack_into("<H", bad, fmt_at + 8 + 12, 3)  # block align wrong
    with pytest.raises(ValueError, match="block align"):
        wav.decode(bytes(bad))

    bad = bytearray(good)
    struct.pack_into("<I", bad, fmt_at + 8 + 8, 999)  # byte rate wrong
    with pytest.raises(ValueError, match="byte rate"):
        wav.decode(bytes(bad))


def test_partial_frame_data_refused():
    s = _samples(8, 16)
    data = bytearray(wav.encode(s, 2, 8000, 16))  # block align 4
    data_at = data.index(b"data")
    (size,) = struct.unpack_from("<I", data, data_at + 4)
    struct.pack_into("<I", data, data_at + 4, size - 2)  # half a frame
    trimmed = bytes(data[: data_at + 8 + size - 2])
    trimmed = trimmed[:4] + struct.pack("<I", len(trimmed) - 8) + trimmed[8:]
    with pytest.raises(ValueError, match="whole frames"):
        wav.decode(trimmed)


def test_missing_and_duplicate_chunks_refused():
    s = _samples(4, 16)
    good = wav.encode(s, 1, 8000, 16)
    fmt_at = good.index(b"fmt ")
    data_at = good.index(b"data")
    no_fmt = good[:fmt_at] + good[data_at:]
    no_fmt = no_fmt[:4] + struct.pack("<I", len(no_fmt) - 8) + no_fmt[8:]
    with pytest.raises(ValueError, match="before fmt"):
        wav.decode(no_fmt)
    dup = good + good[data_at:]
    dup = dup[:4] + struct.pack("<I", len(dup) - 8) + dup[8:]
    with pytest.raises(ValueError, match="duplicate data"):
        wav.decode(dup)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="unsigned 0..255"):
        wav.encode([-1], 1, 8000, 8)
    with pytest.raises(ValueError, match="do not tile"):
        wav.encode([1, 2, 3], 2, 8000, 16)
    with pytest.raises(ValueError, match="bit depth"):
        wav.encode([0], 1, 8000, 12)


def test_synth_matches_oracle_arithmetic_and_decodes(spark):
    """The driver lane's contract, in miniature: synth -> decode must
    reproduce the id-arithmetic predictions the SQL oracle states, and the
    PCM digest must survive the container roundtrip."""
    from sparkgraft.ext import multimodal

    ids = spark.createDataFrame([(i,) for i in range(24)], "doc_id: bigint")
    feats = multimodal.decode_wav_features(
        multimodal.synth_wav_payloads(ids)
    ).orderBy("doc_id")
    for r in feats.collect():
        i = r["doc_id"]
        ch, sr = 1 + (i // 2) % 2, 8000 * (1 + i % 3)
        bd, nf = 8 + 8 * (i % 2), 16 + i % 33
        vals = []
        for j in range(nf * ch):
            raw = (i * 37 + j * 101) % (1 << bd)
            if bd == 16 and raw >= 32768:
                raw -= 65536
            vals.append(raw)
        assert (r["sample_rate"], r["n_channels"], r["bit_depth"]) == (
            sr, ch, bd,
        )
        assert (r["n_frames"], r["n_samples"]) == (nf, nf * ch)
        assert r["sample_sum"] == sum(vals)
        assert r["abs_peak"] == max(abs(v) for v in vals)
        assert r["duration_ms"] == nf * 1000 // sr
        assert r["pcm_md5"] == r["source_md5"]


def test_decode_wav_features_null_payload(spark):
    from pyspark.sql import functions as F

    from sparkgraft.ext import multimodal

    ids = spark.createDataFrame([(1,), (2,)], "doc_id: bigint")
    payloads = multimodal.synth_wav_payloads(ids).withColumn(
        "payload",
        F.when(F.col("doc_id") == 2, F.col("payload")),
    )
    rows = {
        r["doc_id"]: r
        for r in multimodal.decode_wav_features(payloads).collect()
    }
    assert rows[1]["sample_sum"] is None and rows[1]["pcm_md5"] is None
    assert rows[2]["sample_sum"] is not None
