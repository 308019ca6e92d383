"""The pure-stdlib animated-GIF codec (ext/gif) and the real
frame-extraction stage (ext/multimodal.extract_gif_frames).

The codec is fixture-grade REAL: the encoder performs genuine LZW
(dictionary growth, code widening, CLEAR on a full table), so decode
exercises full dictionary reconstruction — not just the literal
passthrough an "uncompressed GIF" writer would produce."""

from __future__ import annotations

import hashlib
import random

import pytest

from sparkgraft.ext import gif


def _frames_for(i: int):
    w, h, nf = 3 + i % 5, 2 + i % 3, 2 + i % 4
    return w, h, [
        bytes((i * 31 + f * 17 + j) % 256 for j in range(w * h))
        for f in range(nf)
    ]


def test_roundtrip_small_multiframe():
    for i in (0, 1, 7, 13, 97, 1003):
        w, h, frames = _frames_for(i)
        d = gif.decode(gif.encode(w, h, frames))
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, len(frames))
        assert d["frames"] == frames


def test_roundtrip_code_widening():
    """Random 64x64 content assigns >256 dictionary entries, forcing the
    9->10-bit widening both sides must take on the same emission."""
    rnd = random.Random(42)
    big = bytes(rnd.randrange(256) for _ in range(64 * 64))
    assert gif.decode(gif.encode(64, 64, [big]))["frames"][0] == big


def test_roundtrip_table_full_clear_reset():
    """200x200 structured content exhausts the 12-bit table, forcing the
    mid-stream CLEAR + width reset path."""
    huge = bytes((j * j + j // 7) % 256 for j in range(200 * 200))
    assert gif.decode(gif.encode(200, 200, [huge]))["frames"][0] == huge


def test_roundtrip_kwkwk_self_reference():
    """A constant run emits the code == next-entry case (KwKwK), the one
    spot a decoder must synthesize an entry it has not seen."""
    aa = b"\x05" * 5000
    assert gif.decode(gif.encode(100, 50, [aa]))["frames"][0] == aa


def test_roundtrip_lzw_friendly_repetition():
    rep = (b"\x01\x02\x03" * 2000)[: 64 * 64]
    assert gif.decode(gif.encode(64, 64, [rep]))["frames"][0] == rep


def test_encode_validates_input():
    with pytest.raises(ValueError, match="bad logical screen"):
        gif.encode(0, 3, [b""])
    with pytest.raises(ValueError, match="at least one frame"):
        gif.encode(2, 2, [])
    with pytest.raises(ValueError, match="frame 0 is"):
        gif.encode(2, 2, [b"\x00" * 3])


def test_decode_strict_failures():
    w, h, frames = _frames_for(7)
    good = gif.encode(w, h, frames)
    with pytest.raises(ValueError, match="not a GIF"):
        gif.decode(b"PNG!" + good[4:])
    with pytest.raises(ValueError, match="missing trailer|truncated"):
        gif.decode(good[:-2])
    # flip the interlace bit in the first image descriptor — located
    # structurally (header 13 + palette 768 + GCE 8), since 0x2C also
    # appears as a gray value inside the palette
    idx = 13 + 3 * 256 + 8
    assert good[idx] == 0x2C
    bad = bytearray(good)
    bad[idx + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gif.decode(bytes(bad))


def test_decode_skips_foreign_extensions():
    """Unknown application/comment extensions are legal GIF — the walker
    must skip their sub-blocks, not die or misparse."""
    w, h, frames = _frames_for(13)
    data = gif.encode(w, h, frames)
    # splice a comment extension right after the global color table
    pos = 13 + 3 * 256
    comment = b"\x21\xfe\x07sparkgr\x00"
    spliced = data[:pos] + comment + data[pos:]
    assert gif.decode(spliced)["frames"] == frames


def test_extract_gif_frames_end_to_end(spark):
    import pandas as pd

    from sparkgraft.ext import multimodal

    ids = [0, 1, 7, 13, 97, 103]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    rows = (
        multimodal.extract_gif_frames(multimodal.synth_gif_payloads(docs))
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in ids:
        w, h, frames = _frames_for(i)
        got = sorted(by_doc[i], key=lambda r: r["frame_idx"])
        assert len(got) == len(frames)
        anim = hashlib.md5(b"".join(frames)).hexdigest()
        for f, (r, px) in enumerate(zip(got, frames)):
            assert (r["frame_idx"], r["width"], r["height"]) == (f, w, h)
            assert r["n_frames"] == len(frames)
            assert r["pixel_sum"] == sum(px)
            assert r["frame_md5"] == hashlib.md5(px).hexdigest()
            assert r["anim_md5"] == anim == r["source_md5"]


def test_extract_gif_frames_null_payload_emits_no_rows(spark):
    from pyspark.sql import types as T

    from sparkgraft.ext import multimodal

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("source_md5", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(7, None, None)], schema)
    assert multimodal.extract_gif_frames(df).count() == 0
