"""Multimodal column conventions: opaque binary payloads + typed metadata.

Image/audio/video assets live as ``binary`` columns (or, at 100 TB, as
pointer structs — path/offset/length into object storage — so the parquet
stays scan-friendly and bytes are fetched lazily). Metadata travels in a
typed struct column next to the payload.

The decode / feature-extract step is the one place Python enters the
pipeline: a ``mapInPandas`` stage (Arrow-batched — one Python roundtrip per
batch, never per row). The actual codecs (PIL/ffmpeg/torchvision) are not
in this container, so ``decode_features`` ships a deterministic fake
decoder behind ``fake=True`` and raises ``NotImplementedError`` otherwise —
the Spark-side plumbing (schema, batching, partition shape) is real and
tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: output schema of the decode stage
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, head_byte int, fake_width int, fake_height int"
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo payload builder: utf-8 bytes of the text as the binary column,
    plus a typed metadata struct. In a real pipeline the payload comes from
    the source (image bytes etc.); everything downstream only sees
    (payload: binary, meta: struct)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_features(
    df: DataFrame, fake: bool = False, batch_hint: int | None = None
) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    ``fake=True`` runs a deterministic stand-in decoder (byte-derived
    pseudo-dimensions) so the full mapInPandas path is exercisable without
    media libraries; ``fake=False`` raises NotImplementedError where a real
    decoder (PIL / ffmpeg) would be called.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            head = payloads.map(lambda b: b[0] if len(b) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "head_byte": head.astype("int32"),
                    # fake "decoded dimensions": deterministic functions of
                    # the byte stream a real decoder would replace
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (head.astype("int64") * 3 % 480).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_decode, DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_bytes int, frame_md5 string"
RESIZE_SCHEMA = "doc_id bigint, width int, height int, out_width int, out_height int"


def frame_sample(
    df: DataFrame,
    every_n: int = 4,
    frame_bytes: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Frame sampling over binary payloads: keep every ``every_n``-th
    fixed-size byte window as a "frame" (the fake stand-in for a video
    keyframe extractor; ``fake=False`` raises where ffmpeg would run).

    Arrow-batched ``mapInPandas``; emits (doc_id, frame_idx, n_bytes,
    frame_md5) — 1:N row fan-out, the shape a real frame extractor has.
    """
    import hashlib

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg (not in this "
                    "container); pass fake=True for the byte-window stub"
                )
            out = {"doc_id": [], "frame_idx": [], "n_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_windows = (len(payload) + frame_bytes - 1) // frame_bytes
                for w in range(0, n_windows, every_n):
                    frame = payload[w * frame_bytes : (w + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(w)
                    out["n_bytes"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)


def resize_stub(
    df: DataFrame, target_width: int = 224, fake: bool = False
) -> DataFrame:
    """Aspect-preserving resize planner: from (fake) decoded dimensions,
    compute output dims for a target width. ``fake=False`` raises where a
    real image library (PIL) would resample pixels; the fake path computes
    the real geometry arithmetic on the stub dimensions."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resampling requires PIL (not in this container); "
                    "pass fake=True for the geometry-only stub"
                )
            w = pdf["fake_width"].clip(lower=1)
            h = pdf["fake_height"].clip(lower=1)
            out_h = (h * target_width / w).round().astype("int32").clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": target_width,
                    "out_height": out_h,
                }
            )

    return df.mapInPandas(_resize, RESIZE_SCHEMA)


def payload_digests(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-payload byte length + content digest — binary-column ops that
    stay fully JVM-side (no decode needed)."""
    with_payload = attach_payload(df, text_col, id_col)
    return with_payload.select(
        F.col(id_col),
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )
