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
            # nullable Int32 end to end: a NULL payload (absent media)
            # decodes to NULL features — len(None) would throw mid-job,
            # and the oracle's byte arithmetic over NULL text is NULL
            n_bytes = payloads.map(
                lambda b: None if b is None else len(b)
            ).astype("Int32")
            head = payloads.map(
                lambda b: None if b is None else (b[0] if len(b) else 0)
            ).astype("Int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "head_byte": head,
                    # fake "decoded dimensions": deterministic functions of
                    # the byte stream a real decoder would replace
                    "fake_width": (n_bytes % 640).astype("Int32"),
                    "fake_height": (head.astype("Int64") * 3 % 480).astype("Int32"),
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
                if payload is None:
                    continue  # absent media has no frames (oracle: unnest
                    # of a NULL series emits zero rows for NULL text)
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
            # nullable Int32 end to end: decode_features emits NULL dims
            # for absent media (NULL payloads), which arrive here as NaN —
            # astype('int32') would raise on the first such row, killing
            # the decode->resize chain one operator after the decode fix.
            # NULL dims plan a NULL resize (out_width included: no media,
            # no plan), and <NA> propagates through the geometry math.
            w = pdf["fake_width"].astype("Int32").clip(lower=1)
            h = pdf["fake_height"].astype("Int32").clip(lower=1)
            out_h = (
                (h.astype("Float64") * target_width / w).round().astype("Int32")
            ).clip(lower=1)
            out_w = pd.Series(target_width, index=pdf.index, dtype="Int32").where(
                w.notna()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_width": out_w,
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


# ---------------------------------------------------------------------------
# Pointer-struct payloads: the 100 TB posture for multimodal columns.
# Parquet holds (path, offset, length) pointers into large blob files /
# object storage, so the table stays scan-friendly (column pruning, predicate
# pushdown, tiny row groups) and bytes are fetched lazily, only by the stages
# that need them.
# ---------------------------------------------------------------------------

#: the pointer column convention: struct<path:string, offset:bigint, length:int>
POINTER_FIELD = "ptr"
FETCH_SCHEMA = "doc_id bigint, n_bytes bigint, payload_md5 string"


def build_pointer_fixture(spark, df: DataFrame, blob_path: str,
                          text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """FIXTURE/DEMO TOOLING, not a data-path operator: write one local blob
    file of concatenated utf-8 payloads and return the pointer table for it.

    In production the blobs already live in object storage and pointers
    arrive WITH the data (written by the ingest job); a Spark job never
    builds them by collecting a corpus to the driver — this helper exists
    so the ranged-read fetch operator has something real to read in tests
    and in the registered demo query, at fixture scale (hundreds of docs).
    """
    import os

    rows = df.select(id_col, text_col).orderBy(id_col).collect()
    ptrs, off = [], 0
    os.makedirs(os.path.dirname(blob_path), exist_ok=True)
    with open(blob_path, "wb") as f:
        for r in rows:
            if r[1] is None:
                # NULL content has NO payload: a NULL pointer, not a
                # zero-length range ('' is a real, fetchable empty payload;
                # NULL is absence — the fetch emits NULL stats for it,
                # matching octet_length(encode(NULL)) = NULL)
                ptrs.append((r[0], None))
                continue
            payload = r[1].encode("utf-8")
            f.write(payload)
            ptrs.append((r[0], (blob_path, off, len(payload))))
            off += len(payload)
    return spark.createDataFrame(
        ptrs,
        f"doc_id bigint, {POINTER_FIELD} struct<path:string, offset:bigint, length:int>",
    )


def fetch_payload_ranges(df: DataFrame, pointer_col: str = POINTER_FIELD) -> DataFrame:
    """Ranged-read fetch over pointer structs — the lazy-bytes data path.

    Arrow-batched ``mapInPandas``: per batch, group pointers by file and
    read them in offset order (sequential-friendly seeks; against object
    storage this becomes ranged GETs, ideally coalesced per file). Emits
    (doc_id, n_bytes, payload_md5) so correctness is checkable without
    shipping the bytes anywhere — swap the digest for the decode stage in
    a real pipeline. Partitioning discipline: repartition the pointer
    table by path upstream if many tasks would touch the same blobs."""
    import hashlib

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy()
            ptrs = list(pdf[pointer_col])
            # NULL pointers (absent media) fetch nothing and emit NULL
            # stats; they are excluded from the seek ordering entirely.
            # Arrow->pandas renders a NULL struct as either None or a
            # dict of NaNs depending on the batch — treat both as absent
            def _absent(p) -> bool:
                return p is None or p.get("path") is None

            order = sorted(
                (i for i in range(len(ptrs)) if not _absent(ptrs[i])),
                key=lambda i: (ptrs[i]["path"], ptrs[i]["offset"]),
            )
            n_bytes: list[int | None] = [None] * len(ptrs)
            digests: list[str | None] = [None] * len(ptrs)
            open_path, handle = None, None
            try:
                for i in order:
                    p = ptrs[i]
                    if p["path"] != open_path:
                        if handle is not None:
                            handle.close()
                        open_path = p["path"]
                        handle = open(open_path, "rb")
                    # int(): when a batch contains any NULL struct, Arrow
                    # hands back float64 offset/length for EVERY row, and
                    # file.seek/read reject floats
                    handle.seek(int(p["offset"]))
                    payload = handle.read(int(p["length"]))
                    if len(payload) != int(p["length"]):
                        raise IOError(
                            f"short read at {open_path}:{p['offset']}: "
                            f"wanted {p['length']}, got {len(payload)}"
                        )
                    n_bytes[i] = len(payload)
                    digests[i] = hashlib.md5(payload).hexdigest()
            finally:
                if handle is not None:
                    handle.close()
            yield pd.DataFrame(
                {"doc_id": ids, "n_bytes": n_bytes, "payload_md5": digests}
            )

    return df.select("doc_id", pointer_col).mapInPandas(_fetch, FETCH_SCHEMA)
