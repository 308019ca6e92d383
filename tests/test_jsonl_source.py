import json
from pyspark.sql.types import StructType


def test_roundtrip(spark, tmp_path):
    from sparkgraft.io import jsonl_source

    rows = [{"doc_id": i, "lang": ["en", "ko"][i % 2], "text": "x" * (i % 37)} for i in range(500)]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    jsonl_source.register(spark)
    schema = "doc_id bigint, lang string, text string"
    for n in (1, 3, 8, 64):
        df = (
            spark.read.format("sparkgraft_jsonl")
            .schema(schema)
            .option("path", str(p))
            .option("numPartitions", str(n))
            .load()
        )
        got = sorted((r.doc_id, r.lang, r.text) for r in df.collect())
        assert got == sorted((r["doc_id"], r["lang"], r["text"]) for r in rows), n
    # pushdown
    df = (
        spark.read.format("sparkgraft_jsonl")
        .schema(schema)
        .option("path", str(p))
        .load()
        .where("lang = 'ko'")
    )
    assert df.count() == 250


def test_exact_boundary_lines(spark, tmp_path):
    """Every slab boundary lands EXACTLY on a line break (equal-length
    lines, step a multiple of the line length) — the case where naive
    [start, end) ownership double-skips or double-reads."""
    import json as _json
    from sparkgraft.io import jsonl_source

    # line: {"doc_id": NNNN}\n  -> fixed 19 bytes
    rows = [{"doc_id": 1000 + i} for i in range(400)]
    lines = [_json.dumps(r, separators=(",", ":")) for r in rows]
    assert len({len(l) for l in lines}) == 1
    p = tmp_path / "fixed.jsonl"
    p.write_text("\n".join(lines) + "\n")
    line_len = len(lines[0]) + 1
    jsonl_source.register(spark)
    for n in (4, 10, 40):
        # numPartitions chosen so step = size // n is a multiple of line_len
        df = (
            spark.read.format("sparkgraft_jsonl")
            .schema("doc_id bigint")
            .option("path", str(p))
            .option("numPartitions", str(n))
            .load()
        )
        got = sorted(r.doc_id for r in df.collect())
        assert got == [1000 + i for i in range(400)], (n, len(got))


def test_sink_roundtrip_and_commit_protocol(spark, tmp_path):
    """df.write through the Python sink -> read back through the Python
    source equals the input; no _temporary staging dir survives commit."""
    import os
    from sparkgraft.io import jsonl_source

    jsonl_source.register(spark)
    out = str(tmp_path / "sinkdir")
    df = spark.range(0, 300).selectExpr(
        "id AS doc_id", "concat('doc ', id) AS text", "CAST(id % 7 AS STRING) AS source"
    ).repartition(5)
    df.write.format("sparkgraft_jsonl").mode("append").option("path", out).save()
    assert not os.path.exists(os.path.join(out, "_temporary"))
    parts = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(parts) == 5
    back = (
        spark.read.format("sparkgraft_jsonl")
        .schema("doc_id bigint, text string, source string")
        .option("path", out)
        .load()
    )
    got = sorted((r.doc_id, r.text, r.source) for r in back.collect())
    want = sorted((i, f"doc {i}", str(i % 7)) for i in range(300))
    assert got == want
    # overwrite mode replaces previous parts
    df.limit(10).repartition(1).write.format("sparkgraft_jsonl").mode(
        "overwrite"
    ).option("path", out).save()
    back2 = (
        spark.read.format("sparkgraft_jsonl")
        .schema("doc_id bigint, text string, source string")
        .option("path", out)
        .load()
    )
    assert back2.count() == 10


def test_simple_stream_reader_offsets_and_replay(spark, tmp_path):
    """File-per-batch offsets: sequential read()s traverse files in sorted
    order, end offset is stable at EOF, and readBetweenOffsets replays any
    committed span identically (the restart contract)."""
    import json

    from pyspark.sql.types import StructType

    from sparkgraft.io.jsonl_source import JsonlSimpleStreamReader  # noqa: I001

    for i, rows in enumerate(([{"a": 1}, {"a": 2}], [{"a": 3}], [{"a": 4}])):
        with open(tmp_path / f"c{i}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    schema = StructType.fromDDL("a bigint")
    rd = JsonlSimpleStreamReader(schema, {"path": str(tmp_path)})
    off = rd.initialOffset()
    assert off == {"last_file": ""}
    seq = []
    for _ in range(3):
        rows, off = rd.read(off)
        seq.append(list(rows))
    assert seq == [[(1,), (2,)], [(3,)], [(4,)]]
    rows, off2 = rd.read(off)
    assert list(rows) == [] and off2 == off == {"last_file": "c2.jsonl"}
    # replay the middle span by NAME watermark
    assert list(
        rd.readBetweenOffsets({"last_file": ""}, {"last_file": "c1.jsonl"})
    ) == [(1,), (2,), (3,)]
    # a late file sorting BELOW the committed watermark must not remap a
    # committed span's replay (the positional-index failure mode)
    with open(tmp_path / "a0.jsonl", "w") as fh:
        fh.write(json.dumps({"a": 99}) + "\n")
    assert list(
        rd.readBetweenOffsets({"last_file": "c0.jsonl"}, {"last_file": "c1.jsonl"})
    ) == [(3,)]


def test_simple_stream_reader_legacy_offset_migration(spark, tmp_path):
    """A checkpoint committed under the pre-rename {"files_read": N}
    offset format must resume (N files read == the Nth sorted filename is
    the watermark) — but only under the explicit legacy_resume=true
    option: the translation is positional, and a rotated directory would
    map N onto the wrong name undetectably, so the default REFUSES
    mid-stream legacy offsets with guidance (round-6 advice).  An
    out-of-range or unrecognized offset raises a descriptive
    reset-the-checkpoint error either way."""
    import json

    import pytest
    from pyspark.sql.types import StructType

    from sparkgraft.io.jsonl_source import JsonlSimpleStreamReader  # noqa: I001

    for i, rows in enumerate(([{"a": 1}], [{"a": 2}], [{"a": 3}])):
        with open(tmp_path / f"c{i}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    schema = StructType.fromDDL("a bigint")

    # default: mid-stream legacy offsets refuse (rotation risk); the
    # zero offset carries no positional claim and still works
    strict = JsonlSimpleStreamReader(schema, {"path": str(tmp_path)})
    with pytest.raises(ValueError, match="legacy_resume=true"):
        strict.read({"files_read": 2})
    rows, off = strict.read({"files_read": 0})
    assert list(rows) == [(1,)] and off == {"last_file": "c0.jsonl"}

    rd = JsonlSimpleStreamReader(
        schema, {"path": str(tmp_path), "legacy_resume": "true"}
    )

    # legacy resume mid-stream: 2 files read -> watermark c1, next is c2
    rows, off = rd.read({"files_read": 2})
    assert list(rows) == [(3,)] and off == {"last_file": "c2.jsonl"}
    # legacy zero offset == initial offset
    rows, off = rd.read({"files_read": 0})
    assert list(rows) == [(1,)] and off == {"last_file": "c0.jsonl"}
    # replay across a mixed-format span
    assert list(
        rd.readBetweenOffsets({"files_read": 1}, {"last_file": "c2.jsonl"})
    ) == [(2,), (3,)]
    # fully-drained legacy offset at EOF stays put, normalized to the new
    # format so subsequent commits never carry the legacy shape forward
    rows, off = rd.read({"files_read": 3})
    assert list(rows) == [] and off == {"last_file": "c2.jsonl"}

    with pytest.raises(ValueError, match="exceeds"):
        rd.read({"files_read": 7})
    with pytest.raises(ValueError, match="unrecognized"):
        rd.read({"bogus": 1})


def test_simple_stream_reader_restart_resumes(spark, tmp_path):
    """Checkpoint restart: run 1 drains two files and stops; a file lands
    AFTER the stop; run 2 (new query object, same checkpoint) picks up at
    the committed name watermark and emits only the new file — no replay, no loss."""
    import json

    from sparkgraft.io import jsonl_source

    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    src.mkdir()
    for i in range(2):
        with open(src / f"c{i}.jsonl", "w") as fh:
            fh.write(json.dumps({"a": i}) + "\n")
    jsonl_source.register(spark)

    def run_once():
        stream = (
            spark.readStream.format(jsonl_source.FORMAT_NAME)
            .schema("a bigint")
            .option("path", str(src))
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)

    run_once()
    got1 = sorted(r.a for r in spark.read.parquet(out).collect())
    assert got1 == [0, 1]
    with open(src / "c2.jsonl", "w") as fh:
        fh.write(json.dumps({"a": 2}) + "\n")
    run_once()
    got2 = sorted(r.a for r in spark.read.parquet(out).collect())
    assert got2 == [0, 1, 2], "restart must resume at the watermark, exactly-once"
