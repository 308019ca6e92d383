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
