"""Table-maintenance surfaces for long-lived ingests: read-side schema
evolution across mixed-version parquet shards, and the stale-staging
sweeper for crashed Spark writes."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkgraft import catalog
from sparkgraft.catalog import evolve_spec
from sparkgraft.io.readers import read_evolved


@pytest.fixture()
def mixed_shards(spark, tmp_path):
    """A directory whose part files span three schema versions:
    v1 (k int, a string), v2 adds b, v3 widened k to long."""
    root = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "x")], "k int, a string").write.mode(
        "append"
    ).parquet(root)
    spark.createDataFrame([(2, "y", 20)], "k int, a string, b int").write.mode(
        "append"
    ).parquet(root)
    spark.createDataFrame(
        [(2**40, "z", 30)], "k long, a string, b int"
    ).write.mode("append").parquet(root)
    return root


def test_read_evolved_conforms_mixed_shards(spark, mixed_shards):
    target = StructType(
        [
            StructField("k", LongType()),
            StructField("b", LongType()),
            StructField("c", DoubleType()),  # never written: typed NULLs
        ]
    )
    got = read_evolved(spark, mixed_shards, target)
    assert got.schema == target  # exact target schema, 'a' pruned
    rows = {r.k: (r.b, r.c) for r in got.collect()}
    assert rows == {1: (None, None), 2: (20, None), 2**40: (30, None)}


def test_read_evolved_rejects_incompatible_change(spark, mixed_shards):
    bad = StructType([StructField("a", IntegerType())])  # string -> int
    with pytest.raises(TypeError, match="column 'a'.*data migration"):
        read_evolved(spark, mixed_shards, bad)


def test_read_evolved_plan_prunes_at_scan(spark, mixed_shards):
    """Pruning must reach the parquet scan: a 2-column conformance over a
    3-column table may not read the dropped column."""
    target = StructType(
        [StructField("k", LongType()), StructField("b", LongType())]
    )
    plan = read_evolved(spark, mixed_shards, target)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ReadSchema: struct<k:bigint,b:bigint>" in plan, plan


def test_read_evolved_nonprimitive_types_pass_validation(spark, tmp_path):
    """Identical timestamp / decimal / array columns must NOT trip the
    plan-time incompatibility check (regression: a name-table mapping of
    arrow types false-positived on timestamp[us] vs 'timestamp')."""
    root = str(tmp_path / "typed")
    spark.sql(
        "SELECT 1 AS k, timestamp'2024-01-02 03:04:05' AS ts, "
        "CAST(1.5 AS DECIMAL(10,2)) AS d, array(1.0D, 2.0D) AS v"
    ).write.parquet(root)
    target = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS k, timestamp'2024-01-02 03:04:05' AS ts, "
        "CAST(1.5 AS DECIMAL(10,2)) AS d, array(1.0D, 2.0D) AS v"
    ).schema
    got = read_evolved(spark, root, target)
    row = got.collect()[0]
    assert (row.k, str(row.ts), float(row.d), row.v) == (
        1,
        "2024-01-02 03:04:05",
        1.5,
        [1.0, 2.0],
    )


def test_read_evolved_rejects_bigint_to_double(spark, tmp_path):
    """bigint->double must be refused at PLAN time: Spark's vectorized
    parquet reader throws mid-job on INT64->double, and the promotion is
    lossy past 2^53 anyway — exactly the two failure classes the
    validator exists to prevent."""
    root = str(tmp_path / "big")
    spark.createDataFrame([(2**60 + 1,)], "k long").write.parquet(root)
    with pytest.raises(TypeError, match="column 'k'.*data migration"):
        read_evolved(spark, root, StructType([StructField("k", DoubleType())]))


def test_read_evolved_case_insensitive_validation(spark, tmp_path):
    """Default sessions resolve parquet columns case-INsensitively, so
    the validator must too: a case-renamed column with incompatible
    drift has to fail at plan time, not slip past as 'dropped' and die
    mid-job when the scan binds it anyway."""
    root = str(tmp_path / "case")
    spark.createDataFrame([("x",)], "Value string").write.parquet(root)
    with pytest.raises(TypeError, match="data migration"):
        read_evolved(spark, root, StructType([StructField("value", DoubleType())]))


def test_read_evolved_nanos_timestamp_shards(spark, tmp_path):
    """A timestamp[ns] shard column (the driver testdata's own historical
    format) must evolve to a timestamp target via the exact DIV-1000
    conversion read_table applies — and a column that is ns in one shard
    but us in another must be refused with guidance, since no single
    explicit read schema can decode both."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampNTZType

    root = tmp_path / "ns"
    root.mkdir()
    ts_ns = pa.array([1_700_000_000_123_456_789], pa.timestamp("ns"))
    pq.write_table(pa.table({"k": pa.array([1]), "ts": ts_ns}), root / "a.parquet")

    target = StructType(
        [StructField("k", LongType()), StructField("ts", TimestampNTZType())]
    )
    got = read_evolved(spark, str(root), target).collect()[0]
    assert got.k == 1
    # ns -> us truncation, identical to read_table's DIV 1000
    assert got.ts.isoformat() == "2023-11-14T22:13:20.123456"

    ts_us = pa.array([1_700_000_000_000_000], pa.timestamp("us"))
    pq.write_table(pa.table({"k": pa.array([2]), "ts": ts_us}), root / "b.parquet")
    with pytest.raises(TypeError, match="in some shards"):
        read_evolved(spark, str(root), target)


def test_sweep_stale_temporary(spark, sf_dir, tmp_path):
    root = str(tmp_path / "t")
    spark.createDataFrame([(1,)], "x int").write.parquet(os.path.join(root, "p"))
    stale = os.path.join(root, "p", "_temporary", "0", "task_1")
    fresh = os.path.join(root, "q", "_temporary", "0")
    os.makedirs(stale)
    os.makedirs(fresh)
    with open(os.path.join(stale, "part-0"), "w") as fh:
        fh.write("debris")
    # age the stale tree below the gate; the fresh tree keeps now-mtimes
    old = time.time() - 7200
    for dirpath, dirnames, filenames in os.walk(
        os.path.join(root, "p", "_temporary")
    ):
        for n in (*dirnames, *filenames):
            os.utime(os.path.join(dirpath, n), (old, old))
    os.utime(os.path.join(root, "p", "_temporary"), (old, old))

    removed = catalog.sweep_stale_temporary(root, age_s=3600.0)
    assert removed == [os.path.join(root, "p", "_temporary")]
    assert not os.path.exists(os.path.join(root, "p", "_temporary"))
    assert os.path.exists(fresh)  # in-flight staging survives the gate
    # the data files next to the removed staging tree are untouched
    assert spark.read.parquet(os.path.join(root, "p")).count() == 1


# ---------------------------------------------------------------------------
# Schema HISTORY: metastore-recorded version log replaces the footer sweep
# ---------------------------------------------------------------------------

_MIXED_HISTORY = (
    StructType([StructField("k", IntegerType()), StructField("a", StringType())]),
    StructType(
        [
            StructField("k", IntegerType()),
            StructField("a", StringType()),
            StructField("b", IntegerType()),
        ]
    ),
    StructType(
        [
            StructField("k", LongType()),
            StructField("a", StringType()),
            StructField("b", IntegerType()),
        ]
    ),
)


def _no_footer_sweep(monkeypatch):
    """Make ANY pyarrow dataset/footer access explode — the history path
    must validate without touching a single file footer."""
    import pyarrow.dataset

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("footer sweep ran despite recorded history")

    monkeypatch.setattr(pyarrow.dataset, "dataset", boom)


def test_read_evolved_history_skips_footer_sweep(spark, mixed_shards, monkeypatch):
    target = StructType(
        [
            StructField("k", LongType()),
            StructField("b", LongType()),
            StructField("c", DoubleType()),
        ]
    )
    _no_footer_sweep(monkeypatch)
    got = read_evolved(spark, mixed_shards, target, history=_MIXED_HISTORY)
    assert got.schema == target
    rows = {r.k: (r.b, r.c) for r in got.collect()}
    assert rows == {1: (None, None), 2: (20, None), 2**40: (30, None)}


def test_read_evolved_history_rejects_illegal_version(spark, mixed_shards, monkeypatch):
    _no_footer_sweep(monkeypatch)
    bad = StructType([StructField("a", IntegerType())])  # string -> int
    with pytest.raises(TypeError, match="column 'a'.*version 0.*data migration"):
        read_evolved(spark, mixed_shards, bad, history=_MIXED_HISTORY)


def test_evolve_spec_records_history_and_validates():
    v1 = catalog.TableSpec(
        "t",
        StructType(
            [
                StructField("id", IntegerType()),
                StructField("d", StringType()),
            ]
        ),
        partition_keys=("d",),
    )
    v2_schema = StructType(
        [
            StructField("id", LongType()),  # widen
            StructField("d", StringType()),
            StructField("v", DoubleType()),  # add
        ]
    )
    v2 = evolve_spec(v1, v2_schema)
    assert v2.schema == v2_schema
    assert v2.schema_history == (v1.schema,)
    assert v2.full_history == (v1.schema, v2_schema)

    # illegal type change rejected at evolve time, not at some future read
    with pytest.raises(TypeError, match="column 'd'.*data migration"):
        evolve_spec(v1, StructType([StructField("d", IntegerType())]))
    # partition keys are pinned: dropping or retyping one is a layout change
    with pytest.raises(TypeError, match="partition key 'd'"):
        evolve_spec(v1, StructType([StructField("id", LongType())]))


def test_evolve_spec_checks_every_historical_version():
    """A column dropped in v2 and re-added in v3 must stay readable from the
    v1 files still on disk — the gate runs against the FULL history, not
    just the current schema."""
    v1 = catalog.TableSpec(
        "t",
        StructType(
            [
                StructField("id", IntegerType()),
                StructField("score", DoubleType()),
            ]
        ),
    )
    v2 = evolve_spec(v1, StructType([StructField("id", IntegerType())]))
    # re-adding score as double is fine (v1 files carry double)
    v3 = evolve_spec(
        v2,
        StructType(
            [
                StructField("id", IntegerType()),
                StructField("score", DoubleType()),
            ]
        ),
    )
    assert v3.full_history == (v1.schema, v2.schema, v3.schema)
    # re-adding it as int would poison every future read of the v1 files:
    # rejected even though the CURRENT (v2) schema has no 'score' at all
    with pytest.raises(TypeError, match="column 'score'.*version 0.*data migration"):
        evolve_spec(
            v2,
            StructType(
                [
                    StructField("id", IntegerType()),
                    StructField("score", IntegerType()),
                ]
            ),
        )


def test_evolve_spec_folds_names_case_insensitively():
    """Name matching mirrors the evolved read's default
    spark.sql.caseSensitive=false posture: a case-renamed column is the
    SAME column (so its type rules apply), and a new schema whose names
    collide under folding is ambiguous and rejected outright."""
    v1 = catalog.TableSpec(
        "t", StructType([StructField("id", IntegerType())])
    )
    # case-rename + widen: same column, safe widening — allowed
    v2 = evolve_spec(v1, StructType([StructField("ID", LongType())]))
    assert v2.schema.fields[0].name == "ID"
    # case-rename + narrow: same column, data migration — rejected
    with pytest.raises(TypeError, match="column 'id'.*data migration"):
        evolve_spec(
            catalog.TableSpec("t", StructType([StructField("id", LongType())])),
            StructType([StructField("ID", IntegerType())]),
        )
    # case-colliding target names are unresolvable under folding
    with pytest.raises(TypeError, match="case-colliding"):
        evolve_spec(
            v1,
            StructType(
                [
                    StructField("x", IntegerType()),
                    StructField("X", IntegerType()),
                ]
            ),
        )
    # partition keys match case-insensitively too
    p1 = catalog.TableSpec(
        "t",
        StructType(
            [
                StructField("id", IntegerType()),
                StructField("d", StringType()),
            ]
        ),
        partition_keys=("d",),
    )
    p2 = evolve_spec(
        p1,
        StructType(
            [
                StructField("id", LongType()),
                StructField("D", StringType()),
            ]
        ),
    )
    # the key carries the NEW spelling, keeping ordered_columns coherent
    # (case-sensitive comparisons would otherwise see 'D' as a data column
    # and re-append a phantom 'd' key)
    assert p2.partition_keys == ("D",)
    assert p2.ordered_columns == ["id", "D"]


def test_schema_history_sidecar_roundtrip(tmp_path):
    v1 = catalog.TableSpec("t", _MIXED_HISTORY[0])
    v3 = evolve_spec(evolve_spec(v1, _MIXED_HISTORY[1]), _MIXED_HISTORY[2])
    path = str(tmp_path / "t")
    catalog.save_schema_history(path, v3)
    assert catalog.load_schema_history(path) == v3.full_history
    assert catalog.load_schema_history(str(tmp_path / "absent")) is None
    # the sidecar is invisible to Spark's file index (underscore prefix)
    assert os.path.basename(
        os.path.join(path, catalog._HISTORY_SIDECAR)
    ).startswith("_")


def test_write_evolution_roundtrip(spark, tmp_path, monkeypatch):
    """The end-to-end write-side story: v1 partitions stay on disk untouched
    while v2 partitions land under the evolved schema, and the recorded
    history conforms the whole table at read time with zero footer reads."""
    work = str(tmp_path / "evo")
    v1 = catalog.TableSpec(
        "evo",
        StructType(
            [
                StructField("id", IntegerType()),
                StructField("name", StringType()),
                StructField("batch", IntegerType()),
            ]
        ),
        partition_keys=("batch",),
    )
    spark.createDataFrame([(1, "a", 1), (2, "b", 1)], v1.schema).write.mode(
        "append"
    ).partitionBy("batch").parquet(work)

    v2 = evolve_spec(
        v1,
        StructType(
            [
                StructField("id", LongType()),
                StructField("name", StringType()),
                StructField("score", DoubleType()),
                StructField("batch", IntegerType()),
            ]
        ),
    )
    spark.createDataFrame([(2**40, "c", 0.5, 2)], v2.schema).write.mode(
        "append"
    ).partitionBy("batch").parquet(work)
    catalog.save_schema_history(work, v2)

    _no_footer_sweep(monkeypatch)
    got = catalog.read_spec_evolved(spark, work, v2)
    assert got.schema == v2.schema
    rows = {r.id: (r.name, r.score, r.batch) for r in got.collect()}
    assert rows == {
        1: ("a", None, 1),
        2: ("b", None, 1),
        2**40: ("c", 0.5, 2),
    }


def test_read_spec_evolved_falls_back_to_footer_sweep(spark, mixed_shards):
    """A table with no sidecar and a spec with no recorded history is the
    legacy/external case: the footer sweep must still run (and still
    validate) — fallback, not failure."""
    import pyarrow.dataset

    calls = {"n": 0}
    real = pyarrow.dataset.dataset

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    import unittest.mock as mock

    spec = catalog.TableSpec(
        "legacy",
        StructType(
            [
                StructField("k", LongType()),
                StructField("b", LongType()),
            ]
        ),
    )
    with mock.patch.object(pyarrow.dataset, "dataset", counting):
        got = catalog.read_spec_evolved(spark, mixed_shards, spec)
        rows = {r.k: r.b for r in got.collect()}
    assert calls["n"] >= 1
    assert rows == {1: None, 2: 20, 2**40: 30}


# ---------------------------------------------------------------------------
# Round-7 advice regressions: compaction-artifact naming edge cases
# ---------------------------------------------------------------------------


def test_sibling_glob_escapes_parent_metachars(tmp_path):
    """Glob metacharacters anywhere in the PARENT path must match literally:
    an unescaped '[i]' in a user-supplied directory silently empties the
    dotted-sibling glob, so crash recovery and version GC would miss the
    artifacts entirely."""
    parent = tmp_path / "we[i]rd dir"
    parent.mkdir()
    (parent / ".t__v_123").mkdir()
    (parent / "t__v_456").mkdir()  # legacy undotted era
    got = catalog._sibling_glob(str(parent / "t"), "v")
    assert {os.path.basename(p) for p in got} == {".t__v_123", "t__v_456"}


def test_recovery_restores_newest_old_across_eras(tmp_path):
    """With mixed-era __old_* artifacts (dotted round-6 naming + legacy
    undotted), recovery must restore by the int ns suffix — lexicographic
    order would sort every dotted name first and restore stale data."""
    parent = tmp_path / "t"
    parent.mkdir()
    older = parent / ".x__old_100"  # dotted, but OLDER by stamp
    newer = parent / "x__old_200"  # undotted legacy, NEWER by stamp
    older.mkdir()
    newer.mkdir()
    (older / "part-0.parquet").write_text("stale")
    (newer / "part-0.parquet").write_text("fresh")
    catalog._recover_interrupted_compaction(str(parent / "x"))
    assert (parent / "x" / "part-0.parquet").read_text() == "fresh"
    # the superseded sibling is cleaned up, not left to leak
    assert not older.exists() and not newer.exists()


def test_partition_visibility_anchored_to_artifact_shape():
    """A partition VALUE that merely contains a marker substring stays
    visible; only the exact artifact shape (__<kind>_<digits> at end) and
    hidden prefixes are skipped."""
    hidden = [".t__v_1", "_temporary", "t__v_123", "t__compact_9", "t__old_5"]
    visible = ["d=x__v_1y", "d=a__v_", "d=__v_x", "d=plain", "d=x__version_1"]
    assert all(catalog._is_hidden_or_sibling(n) for n in hidden)
    assert not any(catalog._is_hidden_or_sibling(n) for n in visible)


def _evolved_table(spark, work: str, partitioned: bool):
    """v1 era (id int, name) then v2 era (id long, name, score double),
    written under the recorded evolution; returns the v2 spec."""
    keys = ("batch",) if partitioned else ()
    fields1 = [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
    ]
    fields2 = [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
    if partitioned:
        fields1.append(StructField("batch", IntegerType()))
        fields2.append(StructField("batch", IntegerType()))
    v1 = catalog.TableSpec("evo", StructType(fields1), partition_keys=keys)
    v2 = evolve_spec(v1, StructType(fields2))
    rows1 = [(i, f"a{i}") + ((1,) if partitioned else ()) for i in range(8)]
    rows2 = [
        (2**40 + i, f"b{i}", i / 2) + ((2,) if partitioned else ())
        for i in range(8)
    ]
    w1 = spark.createDataFrame(rows1, v1.schema).repartition(4).write.mode("append")
    w2 = spark.createDataFrame(rows2, v2.schema).repartition(4).write.mode("append")
    if partitioned:
        w1 = w1.partitionBy("batch")
        w2 = w2.partitionBy("batch")
    w1.parquet(work)
    w2.parquet(work)
    catalog.save_schema_history(work, v2)
    return v2


def _expected_evolved_rows():
    exp = {i: (f"a{i}", None) for i in range(8)}
    exp.update({2**40 + i: (f"b{i}", i / 2) for i in range(8)})
    return exp


def test_compact_preserves_evolved_table(spark, tmp_path, monkeypatch):
    """Compacting a multi-schema-version table must conform, not sample:
    the naive spark.read.parquet would infer from ONE footer and silently
    drop `score` (or narrow `id`) for every row.  The rewrite must keep
    all columns/values and carry the history sidecar into the new version
    dir, so post-compaction evolved reads stay footer-free."""
    import os

    work = str(tmp_path / "evo")
    v2 = _evolved_table(spark, work, partitioned=False)
    n = catalog.compact_small_files(spark, work, target_mb=128)
    assert n >= 1
    live = catalog.resolve_table_path(work)
    assert os.path.exists(os.path.join(live, catalog._HISTORY_SIDECAR))

    _no_footer_sweep(monkeypatch)
    got = catalog.read_spec_evolved(spark, work, v2)
    assert got.schema == v2.schema
    assert {r.id: (r.name, r.score) for r in got.collect()} == _expected_evolved_rows()


def test_compact_partitioned_evolved_strips_dir_keys(spark, tmp_path, monkeypatch):
    """Per-leaf compaction of an evolved PARTITIONED table: the conformed
    rewrite must target the schema minus dir-encoded partition keys —
    conforming a leaf to the full schema would materialize a NULL `batch`
    column INSIDE the files, colliding with the path-encoded value."""
    import os

    import pyarrow.parquet as pq

    work = str(tmp_path / "evop")
    v2 = _evolved_table(spark, work, partitioned=True)
    out = catalog.compact_partitioned_table(spark, work, target_mb=128)
    assert out["compacted"] == 2  # both batch leaves had 4 small files

    for batch in (1, 2):
        leaf = catalog.resolve_table_path(os.path.join(work, f"batch={batch}"))
        for f in os.listdir(leaf):
            if f.endswith(".parquet"):
                cols = pq.read_schema(os.path.join(leaf, f)).names
                assert "batch" not in cols, f"dir key materialized in {f}"
                assert "score" in cols  # conformed, not sampled

    _no_footer_sweep(monkeypatch)
    got = catalog.read_spec_evolved(spark, work, v2)
    rows = {r.id: (r.name, r.score, r.batch) for r in got.collect()}
    exp = {i: (f"a{i}", None, 1) for i in range(8)}
    exp.update({2**40 + i: (f"b{i}", i / 2, 2) for i in range(8)})
    assert rows == exp


def test_compact_mixed_no_history_unions_additively(spark, tmp_path):
    """A mixed directory with NO recorded history (legacy/external) is
    compacted with mergeSchema: additive drift unions (missing column ->
    NULLs) instead of silently dropping whichever columns the sampled
    footer predates."""
    work = str(tmp_path / "legacy")
    spark.createDataFrame(
        [(i, f"a{i}") for i in range(8)], "k int, a string"
    ).repartition(4).write.mode("append").parquet(work)
    spark.createDataFrame(
        [(100 + i, f"b{i}", i) for i in range(8)], "k int, a string, b int"
    ).repartition(4).write.mode("append").parquet(work)

    catalog.compact_small_files(spark, work, target_mb=128)
    got = spark.read.parquet(catalog.resolve_table_path(work))
    assert set(got.columns) == {"k", "a", "b"}
    rows = {r.k: (r.a, r.b) for r in got.collect()}
    assert rows[0] == ("a0", None) and rows[100] == ("b0", 0)


def test_compact_does_not_leak_session_timezone(spark, tmp_path):
    """The conformed rewrite goes through read_evolved, which pins the
    session timezone to UTC for its own decode semantics — a MAINTENANCE
    call must not leak that into the caller's session (an Asia/Seoul
    session would silently start rendering and casting timestamps as UTC
    after running compaction mid-session)."""
    work = str(tmp_path / "evotz")
    _evolved_table(spark, work, partitioned=False)
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        catalog.compact_small_files(spark, work, target_mb=128)
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Seoul"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # and the compacted content is still the conformed table
    got = spark.read.parquet(catalog.resolve_table_path(work))
    assert got.count() == 16 and "score" in got.columns


def test_restore_keeps_current_schema_history(spark, tmp_path):
    """Restore rolls back DATA, not the schema LOG: the hardlink farm
    copies the snapshot's files, but the new live version's sidecar must
    mirror the PRE-restore live history (history is append-only, so the
    current log is always a superset that still reads the restored
    files) — otherwise read_spec_evolved, which prefers the sidecar,
    would silently drop schema versions recorded after the snapshot.
    And the snapshot's OWN sidecar must stay byte-untouched: the farm
    hardlinks it, so an in-place rewrite would corrupt the immutable
    snapshot."""
    work = str(tmp_path / "evor")
    v2 = _evolved_table(spark, work, partitioned=False)
    catalog.compact_small_files(spark, work, target_mb=128)
    snap_ns = catalog.list_table_versions(work)[0]["created_ns"]
    snap_dir = catalog.resolve_table_path_asof(work, snap_ns)

    # record a THIRD schema version on the live table after the snapshot
    v3 = evolve_spec(
        v2,
        StructType([*v2.schema.fields, StructField("tag", StringType())]),
    )
    catalog.save_schema_history(catalog.resolve_table_path(work), v3)
    snap_history_before = catalog.load_schema_history(snap_dir)

    restored = catalog.restore_table_version(work, snap_ns)
    # the restored live version carries the CURRENT (3-version) log
    assert catalog.load_schema_history(restored) == v3.full_history
    # the snapshot's own sidecar is byte-untouched (hardlink guard)
    assert catalog.load_schema_history(snap_dir) == snap_history_before
    # and the restored data still reads under the current spec
    got = catalog.read_spec_evolved(spark, work, v3)
    assert "tag" in got.columns and got.count() == 16


def test_restore_falls_back_to_snapshot_sidecar_when_live_lost(spark, tmp_path):
    """Round-9 advice fix: if the LIVE table lost its _schema_history.json
    out-of-band but the snapshot being restored carried one, the restored
    version must keep the snapshot's history (as a copy, never a hardlink
    into the immutable snapshot) rather than silently restoring a
    versioned table with no history at all."""
    work = str(tmp_path / "evolost")
    _evolved_table(spark, work, partitioned=False)
    catalog.compact_small_files(spark, work, target_mb=128)
    snap_ns = catalog.list_table_versions(work)[0]["created_ns"]
    snap_dir = catalog.resolve_table_path_asof(work, snap_ns)
    snap_history = catalog.load_schema_history(snap_dir)
    assert snap_history  # precondition: the snapshot has a sidecar

    # simulate out-of-band deletion of the live sidecar
    live_sidecar = os.path.join(
        catalog.resolve_table_path(work), "_schema_history.json"
    )
    os.remove(live_sidecar)

    restored = catalog.restore_table_version(work, snap_ns)
    assert catalog.load_schema_history(restored) == snap_history
    # the snapshot's own copy stays untouched, and the restored one is a
    # COPY (distinct inode), not a hardlink that a later edit could corrupt
    assert catalog.load_schema_history(snap_dir) == snap_history
    snap_stat = os.stat(os.path.join(snap_dir, "_schema_history.json"))
    rest_stat = os.stat(os.path.join(restored, "_schema_history.json"))
    assert snap_stat.st_ino != rest_stat.st_ino


def test_table_stats_cache_per_epoch(spark, tmp_path):
    """catalog.cached_key_hotness: the planning statistic is computed once
    per table epoch — a second call is a pure sidecar read (no Spark
    jobs), and an append/compaction invalidates it (new epoch -> fresh
    measure)."""
    work = str(tmp_path / "statstbl")
    spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "event_id long, user_id long"
    ).write.parquet(work)

    mx, n = catalog.cached_key_hotness(spark, work, "user_id")
    assert (mx, n) == (10, 30)
    # cache hit: corrupt the parquet-visible answer path by asserting no
    # recompute — monkeypatch measure_hotness to explode if called again
    import sparkgraft.ops.sessionize as sz

    orig = sz.measure_hotness
    try:
        sz.measure_hotness = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("cache miss: measure_hotness re-ran inside the epoch")
        )
        assert catalog.cached_key_hotness(spark, work, "user_id") == (10, 30)
    finally:
        sz.measure_hotness = orig

    # new epoch: append rows -> the cached figure is stale and must refresh
    spark.createDataFrame(
        [(100 + i, 7) for i in range(25)], "event_id long, user_id long"
    ).write.mode("append").parquet(work)
    mx2, n2 = catalog.cached_key_hotness(spark, work, "user_id")
    assert (mx2, n2) == (25, 55)


def test_table_stats_sidecar_is_discovery_invisible(spark, tmp_path):
    """The stats sidecar must reuse the hidden-sibling naming: a reader of
    the table root (and partition discovery) must never see it."""
    work = str(tmp_path / "statshidden")
    spark.createDataFrame([(1, 2)], "a long, b long").write.parquet(work)
    catalog.save_table_stats(work, {"key_hotness:b": [1, 1]})
    assert spark.read.parquet(work).count() == 1
    sidecar = catalog._stats_sidecar_path(work)
    assert os.path.basename(sidecar).startswith(".")
    assert os.path.exists(sidecar)


def test_cached_index_train_once_per_epoch(spark, tmp_path):
    """catalog.cached_index: the trainer runs exactly once per table epoch
    (hit = sidecar read, never a retrain), the artifact JSON round-trips
    bit-exactly, and an append invalidates the cache (new epoch -> the
    trainer runs again)."""
    work = str(tmp_path / "idxtbl")
    spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    ).write.parquet(work)

    calls = {"n": 0}

    def trainer():
        calls["n"] += 1
        return [[1, 2], [3, 4]]

    art1, hit1 = catalog.cached_index(work, "kmeans", {"k": 2}, trainer)
    assert (art1, hit1, calls["n"]) == ([[1, 2], [3, 4]], False, 1)

    def poison():
        raise AssertionError("trainer ran on a cache hit")

    art2, hit2 = catalog.cached_index(work, "kmeans", {"k": 2}, poison)
    assert (art2, hit2) == ([[1, 2], [3, 4]], True)
    # artifacts of the same kind with DIFFERENT params are distinct slots
    art3, hit3 = catalog.cached_index(work, "kmeans", {"k": 3}, trainer)
    assert (hit3, calls["n"]) == (False, 2)
    assert art3 == [[1, 2], [3, 4]]

    # append -> new epoch -> the cached artifact is stale and retrains
    spark.createDataFrame(
        [(100, [9.0, 9.0])], "vec_id long, embedding array<double>"
    ).write.mode("append").parquet(work)
    _, hit4 = catalog.cached_index(work, "kmeans", {"k": 2}, trainer)
    assert (hit4, calls["n"]) == (False, 3)


def test_cached_index_external_store_for_readonly_table(spark, tmp_path):
    """The ``store`` parameter keeps the sidecar OUT of the table directory
    (read-only lakes — the driver lanes' testdata case): nothing is
    written next to the data, the artifact persists in the store, and the
    epoch still comes from the table (append invalidates)."""
    import os

    work = str(tmp_path / "rotbl")
    store = str(tmp_path / "statsstore")
    spark.createDataFrame([(1, 2)], "a long, b long").write.parquet(work)
    before = sorted(os.listdir(str(tmp_path)))
    names_in_table = set(os.listdir(work))

    art, hit = catalog.cached_index(work, "demo", {"x": 1}, lambda: [7], store=store)
    assert (art, hit) == ([7], False)
    # table dir untouched; no adjacent hidden sidecar materialized
    assert set(os.listdir(work)) == names_in_table
    assert sorted(os.listdir(str(tmp_path))) == sorted(before + ["statsstore"])
    art2, hit2 = catalog.cached_index(
        work, "demo", {"x": 1}, lambda: [8], store=store
    )
    assert (art2, hit2) == ([7], True)

    spark.createDataFrame([(3, 4)], "a long, b long").write.mode("append").parquet(work)
    art3, hit3 = catalog.cached_index(
        work, "demo", {"x": 1}, lambda: [9], store=store
    )
    assert (art3, hit3) == ([9], False)


def test_version_dir_append_bumps_epoch(spark, tmp_path):
    """Round-9 advice: for a compaction-managed table the epoch must be
    max(live version created_ns, newest mtime INSIDE the version dir) —
    appends land in the live version dir between compactions, and a
    statistic cached at compaction time must NOT survive them."""
    import os
    import time as _time

    work = str(tmp_path / "verstbl")
    spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "event_id long, user_id long"
    ).repartition(4).write.parquet(work)
    catalog.compact_small_files(spark, work, target_mb=128)
    assert os.path.islink(work)

    epoch0 = catalog._table_epoch(work)
    catalog.save_table_stats(work, {"key_hotness:user_id": [10, 30]})
    assert catalog.load_table_stats(work)["key_hotness:user_id"]["value"] == [10, 30]

    # append INTO the live version dir (write follows the symlink);
    # ensure the mtime moves past the flip ns even on coarse filesystems
    _time.sleep(0.05)
    spark.createDataFrame(
        [(100 + i, 7) for i in range(5)], "event_id long, user_id long"
    ).write.mode("append").parquet(work)
    assert catalog._table_epoch(work) > epoch0
    assert "key_hotness:user_id" not in catalog.load_table_stats(work), (
        "append into the live version dir must invalidate cached stats"
    )
