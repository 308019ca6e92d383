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
