"""Hive-metastore integration: the catalog layer must work against a real
metastore (embedded Derby), not just the in-memory session catalog.

Runs in a subprocess: Derby allows one connection per JVM, and the shared
test session is intentionally non-Hive.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap


def test_hive_catalog_roundtrip(tmp_path):
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, {repo!r})
        from sparkgraft.session import get_spark
        from sparkgraft import catalog
        from pyspark.sql.types import *

        wh = {wh!r}
        spark = get_spark("hive-test", master="local[2]", shuffle_partitions=2,
                          hive=True, warehouse_dir=wh)
        assert "hive" in spark.conf.get("spark.sql.catalogImplementation")

        spec = catalog.TableSpec(
            "t_hive", StructType([
                StructField("k", StringType()),
                StructField("v", LongType()),
                StructField("d", StringType()),
            ]), ("d",))
        df1 = spark.createDataFrame([("a", 1, "d1"), ("b", 2, "d2")], spec.schema)
        catalog.load_overwrite(spark, spec, df1)
        # dynamic overwrite: rewriting d1 must not touch d2
        df2 = spark.createDataFrame([("a2", 10, "d1")], spec.schema)
        catalog.load_overwrite(spark, spec, df2)
        rows = {{(r.k, r.v, r.d) for r in spark.table("t_hive").collect()}}
        assert rows == {{("a2", 10, "d1"), ("b", 2, "d2")}}, rows
        # metastore-registered: visible via catalog API + SQL
        assert spark.catalog.tableExists("t_hive")
        assert spark.sql("SHOW PARTITIONS t_hive").count() == 2
        print("HIVE_OK")
        spark.stop()
        """
    ).format(repo="/root/repo", wh=str(tmp_path / "wh"))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
    )
    assert "HIVE_OK" in proc.stdout, f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-3000:]}"


def test_compact_small_files(spark, sf_dir, tmp_path):
    """50 tiny part files compact to the size-derived target; contents are
    byte-equal and the swap is atomic (original dir name preserved)."""
    import os

    from sparkgraft import catalog
    from sparkgraft.io.readers import read_table

    path = str(tmp_path / "frag")
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(50).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 50
    before = sorted(ev.collect())
    n_after = catalog.compact_small_files(spark, path, target_mb=128)
    assert n_after < n_before
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n_after
    after = sorted(spark.read.parquet(path).collect())
    assert before == after


def test_compact_small_files_clustered(spark, sf_dir, tmp_path):
    """With sort_cols the compaction re-clusters: footer min/max stats of
    the output files must cover disjoint-ish event_id ranges."""
    import os

    import pyarrow.parquet as pq

    from sparkgraft import catalog
    from sparkgraft.io.readers import read_table

    path = str(tmp_path / "frag2")
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    ev.repartition(20).write.parquet(path)
    catalog.compact_small_files(spark, path, target_mb=1, sort_cols=["event_id"])
    spans = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        if md.num_rows == 0:
            continue
        col = md.row_group(0).column(0)
        lo = col.statistics.min
        hi = md.row_group(md.num_row_groups - 1).column(0).statistics.max
        spans.append((lo, hi))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"clustered files overlap: {spans}"
