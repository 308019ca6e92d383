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
