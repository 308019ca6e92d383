#!/usr/bin/env python3
"""Scaling-slope harness: measure the flagship lanes one decade BEYOND the
provided data.

The driver ships sf0.001 / sf0.01 / sf0.1.  Plan-shape arguments ("no
single-task sort, only bucketed pair generation") say the flagship
operators survive a 100x scale-up; this harness turns one decade of that
claim into a measurement.  It replicates the sf0.1 tables 10x with
key-SHIFTED ids — so key cardinality grows 10x alongside row count, the
realistic growth mode; per-key row counts stay constant — into a local
cache dir, then times each flagship query at sf0.001, sf0.01, sf0.1 and
the synthetic 10x, reporting the per-decade slope.  A scale-safe plan
shows ~linear slopes (10x data -> ~10x work on a fixed-core box, minus
fixed overhead); a hidden single-task sort or all-pairs blowup shows a
super-linear jump in the last decade.

PERF-ONLY DATA: the replicated decade is never used for correctness
(oracle inputs remain the driver's parquet, untouched); it exists solely
so the scaling slope is measured rather than argued.  The cache lives
under the repo (.scale_cache/, gitignored) and is rebuilt only when
absent.

Usage:
    python bench_scale.py            # writes one JSON line to stdout
    SPARK_GRAFT_SCALE_REPL=10 SPARK_GRAFT_CPUS=32 python bench_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DECADES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", BASE]
REPL = int(os.environ.get("SPARK_GRAFT_SCALE_REPL", "10"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_cache")

# flagship lanes (one per architecture family): the reference composite,
# the reference WAU aggregate, banded LSH dedup, PQ ANN, two-level-rank
# robust stats, the TPC-H headline scan-agg, the corpus-curation
# composite, the watermarked stream-stream join, and the exact-kNN
# triangle lane.  The last is the one lane whose FLOPs are inherently
# quadratic in corpus size (exact kNN: N^2/B block products) — expect
# its last-decade slope near the replication factor on a fixed-core box;
# that is the exact contract's cost, and the documented switch point to
# IVF cells (ext/simsearch.ivf_topk) when approximate recall suffices.
FLAGSHIPS = [
    "sessionize_ids",
    "wau_user",
    "dedup_minhash_lsh",
    "embed_pq_topk",
    "value_mad_outliers",
    "q1_pricing_summary",
    "corpus_e2e_curation",
    "streaming_stream_join",
    "graph_triangle_count",
]

# key columns to shift per replica so cardinality scales with rows;
# (table, {column: key-space}) — columns sharing a key-space get the SAME
# offset so cross-table joins stay consistent
SHIFT = {
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "lineitem": {"l_orderkey": "order"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
}
COPY = ["region", "nation", "supplier", "part"]


def _build_scaled(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from sparkgraft.io.readers import read_table

    os.makedirs(out_dir, exist_ok=True)
    # one offset per key-space: max+1 over every column in the space
    spaces: dict[str, int] = {}
    tabs = {t: read_table(spark, BASE, t) for t in SHIFT}
    for t, cols in SHIFT.items():
        for c, space in cols.items():
            mx = tabs[t].agg(F.max(c)).collect()[0][0] or 0
            spaces[space] = max(spaces.get(space, 0), int(mx) + 1)
    for t, cols in SHIFT.items():
        df = tabs[t]
        reps = []
        for i in range(REPL):
            r = df
            for c, space in cols.items():
                r = r.withColumn(c, F.col(c) + F.lit(i * spaces[space]))
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionAll(r)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
    for t in COPY:
        src = os.path.join(BASE, f"{t}.parquet")
        if os.path.exists(src):
            read_table(spark, BASE, t).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet")
            )


def main() -> int:
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .appName("sparkgraft-bench-scale")
        .getOrCreate()
    )
    scaled = os.path.join(CACHE, f"sf0.1x{REPL}")
    marker = os.path.join(scaled, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(scaled, ignore_errors=True)
        t0 = time.monotonic()
        _build_scaled(spark, scaled)
        with open(marker, "w") as fh:
            fh.write(f"repl={REPL} base={BASE}\n")
        print(
            f"# built {scaled} in {time.monotonic() - t0:.1f}s",
            file=sys.stderr,
        )

    qs = entry.queries()
    grid = [*DECADES, scaled]
    labels = [os.path.basename(p.rstrip("/")) for p in grid]
    results: dict[str, dict[str, float]] = {}
    for name in FLAGSHIPS:
        fn = qs[name]
        per: dict[str, float] = {}
        for label, d in zip(labels, grid):
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                # noop sink, same as bench.py: full execution of every
                # operator (count() would let Catalyst prune whole
                # subtrees, e.g. a Window with unused output)
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            per[label] = round(best, 3)
        results[name] = per
    # slope of the synthetic decade: t(10x sf0.1) / t(sf0.1); ~<= REPL
    # means at-worst-linear on a fixed-core box.  graph_triangle_count is
    # excluded from the headline max: exact kNN is O(N^2) FLOPs by
    # CONTRACT, so its slope ~REPL is the expected cost of exactness (its
    # per-query number still prints; the documented scale path beyond
    # this point is IVF cells, not a bigger exact join).
    QUADRATIC = {"graph_triangle_count"}
    slopes = {
        n: round(r[labels[-1]] / r[labels[-2]], 2) if r[labels[-2]] > 0 else None
        for n, r in results.items()
    }
    out = {
        "metric": "scale_slope_last_decade_max_subquadratic",
        "value": max(
            s for n, s in slopes.items() if s is not None and n not in QUADRATIC
        ),
        "unit": "x",
        "replication": REPL,
        "queries": results,
        "slopes_last_decade": slopes,
        "quadratic_contract_lanes": sorted(QUADRATIC),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
