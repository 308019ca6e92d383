"""Independent brute-force checks for the round-3 analytics lane.

The DuckDB oracles mirror each query's construction; these tests instead
recompute the answers from first principles in plain Python (sets, sweeps,
fractions), so a shared construction bug between query and oracle can't
hide.  Planted-fixture tests pin the operator semantics on known inputs.
"""

from __future__ import annotations

import collections
import datetime
import math

from pyspark.sql import functions as F

from sparkgraft import registry
from sparkgraft.ext.corpus import chunk_boilerplate_scrub
from sparkgraft.io.readers import read_table


def test_rolling_7d_matches_bruteforce(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    rows = ev.collect()
    by_day: dict[datetime.date, set] = collections.defaultdict(set)
    for r in rows:
        by_day[r.d].add(r.user_id)
    mx = max(by_day)
    expected = {}
    day = min(by_day)
    while day <= mx:
        users: set = set()
        for k in range(7):
            users |= by_day.get(day - datetime.timedelta(days=k), set())
        if users:
            expected[day] = len(users)
        day += datetime.timedelta(days=1)
    got = {
        r.day: r.active_7d
        for r in registry.queries()["rolling_7d_active_users"](spark, sf_dir).collect()
    }
    assert got == expected


def test_peak_concurrent_matches_global_sweep(spark, sf_dir):
    """The two-level (per-day + opening-balance) sweep must equal ONE
    global brute-force sweep over all boundaries — proving the midnight
    carry logic, which the mirrored oracle alone cannot."""
    ev = read_table(spark, sf_dir, "events").select("ts").collect()
    bounds = []
    for r in ev:
        bounds.append((r.ts, -1, +1))  # (-1 sort key ranks +1 before -1 ties)
        bounds.append((r.ts + datetime.timedelta(minutes=5), 1, -1))
    bounds.sort(key=lambda t: (t[0], t[1]))
    open_now = 0
    peak: dict[datetime.date, int] = {}
    for ts, _, delta in bounds:
        open_now += delta
        d = ts.date()
        peak[d] = max(peak.get(d, -(10**9)), open_now)
    got = {
        r.day: r.peak_concurrent
        for r in registry.queries()["peak_concurrent_sessions"](spark, sf_dir).collect()
    }
    assert got == peak


def test_attribution_matches_bruteforce(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    ).collect()
    convs = [r for r in ev if r.event_type == "purchase"]
    touches = [r for r in ev if r.event_type in ("click", "view")]
    by_user: dict[int, list] = collections.defaultdict(list)
    for t in touches:
        by_user[t.user_id].append(t)
    week = datetime.timedelta(days=7)
    agg: dict[str, list] = collections.defaultdict(lambda: [0, set(), 0])
    for c in convs:
        window = [
            t
            for t in by_user.get(c.user_id, [])
            if c.ts - week <= t.ts < c.ts
        ]
        if not window:
            continue
        ppm = math.floor(1_000_000.0 / len(window))
        for t in window:
            row = agg[t.event_type]
            row[0] += 1
            row[1].add(c.event_id)
            row[2] += ppm
    got = {
        r.event_type: (r.touches, r.conversions_touched, r.credit)
        for r in registry.queries()["attribution_linear"](spark, sf_dir).collect()
    }
    expected = {
        et: (n, len(cset), ppm_sum / 1_000_000.0)
        for et, (n, cset, ppm_sum) in agg.items()
    }
    assert got == expected


def test_gapfill_planted(spark, sf_dir):
    df = registry.queries()["timeseries_gapfill"](spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    mn, mx = ev.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).first()
    n_days = (mx - mn).days + 1
    rows = df.collect()
    # grid is complete and dense
    assert len(rows) == n_users * n_days
    # forward-fill: any zero-event day after a user's first activity carries
    # the previous peak; before first activity it is NULL
    by_user: dict[int, list] = collections.defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.user_id, r.day)):
        by_user[r.user_id].append(r)
    for series in by_user.values():
        last_peak = None
        for r in series:
            if r.n_events == 0:
                assert (
                    (r.last_seen_peak is None and last_peak is None)
                    or r.last_seen_peak == last_peak
                )
            else:
                last_peak = r.last_seen_peak
                assert last_peak is not None


def test_pagerank_mass_and_floor(spark, sf_dir):
    res = registry.queries()["trade_pagerank"](spark, sf_dir).collect()
    scale = 10**12
    n = len(res)
    base = math.floor(0.15 * scale / n)
    total = sum(r.rank_scaled for r in res)
    # floor() truncation and dangling leak only ever REMOVE mass
    assert total <= scale
    # every node keeps at least the teleport floor
    assert all(r.rank_scaled >= base for r in res)
    # ranks must not have collapsed to the uniform floor everywhere
    assert any(r.rank_scaled > base for r in res)


def test_chunk_scrub_planted(spark):
    boiler = "all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma one two three"),
            (2, f"{boiler} delta epsilon zeta four five six"),
            (3, f"{boiler} eta theta iota seven eight nine"),
            (4, "unique words only here nothing shared at all nine"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in chunk_boilerplate_scrub(docs, chunk=3, min_df=3).collect()
    }
    # the shared leading 3-word segment is boilerplate (df=3) and removed
    for i in (1, 2, 3):
        assert out[i].n_removed == 1
        assert boiler not in out[i].clean_text
        assert out[i].n_chunks == 3
    # the unique doc is untouched
    assert out[4].n_removed == 0
    assert out[4].clean_text == "unique words only here nothing shared at all nine"
    # survivors keep original order
    assert out[1].clean_text == "alpha beta gamma one two three"


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    """approx_percentile(accuracy=10000) guarantees rank error <= n/10000;
    check the returned values sit within the corresponding VALUE bracket
    of the exactly-sorted per-type samples. (The registered query now emits
    the audit BOOLEANS — see value_quantiles_approx — so the raw estimates
    are recomputed here with the same accuracy and checked against the
    rank-error contract directly, and the audit booleans must all be true.)"""
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    exact: dict[str, list] = collections.defaultdict(list)
    for r in ev.collect():
        exact[r.event_type].append(r.value)
    approx = {
        r.event_type: r.ap
        for r in ev.groupBy("event_type")
        .agg(F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").alias("ap"))
        .collect()
    }
    for etype, (p50, p90, p99) in approx.items():
        vals = sorted(exact[etype])
        n = len(vals)
        for p, v in (("p50", p50), ("p90", p90), ("p99", p99)):
            q = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[p]
            rank = q * (n - 1)
            eps = max(1, math.ceil(n / 10000))
            lo = vals[max(0, math.floor(rank) - eps)]
            hi = vals[min(n - 1, math.ceil(rank) + eps)]
            assert lo <= v <= hi, (etype, p, v, lo, hi)
    for row in registry.queries()["value_quantiles_approx"](spark, sf_dir).collect():
        assert row.p50_ok and row.p90_ok and row.p99_ok, row


def test_table_fingerprint_partition_invariant(spark, sf_dir):
    """The fingerprint's whole claim is layout-invariance: any repartition /
    shuffle order must produce the identical (n_rows, sum_hash, xor_hash)
    digest, and any single-cell mutation must change it."""
    from pyspark.sql import functions as F

    from sparkgraft.registry import _FP_CANON_SPARK, queries
    from sparkgraft.io.readers import read_table

    base = queries()["table_fingerprint"](spark, sf_dir).collect()[0]

    def digest(df):
        h = df.select(
            F.expr(
                "CAST(conv(substr(md5("
                + _FP_CANON_SPARK
                + "), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h")
        )
        return h.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("sum_hash"),
            F.expr("bit_xor(h)").alias("xor_hash"),
        ).collect()[0]

    li = read_table(spark, sf_dir, "lineitem")
    shuffled = digest(li.repartition(13, "l_partkey"))
    assert tuple(shuffled) == tuple(base)

    mutated = digest(
        li.withColumn(
            "l_quantity",
            F.when(
                F.col("l_orderkey") == li.select(F.min("l_orderkey")).collect()[0][0],
                F.col("l_quantity") + 1.0,
            ).otherwise(F.col("l_quantity")),
        )
    )
    assert mutated["n_rows"] == base["n_rows"]
    assert mutated["sum_hash"] != base["sum_hash"]
    assert mutated["xor_hash"] != base["xor_hash"]


def test_temperature_mix_isqrt_exact(spark):
    """The alpha=0.5 weight is claimed to be the EXACT integer sqrt of
    n_docs*1e6 (floor(sqrt(double)) with +/-1 correction).  Check the Spark
    expression against math.isqrt on adversarial values: perfect squares,
    squares +/-1, and values near the 2^52 double-mantissa contract bound."""
    import math

    from pyspark.sql import functions as F

    vals = [0, 1, 2, 3, 4, 5, 24, 25, 26, 10**6, 10**6 - 1, 10**6 + 1]
    vals += [x for k in (67108864, 94906265) for x in (k * k - 1, k * k, k * k + 1)]
    vals += [2**52 - 1, 2**52]
    df = spark.createDataFrame([(v,) for v in vals], "d: long")
    w0 = F.floor(F.sqrt(F.col("d").cast("double"))).cast("bigint")
    df = df.withColumn("w0", w0)
    w1 = F.col("w0") + F.when((F.col("w0") + 1) * (F.col("w0") + 1) <= F.col("d"), 1).otherwise(0)
    df = df.withColumn("w1", w1)
    out = df.withColumn(
        "w", F.col("w1") - F.when(F.col("w1") * F.col("w1") > F.col("d"), 1).otherwise(0)
    ).select("d", "w").collect()
    for row in out:
        assert row["w"] == math.isqrt(row["d"]), (row["d"], row["w"])


def test_temperature_mix_upweights_small_sources(spark, sf_dir):
    """With alpha=0.5 a below-average source must get p_ppm ABOVE its raw
    ppm share and a large source below it (that is the point of temperature
    sampling); keep_ppm stays in [0, 1e6]; kept counts are bounded by
    n_docs and deterministic across reruns."""
    from sparkgraft.registry import queries

    rows = queries()["corpus_temperature_mix"](spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    for r in rows:
        raw_ppm = 1_000_000 * r["n_docs"] // total
        if r["n_docs"] * len(rows) < total:
            assert r["p_ppm"] > raw_ppm, (r["source"], r["p_ppm"], raw_ppm)
        elif r["n_docs"] * len(rows) > total:
            assert r["p_ppm"] < raw_ppm, (r["source"], r["p_ppm"], raw_ppm)
        assert 0 <= r["keep_ppm"] <= 1_000_000
        assert 0 <= r["n_kept"] <= r["n_docs"]
    rows2 = queries()["corpus_temperature_mix"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_twap_constant_value_user(spark):
    """For a user whose events all carry the same value v, the
    time-weighted average is exactly v regardless of spacing, and the
    3600 s cap bounds each weight: replicate the registry expression on a
    constructed frame where gaps straddle the cap."""
    import datetime as dt

    from pyspark.sql import Window, functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0, 7.5),
        (2, 1, t0 + dt.timedelta(seconds=10), 7.5),
        (3, 1, t0 + dt.timedelta(hours=5), 7.5),   # gap far beyond cap
        (4, 1, t0 + dt.timedelta(hours=5, seconds=30), 7.5),
        (5, 2, t0, 1.0),
        (6, 2, t0 + dt.timedelta(seconds=100), 3.0),
        (7, 2, t0 + dt.timedelta(seconds=200), 99.0),  # last: excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp, value: double"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
    d = (
        df.select("user_id", "value", gap.alias("gap"))
        .where(F.col("gap").isNotNull() & (F.col("gap") > 0))
        .select("user_id", "value", F.least("gap", F.lit(3600)).alias("dur"))
    )
    out = {
        r["user_id"]: r
        for r in d.groupBy("user_id")
        .agg(
            F.sum("dur").cast("bigint").alias("active_seconds"),
            (
                F.sum((F.col("value") * F.col("dur")).cast("decimal(28,6)")).cast("double")
                / F.sum("dur").cast("double")
            ).alias("twa_value"),
        )
        .collect()
    }
    assert out[1]["active_seconds"] == 10 + 3600 + 30
    assert out[1]["twa_value"] == 7.5
    # user 2: 1.0 for 100s then 3.0 for 100s -> 2.0; the 99.0 tail never weighs in
    assert out[2]["active_seconds"] == 200
    assert out[2]["twa_value"] == 2.0


def test_ewma_matches_pandas_ewm(spark, sf_dir):
    """Independent replica: pandas ewm(alpha=0.5, adjust=True) over each
    user's last-24 series (oldest->newest) must agree with the registry
    EWMA to float tolerance — pinning the weight orientation (newest gets
    0.5^0), the adjust-normalization semantics, and the round-5 integer
    re-plan (cents x 2^(23-k)) against an arithmetic path that shares
    none of its machinery."""
    import pandas as pd

    from sparkgraft.io.readers import read_table
    from sparkgraft.registry import queries

    got = {
        r["user_id"]: (r["n_terms"], r["ewma_value"])
        for r in queries()["ewma_user_value"](spark, sf_dir).collect()
    }
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, g in ev.groupby("user_id"):
        tail = g["value"].tail(24)
        exp = tail.ewm(alpha=0.5, adjust=True).mean().iloc[-1]
        n, ewma = got[uid]
        assert n == len(tail)
        assert abs(ewma - exp) < 1e-9, (uid, ewma, exp)


def test_snapshot_diff_counts_match_buckets(spark, sf_dir):
    """The diff classification must reconcile exactly with the bucket
    construction: added == |bkt 2|, removed == |bkt 0|, changed == |bkt 1|,
    unchanged == the rest."""
    from pyspark.sql import functions as F

    from sparkgraft.io.readers import read_table
    from sparkgraft.registry import _SNAP_BUCKET, queries

    got = {
        r["change_type"]: r["n_rows"]
        for r in queries()["snapshot_diff_orders"](spark, sf_dir).collect()
    }
    buckets = dict(
        read_table(spark, sf_dir, "orders")
        .groupBy(F.expr(_SNAP_BUCKET).alias("b"))
        .count()
        .collect()
    )
    n_total = sum(buckets.values())
    assert got.get("added", 0) == buckets.get(2, 0)
    assert got.get("removed", 0) == buckets.get(0, 0)
    assert got.get("changed", 0) == buckets.get(1, 0)
    assert got.get("unchanged", 0) == n_total - buckets.get(0, 0) - buckets.get(
        1, 0
    )


def test_zorder_interleave_matches_python_morton(spark):
    """The generated shift-mask SQL must equal a reference Morton encode for
    adversarial (x, y) pairs: all-ones, alternating bits, single hot bits,
    and the 16-bit corners."""
    from pyspark.sql import functions as F

    from sparkgraft.registry import _z_interleave_spark

    def morton(x, y, bits=16):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    pairs = [
        (0, 0), (1, 0), (0, 1), (1, 1), (65535, 0), (0, 65535),
        (65535, 65535), (0b1010101010101010, 0b0101010101010101),
        (32768, 1), (12345, 54321),
    ]
    df = spark.createDataFrame(pairs, "x: long, y: long")
    out = df.selectExpr(
        "x", "y", _z_interleave_spark("x", "y") + " AS z"
    ).collect()
    for r in out:
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"], r["z"])


def test_zorder_buckets_bound_both_dims(spark):
    """Locality property on data that actually spans the key space: within
    one top-6-bit curve bucket, BOTH dimensions' ranges are bounded by
    2^13 (the free low bits) — the bounding-box tightness that makes
    z-order pruning work."""
    from pyspark.sql import functions as F

    from sparkgraft.registry import _z_interleave_spark

    df = spark.range(0, 20000).selectExpr(
        "CAST(pmod(hash(id), 65536) AS BIGINT) AS x",
        "CAST(pmod(hash(id + 777), 65536) AS BIGINT) AS y",
    )
    z = df.selectExpr("x", "y", _z_interleave_spark("x", "y") + " AS z")
    rows = (
        z.groupBy(F.expr("z div 67108864").alias("bucket"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(rows) > 16
    for r in rows:
        assert r["dx"] < 8192 and r["dy"] < 8192, r


def test_bitmap_partials_merge_losslessly(spark, sf_dir):
    """Re-aggregation invariance: building bitmaps per (type, week, bucket)
    then OR-merging across weeks must equal building them directly per
    (type, bucket) — the property that makes the weekly partials a valid
    incremental materialized view."""
    from pyspark.sql import functions as F

    from sparkgraft.io.readers import read_table
    from sparkgraft.registry import queries

    ev = read_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: r["distinct_users"]
        for r in ev.groupBy(
            "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
        )
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users"))
        .collect()
    }
    merged = {
        r["event_type"]: r["distinct_users"]
        for r in queries()["bitmap_distinct_rollup"](spark, sf_dir).collect()
    }
    assert merged == direct


def test_trend_recovers_planted_line(spark):
    """OLS on an exactly-linear series must return the exact slope and
    intercept (all moments integer-exact); a single-timestamp user must
    return NULL slope, not divide-by-zero."""
    import datetime as dt

    from pyspark.sql import Window, functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: y = 1 + 2 * xr_seconds, xr in {0, 10, 20, 30}
        (1, 1, t0, 1.0),
        (2, 1, t0 + dt.timedelta(seconds=10), 21.0),
        (3, 1, t0 + dt.timedelta(seconds=20), 41.0),
        (4, 1, t0 + dt.timedelta(seconds=30), 61.0),
        # user 2: two events, same second -> degenerate
        (5, 2, t0, 5.0),
        (6, 2, t0, 9.0),
    ]
    span = 500_000_000  # ~16 years in seconds
    rows += [
        (100 + i, 3, t0 + dt.timedelta(seconds=i * span // 500), 1.0 + 2.0 * (i * span // 500))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp, value: double"
    )
    w = Window.partitionBy("user_id")
    x = df.select(
        "user_id",
        "value",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.min("ts").over(w))).alias("xr"),
    )
    m = x.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xr").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("xr").cast("decimal(38,0)") * F.col("xr")).alias("sxx"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum((F.col("value") * F.col("xr")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
    ).withColumn("den", F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    num = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    slope = num / F.col("den").cast("double")
    out = {
        r["user_id"]: r
        for r in m.select(
            "user_id",
            F.when(F.col("den") == 0, F.lit(None)).otherwise(slope).alias("slope_per_sec"),
            F.when(F.col("den") == 0, F.lit(None))
            .otherwise(
                (F.col("sy") - slope * F.col("sx").cast("double"))
                / F.col("n").cast("double")
            )
            .alias("intercept"),
        ).collect()
    }
    assert out[1]["slope_per_sec"] == 2.0
    assert out[1]["intercept"] == 1.0
    assert out[2]["slope_per_sec"] is None and out[2]["intercept"] is None
    # user 3: a 16-YEAR span — sx*sx ~ 2.5e23 would overflow BIGINT
    # arithmetic (ANSI error); the decimal co-moments must survive and
    # still recover the exact planted slope
    assert abs(out[3]["slope_per_sec"] - 2.0) < 1e-12
    assert abs(out[3]["intercept"] - 1.0) < 1e-3


def test_triangle_counts_planted_graph(spark):
    """K4 + a pendant edge: every K4 node sits in exactly C(3,2)=3
    triangles, the pendant node in none; total triangle mass = 3 * 4
    (each of the 4 triangles credits 3 nodes)."""
    from sparkgraft.ext.simsearch import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 99)], "vec_a: long, vec_b: long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_mad_outliers_robust_to_planted_spike(spark, sf_dir):
    """The point of MAD over z-score: one enormous planted value must be
    flagged without dragging the median/MAD (robustness), and the flagged
    set must equal a brute-force recompute."""
    from pyspark.sql import functions as F

    from sparkgraft.io.readers import read_table
    from sparkgraft.registry import queries

    rows = queries()["value_mad_outliers"](spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    ).collect()
    import statistics

    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for out in rows:
        vals = by_type[out["event_type"]]
        med = round(statistics.median(vals), 6)
        assert out["median_value"] == med
        mad = round(statistics.median(abs(v - med) for v in vals), 6)
        assert out["mad"] == mad
        n_out = sum(1 for v in vals if abs(v - med) > 3 * 1.4826 * mad)
        assert out["n_outliers"] == n_out
        assert out["n"] == len(vals)


def test_exact_sum_fixed_high_scale_stays_exact(spark):
    """Regression: at scale >= 7 the naive units multiply
    (decimal(28,s) * decimal(20,0)) exceeds precision 38 and Spark's
    adjustPrecisionScale clamps the product's scale back toward 6,
    silently rounding the fixed-point units before the BIGINT cast.
    _fixed_units caps the cast precision at 36-scale so the product is
    never adjusted — picogrid values must survive a scale-12 sum, and the
    DuckDB twin (widths ADD on multiply there too) must match bitwise."""
    import struct

    import duckdb

    from sparkgraft.ops.relational import exact_sum_fixed

    vals = [1.000000000001, 2.000000000002, 3.000000000003]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(exact_sum_fixed("v", scale=12, precision=28).alias("s")).collect()[
        0
    ]["s"]
    assert got == 6000000000006 / 1e12  # 6.000000000006, not 6.0

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (?),(?),(?)) v(v)", vals)
    twin = con.execute(
        "SELECT CAST(SUM(CAST(CAST(v AS DECIMAL(24,12))"
        "  * CAST(1000000000000 AS DECIMAL(13,0)) AS BIGINT)) AS DOUBLE)"
        "  / 1000000000000.0 AS s FROM t"
    ).fetchone()[0]
    assert struct.pack("<d", got) == struct.pack("<d", twin)

    # the default-scale path is unchanged (same type math as before the cap)
    got6 = df.agg(exact_sum_fixed("v").alias("s")).collect()[0]["s"]
    assert got6 == 6.0
