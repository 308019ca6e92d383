"""range_join edge cases: half-open bounds, slab-boundary alignment,
multi-slab intervals, degenerate intervals, equi-key composition — plus
equality against a brute-force inequality join on real testdata."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from sparkgraft.io.readers import read_table
from sparkgraft.ops.relational import range_join

T0 = datetime(2024, 3, 1, 0, 0, 0)


def _events(spark, offsets):
    return spark.createDataFrame(
        [(i, T0 + timedelta(seconds=s)) for i, s in enumerate(offsets)],
        "event_id long, ts timestamp_ntz",
    )


def _windows(spark, spans):
    return spark.createDataFrame(
        [
            (i, T0 + timedelta(seconds=a), T0 + timedelta(seconds=b))
            for i, (a, b) in enumerate(spans)
        ],
        "window_id long, w_start timestamp_ntz, w_end timestamp_ntz",
    )


def _pairs(out):
    return {(r.window_id, r.event_id) for r in out.collect()}


def test_half_open_bounds_and_slab_edges(spark):
    # slab = 100 s. Window [150, 350): start mid-slab, end mid-slab, spans
    # slabs 1-3. Window [300, 400): end exactly ON a slab edge — the edge
    # slab must NOT be probed/matched (end exclusive).
    ev = _events(spark, [149, 150, 349, 350, 399, 400])
    win = _windows(spark, [(150, 350), (300, 400)])
    out = range_join(ev, win, "ts", "w_start", "w_end", slab_seconds=100)
    assert _pairs(out) == {
        (0, 1),  # ts=150 == start: inclusive
        (0, 2),  # ts=349 < 350
        (1, 3),  # ts=350 in [300,400)
        (1, 2),  # ts=349 in [300,400)
        (1, 4),  # ts=399 < 400
    }


def test_degenerate_and_multi_slab_windows(spark):
    # empty (end == start) and inverted (end < start) windows match nothing;
    # a 5-slab window catches everything inside it exactly once
    ev = _events(spark, [0, 99, 250, 499, 500])
    win = _windows(spark, [(100, 100), (200, 100), (0, 500)])
    out = range_join(ev, win, "ts", "w_start", "w_end", slab_seconds=100)
    assert _pairs(out) == {(2, 0), (2, 1), (2, 2), (2, 3)}


def test_matches_brute_force_on_testdata(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
    win = (
        ev.orderBy("ts")
        .limit(20)
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 7 HOUR")).alias("w_end"),
        )
    )
    got = _pairs(
        range_join(ev, win, "ts", "w_start", "w_end", slab_seconds=3600).select(
            "window_id", "event_id"
        )
    )
    brute = _pairs(
        ev.join(
            win,
            (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
        ).select("window_id", "event_id")
    )
    assert got == brute
    assert got, "windows must catch events"


def test_extra_keys_compose(spark):
    ev = spark.createDataFrame(
        [(1, "u1", T0 + timedelta(seconds=50)), (2, "u2", T0 + timedelta(seconds=50))],
        "event_id long, user_id string, ts timestamp_ntz",
    )
    win = spark.createDataFrame(
        [("u1", T0, T0 + timedelta(seconds=100))],
        "user_id string, w_start timestamp_ntz, w_end timestamp_ntz",
    )
    out = range_join(ev, win, "ts", "w_start", "w_end", slab_seconds=60, extra_keys=("user_id",))
    assert {r.event_id for r in out.collect()} == {1}
