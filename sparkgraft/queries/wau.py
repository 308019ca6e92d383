"""Weekly-active-* queries — the reference's two entry-point queries (§2.4).

Parity: reference transformer/UserIdBaseWauTransformer.scala:22-39 (exact
COUNT(DISTINCT user) per DATE_TRUNC('WEEK', …)) and
SessionIdBaseWauTransformer.scala:22-39 (distinct sessions per week).

Scale posture: exact distinct plans as Expand + two-phase HashAggregate —
one shuffle on (week, id) then one on week. That is the right plan while
results must be exact; ``approx=True`` switches to HyperLogLog++
(``approx_count_distinct``) for the 100 TB dashboard path where ±2% is fine
and the Expand shuffle dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkgraft.ops.sessionize import sessionize
from sparkgraft.ops.temporal import week_start


def weekly_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    week_from: str | None = None,
    week_to: str | None = None,
    approx: bool = False,
) -> DataFrame:
    """COUNT(DISTINCT key) GROUP BY week(ts) ORDER BY week (A1/A2 + P9 + O1)."""
    out = df.withColumn("event_week", week_start(ts_col))
    if week_from is not None:
        out = out.where(F.col("event_week") >= F.lit(week_from).cast("date"))
    if week_to is not None:
        out = out.where(F.col("event_week") <= F.lit(week_to).cast("date"))
    agg = (
        F.approx_count_distinct(key_col) if approx else F.count_distinct(F.col(key_col))
    ).alias("wau")
    return out.groupBy("event_week").agg(agg).orderBy("event_week")


def user_wau(events: DataFrame, **kw) -> DataFrame:
    """User-based WAU (reference UserIdBaseWauTransformer)."""
    return weekly_distinct(events, "user_id", **kw)


def wau_sketches_daily(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-day HyperLogLog sketches of distinct users — the MERGEABLE
    incremental form of WAU. Each batch/day aggregates once into a tiny
    binary sketch; any window (week, trailing-28d, all-time) is then a
    sketch UNION over the days it covers, never a rescan of raw events.
    That is the 100 TB dashboard architecture: the raw-event shuffle
    happens once per day at ingest, window queries touch only
    days x 1.5 KB of sketch bytes."""
    return (
        events.withColumn("event_date", F.to_date(ts_col))
        .groupBy("event_date")
        .agg(F.hll_sketch_agg("user_id").alias("user_sketch"))
    )


def wau_from_sketches(daily: DataFrame) -> DataFrame:
    """Weekly WAU estimates from stored daily sketches: union the 7 daily
    sketches per week and estimate — no raw data touched. ±~2% rel. error
    at default lgConfigK=12 (tolerance pinned in tests against the exact
    count)."""
    return (
        daily.withColumn("event_week", week_start("event_date"))
        .groupBy("event_week")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias("wau_estimate")
        )
        .orderBy("event_week")
    )


def session_wau(events: DataFrame, gap_seconds: int = 300, **kw) -> DataFrame:
    """Session-based WAU: sessionize (5-min gap), then distinct sessions per
    week (reference SessionIdBaseWauTransformer over the sessionized table)."""
    sess = sessionize(
        events, gap_seconds=gap_seconds, order_tiebreak=("event_id",)
    )
    return weekly_distinct(sess, "session_id", **kw)
