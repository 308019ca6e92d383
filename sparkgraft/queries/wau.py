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


def session_wau(events: DataFrame, gap_seconds: int = 300, **kw) -> DataFrame:
    """Session-based WAU: sessionize (5-min gap), then distinct sessions per
    week (reference SessionIdBaseWauTransformer over the sessionized table)."""
    sess = sessionize(
        events, gap_seconds=gap_seconds, order_tiebreak=("event_id",)
    )
    return weekly_distinct(sess, "session_id", **kw)
