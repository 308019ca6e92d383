"""Event-time sessionization — the reference's signature capability (§2.11).

Semantics (reference transformer/DataLoadTransformer.scala:57-81, rule in the
Korean comment at :58-59): a new session starts at a user's first event, or
whenever the gap since their previous event is >= ``gap_seconds`` (default
300 s). Every event carries its session's id.

Engine design (idiomatic Spark, one shuffle):

1. ``lag(ts)`` over (user, ts-order)            -> previous event time   [W1]
2. ``is_new = prev IS NULL OR ts >= prev+gap``  -> session-start flag
3. session_start = running max of start ts      -> forward-fill          [W2]
   (monotone, so ``max`` over an unbounded-preceding frame is equivalent to
   ``last(…, ignoreNulls)`` and cheaper: no null bookkeeping)
4. session_id = sha2(user # epoch_us(start))    -> deterministic id

The reference generates a random UUID per session start (UD1,
DataLoadTransformer.scala:60) — non-deterministic, not oracle-checkable, and
dangerous under task retry (a recomputed partition would mint new ids).
Our default is a content-derived id with the same uniqueness contract
(unique per (user, session-start instant)); pass ``id_kind="uuid"`` for
behavioral parity with the reference.

All three windows share ONE partitioning (user) and ordering (ts, tiebreak),
so Catalyst plans a single Exchange+Sort for the whole pipeline — verified
via explain() in tests. At 100 TB this is one shuffle of the event table,
the theoretical minimum for per-user ordered work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 300,
    order_tiebreak: Sequence[str] = (),
    id_kind: str = "deterministic",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign ``session_col`` to every event. Adds nothing else.

    ``order_tiebreak``: extra ordering columns after ``ts_col`` so rows with
    identical timestamps order deterministically (required for oracle
    parity; pass e.g. ``("event_id",)``).
    """
    order_cols = [ts_col, *order_tiebreak]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev_ts = F.lag(ts_col).over(w)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
    is_new = prev_ts.isNull() | (F.col(ts_col) >= prev_ts + gap)

    if id_kind == "uuid":
        # Reference-parity path (UD1): a fresh random UUID minted AT each
        # session start, forward-filled to the session's remaining events —
        # exactly the reference's shape (UUID at starts + last ignoreNulls).
        # Non-deterministic across runs by design; not oracle-checkable.
        start_id = F.when(is_new, F.expr("uuid()"))
        return df.withColumn(session_col, F.last(start_id, ignorenulls=True).over(run))
    if id_kind != "deterministic":
        raise ValueError(f"unknown id_kind: {id_kind}")

    start_marker = F.when(is_new, F.col(ts_col))
    session_start = F.max(start_marker).over(run)
    out = df.withColumn("__session_start", session_start)
    out = out.withColumn(session_col, _session_id(user_col, "__session_start", id_kind))
    return out.drop("__session_start")


def _session_id(user_col: str, start_col: str, id_kind: str) -> Column:
    return F.sha2(
        F.concat_ws(
            "#",
            F.col(user_col).cast("string"),
            F.unix_micros(F.col(start_col).cast("timestamp")).cast("string"),
        ),
        256,
    )


def session_bounds(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """One row per session: (user, session, start, end, n_events).

    Single groupBy over the already-sessionized frame; partial aggregation
    makes this map-side cheap.
    """
    return df.groupBy(user_col, session_col).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def carryover_frontier(
    existing: DataFrame,
    boundary_ts,
    user_col: str = "user_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
    gap_seconds: int = 300,
) -> DataFrame:
    """Each user's LAST event within ``gap_seconds`` before ``boundary_ts``.

    Parity: reference transformer/DataLoadTransformer.scala:111-131 — the
    "last 5 minutes of the previous batch" slice used to stitch sessions
    across batch boundaries. Output columns:
    (user, existing_session_id, last_event_ts).

    The time-slice filter happens BEFORE the window, so at scale this reads
    one partition's tail, not the table.
    """
    boundary = F.lit(boundary_ts).cast(existing.schema[ts_col].dataType)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
    sliver = existing.where((F.col(ts_col) < boundary) & (F.col(ts_col) >= boundary - gap))
    w_max = F.max(ts_col).over(Window.partitionBy(user_col))
    return (
        sliver.withColumn("__max_ts", w_max)
        .where(F.col(ts_col) == F.col("__max_ts"))  # P6: keep latest per user
        .select(
            F.col(user_col),
            F.col(session_col).alias("existing_session_id"),
            F.col(ts_col).alias("last_event_ts"),
        )
        .dropDuplicates([user_col])  # ties on identical ts: any one row works
    )


def sessionize_with_continuity(
    new_events: DataFrame,
    frontier: DataFrame | None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 300,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Sessionize ``new_events``, adopting carried-over session ids where a
    user's first new event continues a session from the previous batch.

    Parity: reference transformer/DataLoadTransformer.scala:94-158
    (replaceWithExistingSessionId): left-join the frontier on user [J1], and
    where the first new event starts < gap after the carried-over last
    event, keep the existing session id instead of minting a new one.

    The frontier is tiny (≤1 row per active-in-last-5-min user), so Spark
    broadcast-joins it — no extra shuffle of the event table.
    """
    order_cols = [ts_col, *order_tiebreak]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECOND")

    prev_ts = F.lag(ts_col).over(w)
    df = new_events.withColumn("__prev_ts", prev_ts)

    if frontier is not None:
        df = df.join(F.broadcast(frontier), on=user_col, how="left")
        # The batch-continuation rule applies only to a user's FIRST event in
        # this batch (prev IS NULL within the batch).
        continues = (
            F.col("__prev_ts").isNull()
            & F.col("last_event_ts").isNotNull()
            & (F.col(ts_col) < F.col("last_event_ts") + gap)
        )
    else:
        df = df.withColumn("existing_session_id", F.lit(None).cast("string"))
        continues = F.lit(False)

    is_new = (F.col("__prev_ts").isNull() | (F.col(ts_col) >= F.col("__prev_ts") + gap)) & ~continues

    start_marker = F.when(is_new, F.col(ts_col))
    session_start = F.max(start_marker).over(run)
    fresh_id = _session_id(user_col, "__session_start", "deterministic")
    carried_id = F.last(F.when(continues, F.col("existing_session_id")), ignorenulls=True).over(run)

    out = (
        df.withColumn("__session_start", session_start)
        .withColumn(
            session_col,
            # A row belongs to the carried-over session iff no fresh session
            # has started at-or-before it (session_start null ⇒ the only
            # start so far was the carried one).
            F.when(F.col("__session_start").isNull(), carried_id).otherwise(fresh_id),
        )
        .drop("__prev_ts", "__session_start", "existing_session_id", "last_event_ts")
    )
    return out
