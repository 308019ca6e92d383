"""Window-function building blocks (reference §2.5 W1-W3).

The reference's sessionization is built entirely from three window shapes;
we expose them as reusable helpers. All are single-shuffle
(`hashpartitioning(partition_cols)`) and AQE handles skewed partitions.

Scale note: ``Window.partitionBy(user)`` materializes each user's history in
one task — fine for clickstream users (≤10⁵ events each); for pathological
hot keys, pre-split by a salt on a bounded sub-window and merge (see
ops/sessionize.py docstring).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, Window, WindowSpec, functions as F


def ordered_window(partition_cols: Sequence[str], order_cols: Sequence[str]) -> WindowSpec:
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def lag_over(
    col: str, partition_cols: Sequence[str], order_cols: Sequence[str], offset: int = 1
) -> Column:
    """Previous value per partition in event order (W1).

    Parity: reference transformer/DataLoadTransformer.scala:62-66.
    """
    return F.lag(col, offset).over(ordered_window(partition_cols, order_cols))


def forward_fill(
    col: Column | str, partition_cols: Sequence[str], order_cols: Sequence[str]
) -> Column:
    """Running last-non-null — propagates a sparse marker to following rows
    (W2). Parity: reference transformer/DataLoadTransformer.scala:77-81."""
    w = ordered_window(partition_cols, order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return F.last(col, ignorenulls=True).over(w)


def partition_max(col: str, partition_cols: Sequence[str]) -> Column:
    """Whole-partition max, keeping row context (W3).

    Parity: reference transformer/DataLoadTransformer.scala:122-125 (per-user
    max timestamp, later filtered to keep each user's latest event).
    """
    return F.max(col).over(Window.partitionBy(*partition_cols))


def scalable_row_number(
    df,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "rn",
    n_chunks: int | None = None,
):
    """Exact ``row_number() OVER (PARTITION BY part_cols ORDER BY order_cols)``
    without ever sorting a whole group in one task.

    ``Window.partitionBy(k).orderBy(...)`` materializes each key's rows in ONE
    task — fatal when ``k`` is low-cardinality (an ~6-value ``event_type`` at
    100 TB means multi-TB single-task sorts). This is the two-level prefix-sum
    shape (SCALE.md "Global orderings without global windows") applied to
    ranking:

    1. range-partition on ``(part_cols, order_cols)`` into ``n_chunks`` tasks —
       each task holds a contiguous slice of the global order, bounded by
       ``|df| / n_chunks`` regardless of group cardinality;
    2. ``row_number`` within ``(part_cols, chunk)`` — a bounded local sort;
    3. offsets from the per-(group, chunk) COUNTS relation (≤ groups × chunks
       rows — tiny) via a window over that tiny relation only, broadcast back.

    Composition is exact: chunk ids follow range order, so
    ``offset + local_rn`` is the global row number, bit-identical to the naive
    single-task form (property-tested in tests/test_ops.py).

    Requires ``order_cols`` to totally order rows within each group (add a
    unique tiebreak column); intended for LOW-cardinality ``part_cols`` — for
    high-cardinality keys the plain window is already bounded and cheaper.
    """
    spark = df.sparkSession
    if n_chunks is None:
        n_chunks = max(spark.sparkContext.defaultParallelism, 32)
    keyed = df.repartitionByRange(n_chunks, *part_cols, *order_cols).withColumn(
        "__chunk", F.spark_partition_id()
    )
    local_w = Window.partitionBy(*part_cols, "__chunk").orderBy(*order_cols)
    local = keyed.withColumn("__lrn", F.row_number().over(local_w))
    counts = keyed.groupBy(*part_cols, "__chunk").agg(F.count(F.lit(1)).alias("__cnt"))
    off_w = (
        Window.partitionBy(*part_cols)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *part_cols,
        "__chunk",
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), [*list(part_cols), "__chunk"])
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("bigint"))
        .drop("__chunk", "__lrn", "__off")
    )


def group_sizes(df, part_cols: Sequence[str]):
    """Per-group row counts as a tiny broadcastable relation (``__n``) —
    the companion to :func:`scalable_row_number` for rank-normalizing
    functions (ntile / percent_rank / cume_dist) that need ``n`` per group."""
    return df.groupBy(*part_cols).agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
