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
