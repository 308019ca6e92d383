"""Streaming deduplication — the streaming face of ext/dedup.

Two built-in shapes:

- ``dedup_exact_stream``: ``dropDuplicates`` on a key — state keeps every
  key seen since the query started (unbounded; right when the key space is
  bounded, e.g. event ids within a replay window).
- ``dedup_within_watermark``: ``dropDuplicatesWithinWatermark`` — state for
  a key is dropped once the watermark passes it, bounding memory by the
  lateness horizon instead of the key cardinality. The 100 TB/continuous
  form: at-least-once sources (Kafka replays, retried batches) dedup with
  O(keys-per-watermark-window) state.

Content-level near-dup streaming (MinHash over a stream) composes the same
way: map to (band, hash) keys with the batch expressions from ext/dedup,
then dropDuplicatesWithinWatermark on the band key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_exact_stream(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact streaming dedup on key columns (unbounded state)."""
    return events.dropDuplicates(key_cols)


def dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with watermark-bounded state: duplicates arriving
    within the lateness horizon are dropped; state is evicted after it."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
