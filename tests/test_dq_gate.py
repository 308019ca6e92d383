"""Fail-closed DQ gate (ops/dq.require_finite) — the consuming side of the
round-8 IEEE-specials policy: the gate must ABORT a poisoned batch loudly
BEFORE the gated job's expensive stage runs, and be invisible on clean data.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkgraft.ops.dq import DQGateError, require_finite


def _events(spark, values):
    return spark.createDataFrame(
        [(i, "click", v) for i, v in enumerate(values)],
        "event_id long, event_type string, value double",
    )


def test_gate_passes_clean_batch_unchanged(spark):
    df = _events(spark, [1.0, -2.5, None, 0.0])
    out = require_finite(df, "value")
    assert out is df  # passthrough, not a rewrapped plan
    assert out.count() == 4


def test_gate_fails_closed_on_nan_and_inf(spark):
    for bad in (float("nan"), float("inf"), float("-inf")):
        df = _events(spark, [1.0, bad, 3.0])
        with pytest.raises(DQGateError) as exc:
            require_finite(df, "value", "events_value_finite")
        assert "events_value_finite" in str(exc.value)
        assert "1 nonfinite" in str(exc.value)


def test_gate_null_is_not_a_violation(spark):
    # declared domain is "finite where present" — NULLs pass the gate
    require_finite(_events(spark, [None, None]), "value")


def test_gated_lane_aborts_before_the_rollup_runs(spark, sf_dir, tmp_path):
    """End-to-end pin of the gate-then-process shape: the registry lane on
    a POISONED copy of events must raise DQGateError during lane
    CONSTRUCTION — i.e. before any action on the rollup is ever taken —
    not surface a mid-job ANSI error from inside the aggregate."""
    from sparkgraft.io.readers import read_table
    from sparkgraft.registry import queries

    poisoned_dir = str(tmp_path / "sfpoison")
    ev = read_table(spark, sf_dir, "events")
    ev.withColumn(
        "value",
        F.when(F.col("event_id") % 997 == 0, F.lit(float("nan"))).otherwise(
            F.col("value")
        ),
    ).write.parquet(f"{poisoned_dir}/events.parquet")

    with pytest.raises(DQGateError):
        queries()["dq_gated_value_rollup"](spark, poisoned_dir)


def test_gated_lane_matches_math_on_clean_data(spark, sf_dir):
    """On clean data the gate is invisible: the lane runs and every sum is
    finite (the oracle hash-match is pinned by test_registry_parity)."""
    from sparkgraft.registry import queries

    rows = queries()["dq_gated_value_rollup"](spark, sf_dir).collect()
    assert rows
    assert all(
        r.sum_value is None or math.isfinite(r.sum_value) for r in rows
    )
