"""Fail-closed data-quality gates — the consuming side of the IEEE-specials
policy (round 8: `dq_constraint_report`'s ``events_value_finite`` check
DETECTS a nonfinite value upstream; this module is what a pipeline runs to
ABORT on it before the expensive stage executes).

Production shape: the exact-decimal lanes declare a finite value domain.
Without a gate, a NaN/inf reaches them as a mid-job ANSI cast error —
correct but expensive (the failure fires deep inside a shuffle, after the
cluster has already paid the scan and most of the work, with a stack trace
pointing at a cast instead of the data).  ``require_finite`` moves the
failure to a single column-pruned, map-side-combined pre-pass: one scan of
one column, a one-row driver read, and a loud, data-shaped error message —
the same plan-statistic shape ``measure_hotness`` uses, at the same
at-scale cost (trivial next to the gated job's own shuffle).

The gate is deliberately a hard raise, not a filter: silently dropping
violating rows would change the gated job's results without anyone
deciding that (the round-8 nonfinite probe found exactly that class of
silent divergence).  A pipeline that WANTS quarantine semantics filters
explicitly and feeds the rejects to a dead-letter sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DQGateError(ValueError):
    """A data-quality gate failed closed: the batch violates a declared
    precondition and the gated job was NOT run."""


def require_finite(df: DataFrame, col: str, check_name: str | None = None) -> DataFrame:
    """Gate: fail closed if ``col`` holds any NaN/±inf, else return ``df``
    unchanged for the gated stage to consume.

    NULL is NOT a violation — the declared domain is "finite where
    present" (matching ``dq_constraint_report``'s ``events_value_finite``
    semantics); a NOT NULL constraint is a different gate.
    """
    n_bad = (
        df.agg(
            F.count(
                F.when(F.isnan(col) | (F.abs(F.col(col)) == F.lit(float("inf"))), 1)
            ).alias("n")
        ).first()["n"]
    )
    if n_bad:
        raise DQGateError(
            f"{check_name or f'{col}_finite'}: {n_bad} nonfinite value(s) in "
            f"column {col!r} — batch fails the declared finite-domain "
            f"precondition; gated job not run (quarantine the rows or fix "
            f"the producer, then re-submit)"
        )
    return df
