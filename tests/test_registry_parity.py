"""Every registry query must hash-match its DuckDB oracle (driver replica).

This is the same gate the driver applies (CORRECTNESS_r{N}.json) run at
sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import pytest

from sparkgraft import registry
from tests.oracle import assert_parity, run_oracle

NAMES = sorted(registry.queries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = registry.queries()[name]
    sdf = fn(spark, sf_dir)
    oracle = registry.oracles().get(name)
    if oracle is None:
        # rows-only contract: must execute and return a stable schema
        assert sdf.count() >= 0
        return
    assert_parity(sdf, run_oracle(oracle, sf_dir))


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"event_week", "wau"}


def test_registry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10


def test_driver_window_composition():
    """The correctness driver snapshots only the FIRST 50 registered queries;
    registration order is a curated artifact (round-2 verdict: two front
    inserts silently evicted driver-proven queries).  Pin the round-3 window:
    the first 50 names must be exactly DRIVER_WINDOW, in order, so that
    r01+r02+r03 driver rows jointly cover every registered query."""
    names = list(registry.queries())
    assert tuple(names[:50]) == registry.DRIVER_WINDOW
    assert len(set(registry.DRIVER_WINDOW)) == 50
