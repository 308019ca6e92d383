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
    inserts silently evicted driver-proven queries).  Pin the round-5 window:
    the first 50 names must be exactly DRIVER_WINDOW, in order.  Queries
    registered AFTER this freeze fall outside the window by design — they are
    the round-6 rotation — so this test does NOT claim full cumulative
    coverage; test_driver_rows_cumulative_coverage computes that claim from
    the actual CORRECTNESS_r* files instead of asserting it in prose."""
    names = list(registry.queries())
    assert tuple(names[:50]) == registry.DRIVER_WINDOW
    assert len(set(registry.DRIVER_WINDOW)) == 50


def test_driver_rows_cumulative_coverage():
    """Every query present at the r05 window freeze must have a driver row
    in r01..r04 or sit in the r05 window awaiting one — at this freeze the
    set is EMPTY-gap by construction: r01∪…∪r04 rows plus the r05 window
    cover all 183 registered queries.  Queries added after the freeze are
    exempt (next round's rotation) but must be listed here EXPLICITLY so
    the exemption is a conscious act, not a silent hole."""
    import json
    import pathlib

    added_after_r05_freeze: set[str] = {
        # round-5 session addition (next round's rotation)
        "bucketed_join_zero_shuffle",
    }

    root = pathlib.Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        seen |= set(json.loads(f.read_text()))
    uncovered = [
        n
        for n in registry.queries()
        if n not in seen
        and n not in registry.DRIVER_WINDOW
        and n not in added_after_r05_freeze
    ]
    assert not uncovered, f"queries with no driver row and no window slot: {uncovered}"


def test_driver_window_drains_the_backlog():
    """Round-5 window audit: (a) every registered query either has a prior
    driver row or a slot in THIS window (no orphans), and (b) every window
    slot that re-proves an already-proven query is one of the 8 declared
    sentinels (no wasted slots).  `seen` is pinned to the rounds BEFORE
    this window froze (r01-r04): once the driver emits CORRECTNESS_r05
    for the window itself, an open glob would reclassify all 50 slots as
    re-proofs and fail this test for succeeding."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r0[1-4].json")):
        seen |= set(json.loads(f.read_text()))
    sentinels = {
        "wau_user",
        "sessionize_ids",
        "dedup_minhash_lsh",
        "cumulative_purchases",
        "value_decile_bins",
        "window_rank_zoo",
        "q1_pricing_summary",
        "corpus_e2e_curation",
    }
    reproofs = [n for n in registry.DRIVER_WINDOW if n in seen]
    # the two ml twins have r03 rows, but those were rows-only `no_oracle`
    # entries — their window slots are first HASH proofs, not re-proofs
    assert set(reproofs) == sentinels | {"ml_minhash_pairs", "ml_ann_neighbors"}
    post_freeze = {"bucketed_join_zero_shuffle"}
    never = [n for n in registry.queries() if n not in seen and n not in post_freeze]
    assert set(never) <= set(registry.DRIVER_WINDOW)
