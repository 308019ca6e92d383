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
    inserts silently evicted driver-proven queries).  Pin the round-4 window:
    the first 50 names must be exactly DRIVER_WINDOW, in order.  Queries
    registered AFTER this freeze fall outside the window by design — they are
    the round-5 rotation — so this test does NOT claim full cumulative
    coverage; test_driver_rows_cumulative_coverage computes that claim from
    the actual CORRECTNESS_r* files instead of asserting it in prose."""
    names = list(registry.queries())
    assert tuple(names[:50]) == registry.DRIVER_WINDOW
    assert len(set(registry.DRIVER_WINDOW)) == 50


def test_driver_rows_cumulative_coverage():
    """Every query present at the r04 window freeze must have a driver row
    in r01..r03 or sit in the r04 window awaiting one.  Queries added after
    the freeze are exempt (next round's rotation) but must be listed here
    EXPLICITLY so the exemption is a conscious act, not a silent hole."""
    import json
    import pathlib

    added_after_r04_freeze: set[str] = {
        "value_median_exact",
        "streaming_session_window",
        "text_bigram_lm_score",
        "embed_knn_graph",
        "text_gopher_repetition",
        "dedup_keep_canonical",
        "udtf_split_sentences",
        # round-4 session additions (this round's build, next round's rotation)
        "embed_kmeans_clusters",
        "text_quality_classifier",
        "corpus_source_datacard",
        "corpus_chunk_overlap",
        "corpus_dup_span_fraction",
        "embed_arrow_norms",
        "events_variant_k_stats",
        "streaming_state_inspect",
        "corpus_shard_assign",
        "text_langid_confusion",
        "custom_stream_jsonl_counts",
        "scd2_point_in_time_lookup",
        "recursive_cte_hierarchy",
        "sql_udf_value_buckets",
        "collation_distinct_audit",
        "corpus_vocab_growth",
        "embed_pca_projection",
        "table_fingerprint",
        "skew_key_audit",
        "time_weighted_avg_value",
        "column_profile_lineitem",
        "corpus_temperature_mix",
        "ewma_user_value",
        "snapshot_diff_orders",
        "zorder_layout_audit",
        "bitmap_distinct_rollup",
        "user_value_trend",
        "graph_triangle_count",
        "embed_pq_topk",
        "streaming_bitmap_distinct",
        "dedup_incremental_minhash",
        "orc_roundtrip_events",
        "value_mad_outliers",
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
        and n not in added_after_r04_freeze
    ]
    assert not uncovered, f"queries with no driver row and no window slot: {uncovered}"
