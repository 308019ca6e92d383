"""Count-min sketch (ext/sketch): the one-sided guarantee, mergeability,
partitioning-independence, and a forced-collision error check.

The audit lane's oracle proves value equality; these tests prove the
sketch PROPERTIES the lane's claims rest on — on real data and on
adversarial fixtures the corpus doesn't contain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkgraft.ext import sketch
from sparkgraft.io.readers import read_table


def test_one_sided_guarantee_on_events(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    audit = sketch.cm_estimate_audit(events, "user_id").collect()
    assert len(audit) > 0
    for r in audit:
        assert r["cm_est"] >= r["exact_cnt"], r
        assert r["err"] == r["cm_est"] - r["exact_cnt"]
        assert r["tight"] == (r["err"] == 0)


def test_grid_mass_invariant(spark, sf_dir):
    """Every hash row of the grid holds the full event mass exactly once."""
    events = read_table(spark, sf_dir, "events")
    total = events.count()
    rows = (
        sketch.cm_cells(events, "user_id")
        .groupBy("r")
        .agg(F.sum("mass").alias("m"))
        .collect()
    )
    assert {r["r"] for r in rows} == set(range(sketch.CM_DEPTH))
    assert all(r["m"] == total for r in rows)


def test_estimates_are_partitioning_independent(spark, sf_dir):
    """Cell masses are sums — the grid, and therefore every estimate, must
    not depend on how the build scan was partitioned."""
    events = read_table(spark, sf_dir, "events")
    a = sorted(
        map(tuple, sketch.cm_estimate_audit(events, "user_id").collect())
    )
    b = sorted(
        map(
            tuple,
            sketch.cm_estimate_audit(
                events.repartition(17, "event_type"), "user_id"
            ).collect(),
        )
    )
    assert a == b


def _py_bucket(key, r: int, width: int = sketch.CM_WIDTH) -> int:
    """Driver-side reference of the engine-portable bucket hash."""
    import hashlib

    h = hashlib.md5(f"cm{r}:{key}".encode()).hexdigest()
    return int(h[:15], 16) % width


def test_merge_equivalence_event_build_vs_counts_build(spark, sf_dir):
    """The oracle builds the grid from exact per-key counts; the engine
    builds it one pass over raw events.  They must be the same grid —
    this IS the mergeability property, pinned against an independent
    driver-side reference of the hash."""
    events = read_table(spark, sf_dir, "events")
    from_events = sorted(
        map(tuple, sketch.cm_cells(events, "user_id").collect())
    )
    built: dict[tuple[int, int], int] = {}
    for row in events.groupBy("user_id").count().collect():
        for r in range(sketch.CM_DEPTH):
            cell = (r, _py_bucket(row["user_id"], r))
            built[cell] = built.get(cell, 0) + row["count"]
    assert from_events == sorted((r, b, m) for (r, b), m in built.items())


def test_forced_collision_overestimates_and_min_recovers(spark):
    """A tiny width forces collisions: with w = 1 every key shares one
    cell per row, so every estimate is the TOTAL mass — the degenerate
    bound; err is exactly total - exact for every key."""
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 5 + ["b"] * 3 + ["c"] * 2], "key string"
    )
    audit = {
        r["key"]: r
        for r in sketch.cm_estimate_audit(df, "key", width=1).collect()
    }
    for k, exact in (("a", 5), ("b", 3), ("c", 2)):
        assert audit[k]["exact_cnt"] == exact
        assert audit[k]["cm_est"] == 10
        assert audit[k]["err"] == 10 - exact


def test_wide_grid_is_tight_on_small_keyspace(spark, sf_dir):
    """At sf0.001 the keyspace (~15 users) is far below w = 256: requiring
    a triple-row collision to produce error, every estimate should be
    exact.  (Not a guarantee in general — asserted here as a property of
    THIS corpus + hash, which the driver hash then freezes.)"""
    events = read_table(spark, sf_dir, "events")
    audit = sketch.cm_estimate_audit(events, "user_id").collect()
    if len(audit) <= 32:  # only claim this at the tiny scale
        assert all(r["tight"] for r in audit)


def test_join_size_estimate_one_sided_and_shaped(spark, sf_dir):
    from sparkgraft.io.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    rows = sketch.cm_join_size_estimate(
        orders, "o_custkey", customer, "c_custkey"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    exact = (
        orders.select(F.col("o_custkey").alias("k"))
        .join(customer.select(F.col("c_custkey").alias("k")), "k")
        .count()
    )
    assert r["exact_join_rows"] == exact
    assert r["cm_est"] >= exact and r["overestimate_ok"]
    assert r["err"] == r["cm_est"] - exact


def test_join_size_estimate_disjoint_keys_is_zero(spark):
    """No shared keys: the true join is empty, and with w=1 every bucket
    collides so the estimate is massA * massB — the worst-case collision
    bound; with the default width the estimate may be anything >= 0 but
    the exact side must read 0."""
    a = spark.createDataFrame([("x1",), ("x2",)], "k string")
    b = spark.createDataFrame([("y1",), ("y2",), ("y3",)], "k string")
    r = sketch.cm_join_size_estimate(a, "k", b, "k", width=1).collect()[0]
    assert r["exact_join_rows"] == 0
    assert r["cm_est"] == 2 * 3  # single shared cell: 2 * 3


def test_join_size_estimate_exact_on_identity_join(spark):
    """Each key once per side, wide grid: the inner product should
    recover the exact join size (no triple-row collisions on 3 keys)."""
    a = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    r = sketch.cm_join_size_estimate(a, "k", a, "k").collect()[0]
    assert r["exact_join_rows"] == 3
    assert r["cm_est"] == 3 and r["err"] == 0


def test_join_size_estimate_empty_side_yields_zero_row(spark):
    a = spark.createDataFrame([], "k string")
    b = spark.createDataFrame([("x",)], "k string")
    r = sketch.cm_join_size_estimate(a, "k", b, "k").collect()[0]
    assert (r["exact_join_rows"], r["cm_est"], r["err"]) == (0, 0, 0)
    assert r["overestimate_ok"]


def test_streaming_partials_merge_to_batch_grid(spark, sf_dir):
    """The streaming lane's whole claim: per-micro-batch partial grids
    SUM-merge to exactly the one-pass batch grid (cells are additive).
    Simulated here without the harness: split events three ways, build
    per-split grids, merge, compare to the batch build."""
    events = read_table(spark, sf_dir, "events")
    batch = {
        (r["r"], r["bucket"]): r["mass"]
        for r in sketch.cm_cells(events, "user_id").collect()
    }
    merged: dict[tuple[int, int], int] = {}
    for i in range(3):
        part = events.where(F.expr(f"pmod(event_id, 3) = {i}"))
        for r in sketch.cm_cells(part, "user_id").collect():
            cell = (r["r"], r["bucket"])
            merged[cell] = merged.get(cell, 0) + r["mass"]
    assert merged == batch


# ---------------------------------------------------------------------------
# from-scratch HyperLogLog
# ---------------------------------------------------------------------------


def _py_hll_registers(keys) -> dict[int, int]:
    """Independent reference register file (pure Python md5)."""
    import hashlib

    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:15], 16)
        reg, v = h % sketch.HLL_M, h // sketch.HLL_M
        rho = 52 if v == 0 else 53 - v.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_register_file_matches_reference(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    got = {
        r["reg"]: r["m"]
        for r in sketch.hll_registers(events, "event_id").collect()
    }
    keys = [r["event_id"] for r in events.select("event_id").collect()]
    assert got == _py_hll_registers(keys)


def test_hll_rho_is_exact_leading_zero_rank(spark):
    """bin()-length rank == bit_length rank on the field boundaries."""
    rows = spark.sql(
        "SELECT v, " + sketch._HLL_RHO_SQL.format(v="v") + " AS rho "
        "FROM VALUES (0L), (1L), (2L), (3L), (4L), "
        f"({(1 << 52) - 1}L) AS t(v)"
    ).collect()
    expect = {0: 52, 1: 52, 2: 51, 3: 51, 4: 50, (1 << 52) - 1: 1}
    assert {r["v"]: r["rho"] for r in rows} == expect


def test_hll_registers_merge_losslessly(spark, sf_dir):
    """max commutes: per-split register files fold to the whole-corpus
    file — the mergeability the streaming/partition story rests on."""
    events = read_table(spark, sf_dir, "events")
    whole = {
        r["reg"]: r["m"]
        for r in sketch.hll_registers(events, "event_id").collect()
    }
    merged: dict[int, int] = {}
    for i in range(3):
        part = events.where(F.expr(f"pmod(event_id, 3) = {i}"))
        for r in sketch.hll_registers(part, "event_id").collect():
            merged[r["reg"]] = max(merged.get(r["reg"], 0), r["m"])
    assert merged == whole


def test_hll_estimate_within_three_sigma(spark, sf_dir):
    """1.04/sqrt(256) ~ 6.5% standard error; assert 3 sigma on real data
    (n >= 2.5m at every provided scale for event_id)."""
    events = read_table(spark, sf_dir, "events")
    row = sketch.hll_estimate_audit(events, "event_id").collect()[0]
    n, est = row["n_exact"], row["hll_estimate"]
    assert n >= 2.5 * sketch.HLL_M
    assert abs(est - n) / n < 3 * 1.04 / (sketch.HLL_M ** 0.5), (n, est)


def test_hll_empty_input_is_defined_zero(spark):
    df = spark.createDataFrame([], "event_id long")
    row = sketch.hll_estimate_audit(df, "event_id").collect()[0]
    assert (row["n_exact"], row["registers_used"], row["hll_estimate"]) == (
        0,
        0,
        0.0,
    )
    assert row["sum_scaled"] == sketch.HLL_M * (1 << 52)


def test_hll_lc_table_is_m_ln_m_over_v():
    """The pinned lookup IS m*ln(m/V) — and the final entry (V = m,
    empty input) is exactly 0.0, consistent with the estimate-0 empty
    contract."""
    import math

    m = sketch.HLL_M
    assert len(sketch.HLL_LC_TABLE) == m
    for v in (1, 2, 54, 128, 255):
        assert sketch.HLL_LC_TABLE[v - 1] == m * math.log(m / v)
    assert sketch.HLL_LC_TABLE[m - 1] == 0.0


def test_hll_lc_small_cardinality_accuracy(spark):
    """Linear counting fixes the raw estimator's small-n failure: at
    n = 10 the LC branch must fire and land within 10%, where the raw
    harmonic estimate is far off."""
    df = spark.range(1000).select((F.col("id") % 10).alias("k"))
    row = sketch.hll_lc_estimate_audit(df, "k", "p").collect()[0]
    assert row["used_linear"]
    assert abs(row["hll_estimate"] - 10) / 10 < 0.10
    assert row["hll_estimate"] == row["linear_estimate"]


def test_hll_lc_raw_branch_above_threshold(spark):
    """At n >> 2.5m the raw branch must be selected and match the
    raw-only audit exactly."""
    df = spark.range(5000).select(F.col("id").alias("k"))
    row = sketch.hll_lc_estimate_audit(df, "k", "p").collect()[0]
    raw_row = sketch.hll_estimate_audit(df, "k").collect()[0]
    assert not row["used_linear"]
    assert row["hll_estimate"] == raw_row["hll_estimate"]
    assert row["raw_estimate"] == raw_row["hll_estimate"]


def test_hll_lc_empty_input_is_defined_zero(spark):
    df = spark.createDataFrame([], "k long")
    row = sketch.hll_lc_estimate_audit(df, "k", "p").collect()[0]
    assert (row["n_exact"], row["registers_used"], row["hll_estimate"]) == (
        0,
        0,
        0.0,
    )
    assert row["empty_registers"] == sketch.HLL_M
    # V = m looks up ln(1) = 0.0 — the two definitions agree
    assert row["linear_estimate"] == 0.0
    assert not row["used_linear"]


def test_hll_lc_audit_from_registers_equals_fresh_scan(spark, sf_dir):
    """The given-register-file path (the streaming lane's tail) must be
    value-identical to the fresh-scan path when fed the same file."""
    events = read_table(spark, sf_dir, "events")
    regs = [
        (r["reg"], r["m"])
        for r in sketch.hll_registers(events, "user_id").collect()
    ]
    via_regs = sketch.hll_lc_audit_against_registers(
        events, "user_id", "p", regs
    ).collect()[0]
    fresh = sketch.hll_lc_estimate_audit(events, "user_id", "p").collect()[0]
    assert via_regs == fresh


def test_hll_lc_audit_from_registers_rejects_duplicates(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="duplicate register"):
        sketch.hll_lc_audit_against_registers(
            df, "k", "p", [(3, 1), (3, 2)]
        ).collect()


def test_hll_lc_oracle_literals_roundtrip_to_identical_doubles():
    """The DuckDB-side e-notation literals must parse back to the exact
    doubles the Spark plan carries (the 1-ULP DECIMAL trap)."""
    import duckdb

    sql = sketch.hll_lc_oracle_sql("t", "k", "p")
    lut = sql[sql.index("[") : sql.index("]") + 1]
    got = duckdb.sql(f"SELECT {lut} AS l").fetchone()[0]
    assert list(got) == list(sketch.HLL_LC_TABLE)


def test_sketch_artifacts_json_roundtrip_via_stats_sidecar(spark, sf_dir, tmp_path):
    """The cache lane's load-bearing assumption: a CM grid (list of int
    lists) and an HLL register file (sorted [reg, m] int pairs) survive
    the catalog stats sidecar's JSON round-trip EXACTLY — so cached ==
    fresh is equality of values, not approximately-equal floats."""
    from sparkgraft import catalog

    events = read_table(spark, sf_dir, "events")
    table = f"{sf_dir}/events.parquet"
    store = str(tmp_path / "store")

    grid = [[0] * sketch.CM_WIDTH for _ in range(sketch.CM_DEPTH)]
    for row in sketch.cm_cells(events, "user_id").collect():
        grid[row["r"]][row["bucket"]] = row["mass"]
    regs = sorted(
        [r["reg"], r["m"]]
        for r in sketch.hll_registers(events, "event_id").collect()
    )

    g1, hit1 = catalog.cached_index(
        table, "cm_grid", {"d": 3, "w": 256}, lambda: grid, store=store
    )
    g2, hit2 = catalog.cached_index(
        table, "cm_grid", {"d": 3, "w": 256},
        lambda: (_ for _ in ()).throw(AssertionError("rebuilt")),
        store=store,
    )
    assert (hit1, hit2) == (False, True)
    assert g1 == grid and g2 == grid  # lossless through JSON

    r1, _ = catalog.cached_index(
        table, "hll_registers", {"p": 8}, lambda: regs, store=store
    )
    r2, hit = catalog.cached_index(
        table, "hll_registers", {"p": 8},
        lambda: (_ for _ in ()).throw(AssertionError("rebuilt")),
        store=store,
    )
    assert hit and r1 == regs and r2 == regs
    # and the cached grid drives the identical audit relation
    a = sorted(map(tuple, sketch.audit_against_grid(events, "user_id", g2).collect()))
    b = sorted(map(tuple, sketch.cm_estimate_audit(events, "user_id").collect()))
    assert a == b


def test_combined_stats_build_bit_identical_to_separate(spark, sf_dir):
    """The one-scan combined build (r11 verdict item #7: the multi-probe
    single-scan fold promoted to the per-epoch stats path) must produce
    the EXACT artifacts the two separate builders produce — COUNT and MAX
    are partition-order-free, the hashes are shared, so any divergence is
    a bug, not noise."""
    from sparkgraft.io.readers import read_table

    events = read_table(spark, sf_dir, "events")
    grid = [[0] * sketch.CM_WIDTH for _ in range(sketch.CM_DEPTH)]
    for row in sketch.cm_cells(events, "user_id").collect():
        grid[row["r"]][row["bucket"]] = row["mass"]
    regs = sorted(
        [row["reg"], row["m"]]
        for row in sketch.hll_registers(events, "event_id").collect()
    )
    g2, r2 = sketch.combined_stats_build(events, "user_id", "event_id")
    assert g2 == grid
    assert r2 == regs


def test_combined_stats_build_is_one_job_two_artifacts(spark):
    """Both artifacts come back from a single collect: empty input yields
    the all-zero grid and an empty register file (defined, not an
    error)."""
    empty = spark.createDataFrame([], "user_id bigint, event_id bigint")
    grid, regs = sketch.combined_stats_build(empty, "user_id", "event_id")
    assert grid == [[0] * sketch.CM_WIDTH for _ in range(sketch.CM_DEPTH)]
    assert regs == []


def test_cm_audit_keyed_grid_bit_identical_to_raw_build(spark, sf_dir):
    """r13 one-scan reshape: counting is linear, so folding per-key exact
    counts into (r, bucket) cells must reproduce the raw-row cm_cells
    grid EXACTLY — and the audit relation built from the keyed grid must
    equal the one built from a raw-row grid."""
    from pyspark.sql import functions as F

    from sparkgraft.io.readers import read_table

    events = read_table(spark, sf_dir, "events")
    raw_grid = [[0] * sketch.CM_WIDTH for _ in range(sketch.CM_DEPTH)]
    for row in sketch.cm_cells(events, "user_id").collect():
        raw_grid[row["r"]][row["bucket"]] = row["mass"]
    audited = sketch.cm_estimate_audit(events, "user_id")
    # re-derive the grid the one-scan path used from its own output: every
    # key's cm_est must equal the min over raw_grid rows at its buckets —
    # i.e. the audited relation is exactly what the raw grid predicts
    expect = sketch.audit_against_grid(events, "user_id", raw_grid)
    a = sorted(map(tuple, audited.collect()))
    b = sorted(map(tuple, expect.collect()))
    assert a == b
    # and the one-sided guarantee holds row-wise
    assert audited.where(F.col("err") < 0).count() == 0
