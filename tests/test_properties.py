"""Property-based sessionization checks: the Spark operator must agree
with a trivial sequential Python reference on arbitrary generated event
streams, and structural invariants must hold (every event sessioned, no
intra-session gap >= 300 s, session count == gap-start count)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkgraft.ops.sessionize import sessionize

T0 = datetime(2024, 1, 1)
GAP = 300


def _reference_sessions(rows):
    """Sequential per-user reference: returns {event_idx: session_group}."""
    by_user: dict[int, list[tuple[datetime, int]]] = {}
    for idx, (user, ts) in enumerate(rows):
        by_user.setdefault(user, []).append((ts, idx))
    out = {}
    for user, evs in by_user.items():
        evs.sort()
        group = None
        last = None
        for ts, idx in evs:
            if last is None or (ts - last).total_seconds() >= GAP:
                group = (user, ts)
            last = ts
            out[idx] = group
    return out


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),            # user
        st.integers(min_value=0, max_value=3600),         # offset seconds
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_sessionize_matches_sequential_reference(spark_global, raw):
    spark = spark_global
    rows = [(u, T0 + timedelta(seconds=s)) for u, s in raw]
    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r.event_id: r.session_id
        for r in sessionize(df, order_tiebreak=("event_id",)).collect()
    }
    ref = _reference_sessions(rows)
    # same partition of events into sessions
    by_sid: dict[str, set] = {}
    for idx, sid in got.items():
        by_sid.setdefault(sid, set()).add(idx)
    by_ref: dict[tuple, set] = {}
    for idx, g in ref.items():
        by_ref.setdefault(g, set()).add(idx)
    assert set(map(frozenset, by_sid.values())) == set(map(frozenset, by_ref.values()))


# hypothesis re-runs the test function many times; the session-scoped spark
# fixture can't be requested through @given, so bind it once here.
import pytest


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_wau_sketches_match_exact_within_tolerance(spark, sf_dir):
    """Weekly WAU from merged DAILY HLL sketches must land within 5% of
    the exact distinct count for every week — the mergeability contract
    that makes the incremental dashboard path usable."""
    from sparkgraft.io.readers import read_table
    from sparkgraft.queries.wau import user_wau, wau_from_sketches, wau_sketches_daily

    ev = read_table(spark, sf_dir, "events")
    exact = {r.event_week: r.wau for r in user_wau(ev).collect()}
    est = {
        r.event_week: r.wau_estimate
        for r in wau_from_sketches(wau_sketches_daily(ev)).collect()
    }
    assert set(est) == set(exact)
    for wk, n in exact.items():
        assert abs(est[wk] - n) <= max(2, 0.05 * n), (wk, n, est[wk])


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must be invisible: identical rows to the plain inner join,
    including a planted pathologically hot key."""
    from sparkgraft.io.readers import read_table
    from sparkgraft.ops.relational import salted_join

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    hot = spark.createDataFrame(
        [(10_000_000 + i, 424242) for i in range(500)], "event_id long, user_id long"
    )
    big = ev.union(hot)
    totals = big.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    salted = {
        (r.event_id, r.user_id, r.n_events)
        for r in salted_join(big, totals, "user_id", salt_source="event_id").collect()
    }
    plain = {
        (r.event_id, r.user_id, r.n_events)
        for r in big.join(totals, "user_id").collect()
    }
    assert salted == plain
    assert any(u == 424242 for _, u, _n in salted)


def test_salted_join_auto_flips_both_ways_and_is_result_invisible(spark, sf_dir):
    """salted_join_auto (round 9): on the uniform events table the measured
    hotness sits far below the crossover, so the PLAIN join plan must run
    (no __salt column anywhere — hard-coded salting is the measured
    0.76x/0.62x regression below the crossover); with a planted hot key
    and a threshold it clears, the salted plan must engage (__salt in the
    plan).  Both ways the rows are exactly the plain join's."""
    from sparkgraft.io.readers import read_table
    from sparkgraft.ops.relational import salted_join_auto

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    totals = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    plain = {
        (r.event_id, r.user_id, r.n_events)
        for r in ev.join(totals, "user_id").collect()
    }

    auto_cold = salted_join_auto(ev, totals, "user_id", salt_source="event_id")
    assert "__salt" not in auto_cold._jdf.queryExecution().executedPlan().toString()
    assert {
        (r.event_id, r.user_id, r.n_events) for r in auto_cold.collect()
    } == plain

    auto_hot = salted_join_auto(
        ev, totals, "user_id", salt_source="event_id", hot_rows=1
    )
    assert "__salt" in auto_hot._jdf.queryExecution().executedPlan().toString()
    assert {
        (r.event_id, r.user_id, r.n_events) for r in auto_hot.collect()
    } == plain


def test_salted_join_auto_consumes_cached_hotness(spark, sf_dir):
    """The per-epoch amortization: a cached (max, total) statistic must be
    honored without any measuring scan — passing a fabricated hot figure
    flips the plan even though the data is uniform, proving the statistic
    (not a hidden re-measure) drives the decision."""
    from sparkgraft.io.readers import read_table
    from sparkgraft.ops.relational import salted_join_auto

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    totals = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    forced = salted_join_auto(
        ev, totals, "user_id", salt_source="event_id",
        hot_rows=100, hotness=(10_000, 60_000),
    )
    assert "__salt" in forced._jdf.queryExecution().executedPlan().toString()


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """The documented 100 TB escape hatch (HyperLogLog++) must land within
    its advertised error of the exact distinct count."""
    from sparkgraft.io.readers import read_table
    from sparkgraft.queries.wau import user_wau

    ev = read_table(spark, sf_dir, "events")
    exact = {str(r.event_week): r.wau for r in user_wau(ev).collect()}
    approx = {str(r.event_week): r.wau for r in user_wau(ev, approx=True).collect()}
    assert set(exact) == set(approx)
    for wk, n in exact.items():
        assert abs(approx[wk] - n) <= max(2, 0.05 * n), (wk, n, approx[wk])


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_skew_split_equals_plain_sessionize(spark_global, raw):
    """sessionize_skew_split must emit BYTE-IDENTICAL session ids to plain
    sessionize on arbitrary streams, with buckets small enough (600 s over a
    3600 s horizon) that cross-bucket stitching is exercised constantly."""
    from sparkgraft.ops.sessionize import sessionize_skew_split

    spark = spark_global
    df = spark.createDataFrame(
        [(i, u, T0 + timedelta(seconds=s)) for i, (u, s) in enumerate(raw)],
        "event_id long, user_id long, ts timestamp",
    )
    plain = {
        r.event_id: r.session_id
        for r in sessionize(df, order_tiebreak=("event_id",)).collect()
    }
    split = {
        r.event_id: r.session_id
        for r in sessionize_skew_split(
            df, order_tiebreak=("event_id",), bucket_seconds=600
        ).collect()
    }
    assert split == plain


corpus_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),           # source idx
        st.integers(min_value=1, max_value=30),          # token count
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=10, deadline=None)
@given(corpus_strategy)
def test_interleave_two_level_prefix_sum_property(spark_global, raw):
    """For ARBITRARY source-size shapes (including one giant source and
    empty cohorts), chunked-offset interleave must produce a dense
    1..N mix_rank permutation equal to the unchunked form, with the
    round-robin invariant (all of position p before any of p+1)."""
    from sparkgraft.ext.corpus import interleave_sources

    spark = spark_global
    df = spark.createDataFrame(
        [(i, f"s{s}") for i, (s, _) in enumerate(raw)],
        "doc_id long, source string",
    )
    tiny = {(r.doc_id, r.mix_rank) for r in interleave_sources(df, chunk=2).collect()}
    plain = {(r.doc_id, r.mix_rank) for r in interleave_sources(df).collect()}
    assert tiny == plain
    ranks = sorted(rk for _, rk in tiny)
    assert ranks == list(range(1, len(raw) + 1))


@settings(max_examples=10, deadline=None)
@given(corpus_strategy)
def test_pack_presplit_property(spark_global, raw):
    """For ARBITRARY doc/token shapes, presplit packing must equal the
    single-window form bit-for-bit, and bins must respect the greedy
    entry-offset bound."""
    from sparkgraft.ext.corpus import pack_sequences

    spark = spark_global
    df = spark.createDataFrame(
        [(i, f"s{s}", "w " * n) for i, (s, n) in enumerate(raw)],
        "doc_id long, source string, text string",
    )
    split = {
        (r.source, r.doc_id, r.seq_id)
        for r in pack_sequences(df, capacity=16, presplit_chunk=3).collect()
    }
    plain = {
        (r.source, r.doc_id, r.seq_id)
        for r in pack_sequences(df, capacity=16).collect()
    }
    assert split == plain


# ---------------------------------------------------------------------------
# Ordered funnel vs sequential reference
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("s1", "s2", "s3")


def _reference_funnel(rows):
    """Sequential per-user reference: step k completes at the earliest
    step-k event at-or-after step k-1's completion."""
    by_user: dict[int, list[tuple[datetime, str]]] = {}
    for user, ts, etype in rows:
        by_user.setdefault(user, []).append((ts, etype))
    out = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda e: e[0])
        times = []
        prev = None
        for step in FUNNEL_STEPS:
            t = min(
                (ts for ts, et in evs if et == step and (prev is None or ts >= prev)),
                default=None,
            )
            times.append(t)
            if t is None:
                break
            prev = t
        times += [None] * (len(FUNNEL_STEPS) - len(times))
        out[user] = tuple(times)
    return out


funnel_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),                    # user
        st.integers(min_value=0, max_value=20),                   # ts offset (ties likely)
        st.sampled_from(FUNNEL_STEPS + ("noise",)),               # event type
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None)
@given(funnel_strategy)
def test_ordered_funnel_matches_sequential_reference(spark_global, raw):
    from sparkgraft.ops.relational import ordered_funnel

    spark = spark_global
    rows = [(u, T0 + timedelta(seconds=s), et) for u, s, et in raw]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r.user_id: (r.t1, r.t2, r.t3)
        for r in ordered_funnel(df, FUNNEL_STEPS).collect()
    }
    assert got == _reference_funnel(rows)


# ---------------------------------------------------------------------------
# Two-level exact rank vs the naive single-task window
# ---------------------------------------------------------------------------

rank_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # low-card group key
        st.integers(min_value=-50, max_value=50),    # value (ties likely)
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(rank_rows_strategy)
def test_scalable_row_number_equals_naive_window(spark_global, raw):
    """For ARBITRARY group/value shapes (ties, empty groups, single-row
    groups), the two-level range-chunked rank must equal
    row_number() OVER (PARTITION BY grp ORDER BY value, id) bit-for-bit,
    at chunk counts from degenerate (1) to overkill (7)."""
    from pyspark.sql import Window

    from sparkgraft.ops.windows import scalable_row_number

    spark = spark_global
    df = spark.createDataFrame(
        [(i, f"g{g}", float(v)) for i, (g, v) in enumerate(raw)],
        "id long, grp string, value double",
    )
    w = Window.partitionBy("grp").orderBy("value", "id")
    naive = {
        (r.id, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w).cast("bigint")).collect()
    }
    for n_chunks in (1, 3, 7):
        two_level = {
            (r.id, r.rn)
            for r in scalable_row_number(
                df, ["grp"], ["value", "id"], "rn", n_chunks=n_chunks
            ).collect()
        }
        assert two_level == naive, f"n_chunks={n_chunks}"


digest_rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-(10**9), max_value=10**9)),
        # eighths: exact binary fractions whose *100 products land on
        # exact x.5 ties (odd q: q/8*100 = 12.5*q, e.g. 0.125 -> 12.5) —
        # quarters never did (25*q is always an integer), so this is the
        # one class where the two engines' round() tie-breaking is
        # actually exercised; even q still covers the .0/.25/.5-input
        # cases
        st.one_of(
            st.none(),
            st.integers(min_value=-8000, max_value=8000).map(lambda q: q / 8.0),
        ),
        st.one_of(st.none(), st.text(alphabet="ab|<NUL>", max_size=6)),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(digest_rows_strategy)
def test_table_digest_cross_engine_fuzz(spark_global, rows):
    """The table-fingerprint digest recipe (NULL-sentinel canonical render
    -> HASH64 -> count/decimal-sum/bit_xor) fuzzed across both engines on
    generated frames with NULLs in every column, negative values, exact
    .5 scaled-rounding ties, and pipe/sentinel-looking strings — the
    digest must agree bit-for-bit between Spark and DuckDB on every
    frame."""
    import tempfile

    import duckdb

    from pyspark.sql import functions as F

    spark = spark_global
    df = spark.createDataFrame(
        [(i, k, v, txt) for i, (k, v, txt) in enumerate(rows)],
        "rid long, k long, v double, s string",
    )
    with tempfile.TemporaryDirectory(prefix="sparkgraft_digfuzz_") as work:
        df.coalesce(1).write.parquet(f"{work}/t")
        canon_s = (
            "concat_ws('|', coalesce(CAST(rid AS STRING), '<NULL>'),"
            " coalesce(CAST(k AS STRING), '<NULL>'),"
            " coalesce(CAST(CAST(round(v * 100) AS BIGINT) AS STRING), '<NULL>'),"
            " coalesce(s, '<NULL>'))"
        )
        got = (
            spark.read.parquet(f"{work}/t")
            .select(
                F.expr(
                    f"CAST(conv(substr(md5({canon_s}), 1, 15), 16, 10) AS BIGINT)"
                ).alias("h")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("sm"),
                F.expr("bit_xor(h)").alias("xr"),
            )
            .collect()[0]
        )
        con = duckdb.connect()
        exp = con.execute(
            f"""
            WITH c AS (
              SELECT concat_ws('|', coalesce(CAST(rid AS VARCHAR), '<NULL>'),
                       coalesce(CAST(k AS VARCHAR), '<NULL>'),
                       coalesce(CAST(CAST(round(v * 100) AS BIGINT) AS VARCHAR), '<NULL>'),
                       coalesce(s, '<NULL>')) AS cs
              FROM '{work}/t/*.parquet'),
            h AS (SELECT CAST('0x' || substr(md5(cs), 1, 15) AS BIGINT) AS h FROM c)
            SELECT count(*), CAST(sum(CAST(h AS HUGEINT)) AS VARCHAR), bit_xor(h)
            FROM h
            """
        ).fetchone()
    assert (got["n"], got["sm"], got["xr"]) == exp, (rows, tuple(got), exp)
