"""Query registry: every implemented operator as a (Spark callable, oracle
SQL) pair — the driver-contract surface behind ``__spark_entry__.py``.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame; each
oracle is ANSI SQL DuckDB runs over the same parquet tables. Column names
are aliased identically on both sides (the driver's compare sorts columns by
name before hashing). Floating-point aggregates use exact decimal internals
(ops/relational.exact_sum) on the Spark side and the literally-equivalent
``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)`` in the oracle, so value
hashes are bit-stable regardless of partitioning / shuffle order.

Registry sections map to SURVEY.md §2 rows (cited per query).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from sparkgraft.io.readers import read_table
from sparkgraft.ops.relational import left_join, top_k, union_all
from sparkgraft.ops.sessionize import sessionize
from sparkgraft.ops.temporal import local_date
from sparkgraft.ops.windows import forward_fill, lag_over, partition_max
from sparkgraft.queries import tpch, wau

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference-parity: WAU queries (SURVEY §2.4 A1/A2, §2.8 F5, §2.6 O1)
# ---------------------------------------------------------------------------

@register(
    "wau_user",
    """
    SELECT CAST(date_trunc('week', ts) AS DATE) AS event_week,
           count(DISTINCT user_id) AS wau
    FROM events
    GROUP BY event_week
    ORDER BY event_week
    """,
)
def q_wau_user(spark, sf_dir):
    return wau.user_wau(_t(spark, sf_dir, "events"))


_SESSIONIZE_CTE = """
    WITH lagged AS (
        SELECT event_id, user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT event_id, user_id, ts,
               (prev_ts IS NULL OR ts >= prev_ts + INTERVAL 300 SECOND) AS is_new
        FROM lagged
    ), sessioned AS (
        SELECT event_id, user_id, ts,
               sha256(CAST(user_id AS VARCHAR) || '#' ||
                      CAST(epoch_us(max(CASE WHEN is_new THEN ts END) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS VARCHAR)
               ) AS session_id
        FROM flagged
    )
"""


@register(
    "sessionize_ids",
    _SESSIONIZE_CTE
    + """
    SELECT event_id, user_id, ts, session_id FROM sessioned
    """,
)
def q_sessionize_ids(spark, sf_dir):
    """5-min-gap sessionization with deterministic ids (SURVEY §2.11)."""
    ev = _t(spark, sf_dir, "events")
    return sessionize(ev, order_tiebreak=("event_id",)).select(
        "event_id", "user_id", "ts", "session_id"
    )


@register(
    "wau_session",
    _SESSIONIZE_CTE
    + """
    SELECT CAST(date_trunc('week', ts) AS DATE) AS event_week,
           count(DISTINCT session_id) AS wau
    FROM sessioned
    GROUP BY event_week
    ORDER BY event_week
    """,
)
def q_wau_session(spark, sf_dir):
    return wau.session_wau(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Filters / predicates / projections (SURVEY §2.2 P4-P13, §2.8 F2-F6)
# ---------------------------------------------------------------------------

@register(
    "filter_time_range",
    """
    SELECT event_id, user_id, ts, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'
      AND event_type IN ('purchase', 'cart')
    """,
)
def q_filter_time_range(spark, sf_dir):
    """P7: range predicate on the time column (partition-prunable shape)."""
    ev = _t(spark, sf_dir, "events")
    return ev.where(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz"))
        & F.col("event_type").isin("purchase", "cart")
    ).select("event_id", "user_id", "ts", "event_type", "value")


@register(
    "filter_edge_slivers",
    """
    SELECT event_id, user_id, ts, event_type
    FROM events
    WHERE (ts >= TIMESTAMP '2024-01-07' AND ts < TIMESTAMP '2024-01-07 09:00:00')
       OR (ts >= TIMESTAMP '2024-01-20 15:00:00' AND ts < TIMESTAMP '2024-01-21')
    """,
)
def q_filter_edge_slivers(spark, sf_dir):
    """P8: OR-of-ANDs selecting timezone-edge slivers (reference
    UserActivityHiveConnector.scala:31-40 shape)."""
    ev = _t(spark, sf_dir, "events")
    a = (F.col("ts") >= F.lit("2024-01-07").cast("timestamp_ntz")) & (
        F.col("ts") < F.lit("2024-01-07 09:00:00").cast("timestamp_ntz")
    )
    b = (F.col("ts") >= F.lit("2024-01-20 15:00:00").cast("timestamp_ntz")) & (
        F.col("ts") < F.lit("2024-01-21").cast("timestamp_ntz")
    )
    return ev.where(a | b).select("event_id", "user_id", "ts", "event_type")


@register(
    "case_when_buckets",
    """
    SELECT event_type,
           CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def q_case_when_buckets(spark, sf_dir):
    """P11/P12: conditional expression + literals."""
    ev = _t(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return (
        ev.select("event_type", bucket)
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


@register(
    "kst_daily_counts",
    """
    SELECT CAST(ts + INTERVAL 9 HOUR AS DATE) AS event_date_kst,
           count(*) AS n_events
    FROM events
    GROUP BY event_date_kst
    ORDER BY event_date_kst
    """,
)
def q_kst_daily_counts(spark, sf_dir):
    """F2+F3: UTC->KST calendar bucketing (the reference's partition key,
    DataLoadTransformer.scala:48-49). KST is UTC+9 with no DST, so the
    oracle may state the shift as a constant interval."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(local_date("ts").alias("event_date_kst"))
        .groupBy("event_date_kst")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_date_kst")
    )


@register(
    "json_extract_props",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_json_extract_props(spark, sf_dir):
    """Scalar-function surface: JSON field extraction from the props column."""
    ev = _t(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "purchase").select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.5 W1-W3 + §2.2 P6)
# ---------------------------------------------------------------------------

@register(
    "lag_gap_seconds",
    """
    SELECT event_id, user_id, ts,
           epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
    FROM events
    """,
)
def q_lag_gap_seconds(spark, sf_dir):
    """W1: per-user previous-event gap (the sessionization primitive)."""
    ev = _t(spark, sf_dir, "events")
    prev = lag_over("ts", ["user_id"], ["ts", "event_id"])
    gap = (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(prev.cast("timestamp"))).alias(
        "gap_us"
    )
    return ev.select("event_id", "user_id", "ts", gap)


@register(
    "forward_fill_last_purchase",
    """
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_value
    FROM events
    """,
)
def q_forward_fill(spark, sf_dir):
    """W2: running last-non-null (the reference's session-id forward fill)."""
    ev = _t(spark, sf_dir, "events")
    marker = F.when(F.col("event_type") == "purchase", F.col("value"))
    filled = forward_fill(marker, ["user_id"], ["ts", "event_id"]).alias(
        "last_purchase_value"
    )
    return ev.select("event_id", "user_id", "ts", filled)


@register(
    "latest_event_per_user",
    """
    SELECT user_id, ts, event_type, value
    FROM (SELECT user_id, ts, event_type, value,
                 max(ts) OVER (PARTITION BY user_id) AS max_ts
          FROM events)
    WHERE ts = max_ts
    """,
)
def q_latest_event_per_user(spark, sf_dir):
    """W3+P6: whole-partition max + col=col filter (reference
    DataLoadTransformer.scala:122-126)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("__max_ts", partition_max("ts", ["user_id"]))
        .where(F.col("ts") == F.col("__max_ts"))
        .select("user_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Joins / set ops (SURVEY §2.3 J1, §2.7 U1-U2)
# ---------------------------------------------------------------------------

@register(
    "left_join_orders_customers",
    """
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders
    LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') b
           ON o_custkey = c_custkey
    """,
)
def q_left_join(spark, sf_dir):
    """J1: left outer equi-join with a small (broadcast) build side."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    joined = left_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey",
        broadcast_right=True,
    )
    return joined.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@register(
    "union_names",
    """
    SELECT r_name AS name, 'region' AS kind FROM region
    UNION ALL
    SELECT n_name AS name, 'nation' AS kind FROM nation
    """,
)
def q_union_names(spark, sf_dir):
    """U1/U2: positional bag-semantics union."""
    region = _t(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.lit("region").alias("kind")
    )
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.lit("nation").alias("kind")
    )
    return union_all([region, nation])


# ---------------------------------------------------------------------------
# TPC-H-style analytics (general agg/join surface at bench scale)
# ---------------------------------------------------------------------------

_DEC_SUM = "CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_DEC_SUM.format(expr='l_quantity')} AS sum_qty,
           {_DEC_SUM.format(expr='l_extendedprice')} AS sum_base_price,
           {_DEC_SUM.format(expr='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_DEC_SUM.format(expr='(l_extendedprice * (1 - l_discount)) * (1 + l_tax)')} AS sum_charge,
           {_DEC_SUM.format(expr='l_quantity')} / count(l_quantity) AS avg_qty,
           {_DEC_SUM.format(expr='l_extendedprice')} / count(l_extendedprice) AS avg_price,
           {_DEC_SUM.format(expr='l_discount')} / count(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2000-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_q1(spark, sf_dir):
    return tpch.q1_pricing_summary(_t(spark, sf_dir, "lineitem"))


@register(
    "q3_shipping_priority",
    f"""
    SELECT o_orderkey,
           {_DEC_SUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_q3(spark, sf_dir):
    return tpch.q3_shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, {_DEC_SUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_q5(spark, sf_dir):
    return tpch.q5_local_supplier_volume(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "rollup_order_counts",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_rollup(spark, sf_dir):
    """Grouping-sets surface (rollup to subtotal + grand-total levels)."""
    return tpch.rollup_order_counts(_t(spark, sf_dir, "lineitem"))


@register(
    "top_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_top_orders(spark, sf_dir):
    return tpch.top_orders(_t(spark, sf_dir, "orders"))


@register(
    "sessions_per_user_window",
    _SESSIONIZE_CTE
    + """
    SELECT user_id, count(DISTINCT session_id) AS n_sessions
    FROM sessioned
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_sessions_per_user_window(spark, sf_dir):
    """Spark's native session_window aggregation as a second, independent
    implementation of the 5-min-gap semantics (the streaming-ready form:
    the same groupBy works under readStream + watermark). Oracle-checked
    against the window-function sessionization — the two formulations must
    agree exactly."""
    ev = _t(spark, sf_dir, "events")
    per_session = ev.groupBy(
        F.session_window("ts", "5 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_session.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("user_id")
    )


@register(
    "streaming_stateful_sessionize",
    _SESSIONIZE_CTE
    + """
    SELECT user_id, ts, session_id FROM sessioned
    """,
)
def q_streaming_stateful_sessionize(spark, sf_dir):
    """The custom stateful streaming operator (applyInPandasWithState) run
    over the events table as a one-shot stream (availableNow) — its
    per-event session ids must match the batch window-function
    sessionization bit-for-bit, so even the streaming path is
    oracle-checked."""
    import tempfile

    from sparkgraft.streaming.sessions import stateful_sessionize

    import os

    work = tempfile.mkdtemp(prefix="sparkgraft_stream_")
    ckpt, out, src = f"{work}/ckpt", f"{work}/out", f"{work}/src"
    # the streaming file source wants a directory — link the single file in
    os.makedirs(src)
    os.symlink(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
    # stream sees the raw footer schema (ts = INT64 nanos under
    # nanosAsLong); convert to timestamp in-stream like the batch reader.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    q = (
        stateful_sessionize(stream)
        .writeStream.foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out).select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "session_id"
    )


# extension operators (dedup / simsearch / text / multimodal) register on
# import — keep at the bottom so `register` exists first.
from sparkgraft import registry_ext  # noqa: E402,F401  (registration side effect)
