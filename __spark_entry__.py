"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``sparkgraft.registry`` — the engine's query registry holds
every implemented operator as a (Spark callable, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: sessionize the events
    stream (5-min gap, deterministic ids) and compute session-based WAU —
    the reference's signature pipeline end-to-end."""
    from sparkgraft.io.readers import read_table
    from sparkgraft.queries.wau import session_wau

    events = read_table(spark, "/root/testdata/sf0.001", "events")
    return session_wau(events)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparkgraft import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from sparkgraft import registry

    return registry.oracles()
