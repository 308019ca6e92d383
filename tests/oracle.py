"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query's Spark side and oracle side over the same parquet
tables and asserts row-count + column-name + value equality (order- and
column-order-insensitive, exact on non-floats, tight tolerance on floats).
"""

from __future__ import annotations

import math

import duckdb

from sparkgraft.io.readers import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df_pandas):
    import datetime

    import pandas as pd

    out = df_pandas.copy()
    for col in out.columns:
        # Spark DATE -> datetime.date objects; DuckDB DATE -> datetime64.
        # Same logical type either way; normalize for value comparison.
        if out[col].dtype == object and out[col].map(
            lambda v: v is None or isinstance(v, (datetime.date, datetime.datetime))
        ).all() and out[col].notna().any():
            out[col] = pd.to_datetime(out[col])
    cols = sorted(out.columns)
    out = out[cols]
    return out.sort_values(by=cols, kind="mergesort", na_position="last").reset_index(
        drop=True
    )


def assert_parity(spark_df, oracle_pdf, float_rtol: float = 1e-9):
    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spdf)} oracle={len(oracle_pdf)}"
    )
    a, b = _canon(spdf), _canon(oracle_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if _is_nan(x) and _is_nan(y):
                continue
            if isinstance(x, float) and isinstance(y, float):
                ok = x == y or math.isclose(x, y, rel_tol=float_rtol, abs_tol=1e-12)
            else:
                ok = x == y
            assert ok, f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}"


def _is_nan(v) -> bool:
    import pandas as pd

    try:
        return v is None or bool(pd.isna(v))
    except (TypeError, ValueError):
        return False
