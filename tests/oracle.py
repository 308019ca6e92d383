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
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single parquet FILES; the scale caches
        # (.scale_cache/sf0.1x10 etc.) are Spark-written DIRECTORIES —
        # DuckDB needs the part-file glob for those
        if not os.path.exists(path):
            continue  # partial dirs (per-table deep-decade caches)
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
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


def _dtype_kind(series) -> str:
    """Collapse a pandas dtype to a comparison kind.

    The driver's value-hash is dtype-sensitive: DuckDB HUGEINT arrives as
    float64 while Spark SUM(int) is int64, and the hashes differ even when
    every value is equal.  Catch that class locally by requiring the two
    sides to land in the same kind bucket: integer ('i'), float ('f'),
    bool ('b'), datetime ('M'), other/object ('O').  Width differences
    (int32 vs int64) hash the same after the driver's to-python conversion,
    so widths are not distinguished.
    """
    import datetime

    kind = series.dtype.kind
    if kind == "u":
        kind = "i"
    if kind == "O":
        vals = [v for v in series if v is not None and not _is_nan(v)]
        if vals and all(isinstance(v, bool) for v in vals):
            return "b"
        if vals and all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
            return "i"
        if vals and all(isinstance(v, float) for v in vals):
            return "f"
        # Spark DATE/TIMESTAMP arrive as objects; DuckDB as datetime64.
        # Round-1 driver rows prove it normalizes these — same kind.
        if vals and all(isinstance(v, (datetime.date, datetime.datetime)) for v in vals):
            return "M"
    return kind


def assert_parity(spark_df, oracle_pdf, float_rtol: float = 1e-9):
    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    )
    for col in spdf.columns:
        sk, ok_ = _dtype_kind(spdf[col]), _dtype_kind(oracle_pdf[col])
        assert sk == ok_, (
            f"dtype-kind mismatch col={col}: spark={spdf[col].dtype}({sk}) "
            f"oracle={oracle_pdf[col].dtype}({ok_}) — the driver's strict hash "
            f"will fail on this; CAST the oracle (or Spark side) so kinds agree"
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
