"""Strict bitwise Spark <-> DuckDB audit over the query registry.

The local parity suite (`tests/oracle.assert_parity`) allows a 1e-9
relative tolerance on floats; the round driver's value hash does NOT —
it hashes the exact bytes.  Rounds 4–5 therefore ran an ad-hoc
"doubles compared by int64 bit pattern" sweep before each freeze to
prove every oracle-backed query is BIT-exact, not merely close
(COVERAGE.md "Strict full-registry audit").  This tool checks that
sweep in as a first-class command so it stops being re-derived every
round.

Comparison contract (replica of the driver's hash, made diagnosable):
  - column sets must match; rows sorted by all columns, columns by name
  - float64 columns compare by int64 bit pattern (numpy .view); the
    only concession is NaN==NaN (the driver's to-python conversion
    collapses NaN payloads before hashing)
  - everything else compares exactly (ints, strings, dates, bools)

Usage:
    python tools/strict_audit.py                          # window, sf0.001
    python tools/strict_audit.py --queries all --sf-dir /root/testdata/sf0.01
    python tools/strict_audit.py --queries q7_volume_shipping,sessionize_hotkey \
        --sf-dir /root/testdata/sf0.1 --cpus 16
Prints one JSON line: {"sf_dir": ..., "n": N, "exact": K, "failures": {...}}
and exits non-zero if any query is not bit-exact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO]


def _bit_compare(a_pdf, b_pdf) -> list[str]:
    """Return human-readable mismatch descriptions (empty == bit-exact)."""
    import numpy as np

    from tests.oracle import _canon, _is_nan

    errs: list[str] = []
    if sorted(a_pdf.columns) != sorted(b_pdf.columns):
        return [f"columns spark={sorted(a_pdf.columns)} oracle={sorted(b_pdf.columns)}"]
    if len(a_pdf) != len(b_pdf):
        return [f"rows spark={len(a_pdf)} oracle={len(b_pdf)}"]
    a, b = _canon(a_pdf), _canon(b_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" and bv.dtype.kind == "f":
            ab = np.ascontiguousarray(av.to_numpy(dtype="float64")).view("int64")
            bb = np.ascontiguousarray(bv.to_numpy(dtype="float64")).view("int64")
            nan_both = np.isnan(av.to_numpy(dtype="float64")) & np.isnan(
                bv.to_numpy(dtype="float64")
            )
            bad = np.nonzero((ab != bb) & ~nan_both)[0]
            for i in bad[:3]:
                errs.append(
                    f"col={col} row={int(i)}: spark={av.iloc[int(i)]!r} "
                    f"({int(ab[int(i)]):#x}) oracle={bv.iloc[int(i)]!r} "
                    f"({int(bb[int(i)]):#x})"
                )
            if len(bad) > 3:
                errs.append(f"col={col}: +{len(bad) - 3} more bit mismatches")
        else:
            for i, (x, y) in enumerate(zip(av.tolist(), bv.tolist())):
                if _is_nan(x) and _is_nan(y):
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    import struct

                    if struct.pack("<d", x) != struct.pack("<d", y):
                        errs.append(f"col={col} row={i}: spark={x!r} oracle={y!r}")
                elif x != y:
                    errs.append(f"col={col} row={i}: spark={x!r} oracle={y!r}")
                if len(errs) >= 4:
                    errs.append(f"col={col}: truncated")
                    return errs
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--queries",
        default="window",
        help="'window' (DRIVER_WINDOW), 'all' (every oracle-backed query), "
        "or a comma-separated name list",
    )
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    ap.add_argument("--driver-mem", default=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    ap.add_argument("--out", default="", help="optional JSON artifact path")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from sparkgraft import registry
    from tests.oracle import run_oracle

    # vanilla session, like the driver (read_table sets UTC/nanos configs
    # itself); driver memory raised only when the caller asks (10x replicas)
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", args.driver_mem)
        # the audit COLLECTS both sides of every relation to bit-compare;
        # pair lanes on duplicated rigs (10x: every doc has 9 twins) emit
        # GB-scale pair relations, so the 1g default would abort the
        # collect — cap at the driver heap instead of a fixed slice
        .config("spark.driver.maxResultSize", "0")
        .appName("sparkgraft-strict-audit")
        .getOrCreate()
    )
    qs, oracles = registry.queries(), registry.oracles()
    if args.queries == "window":
        names = [n for n in registry.DRIVER_WINDOW if oracles.get(n)]
    elif args.queries == "all":
        names = [n for n in qs if oracles.get(n)]
    else:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2

    failures: dict[str, list[str]] = {}
    for i, name in enumerate(names):
        try:
            spdf = qs[name](spark, args.sf_dir).toPandas()
            opdf = run_oracle(oracles[name], args.sf_dir)
            errs = _bit_compare(spdf, opdf)
        except Exception as exc:  # keep auditing; report the lane
            errs = [f"EXC {type(exc).__name__}: {exc}"[:500]]
        if errs:
            failures[name] = errs
        print(
            f"# [{i + 1}/{len(names)}] {name}: "
            + ("BIT-EXACT" if not errs else f"FAIL {errs[0]}"),
            file=sys.stderr,
        )
    payload = {
        "sf_dir": args.sf_dir,
        "n": len(names),
        "exact": len(names) - len(failures),
        "failures": failures,
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
