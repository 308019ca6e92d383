#!/usr/bin/env python3
"""Dump `.explain("formatted")` for a list of lanes to files.

Usage: python tools/dump_plans.py --out plans/r13 --suffix _after lane [lane...]
Reads lanes from --list FILE (one per line) when given.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lanes", nargs="*")
    ap.add_argument("--list", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("SPARK_GRAFT_CPUS", args.cpus)
    from sparkgraft import registry
    from sparkgraft.session import get_spark

    lanes = list(args.lanes)
    if args.list:
        with open(args.list) as fh:
            lanes += [l.strip() for l in fh if l.strip() and not l.startswith("#")]

    spark = get_spark("plan-dump", master=f"local[{args.cpus}]")
    qfns = registry.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in lanes:
        if name not in qfns:
            print(f"skip unknown lane {name}", file=sys.stderr)
            continue
        try:
            df = qfns[name](spark, args.sf)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN DUMP FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
