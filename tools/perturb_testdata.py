#!/usr/bin/env python3
"""Deterministic data-drift rig: a perturbed copy of a testdata scale dir.

The driver REGENERATES /root/testdata between rounds, and regenerated data
has broken hidden assumptions before (timestamp encoding round 2->3; exact
duplicate ties on the 10x twin rig).  The next plausible drift class is
NULL/empty content: nothing in TESTDATA.md promises `events.value` or
`documents.text` are non-null, yet a query whose Spark side counts
non-null values while its oracle counts rows would only diverge when a
NULL actually appears (exactly the `count(*) FILTER` vs `F.count(col)`
asymmetry a round-7 review caught in the evolution lanes).

This tool manufactures that future: a byte-deterministic (key-modulus,
no RNG) copy of a scale dir with

- ``events.value``   -> NULL where event_id % 20 == 0   (5%)
- ``events.props``   -> NULL where event_id % 31 == 0   (~3%)
- ``documents.text`` -> ''   where doc_id % 37 == 0     (~2.7%)
- ``documents.text`` -> NULL where doc_id % 41 == 0     (~2.4%)
- ``customer.c_acctbal`` -> NULL where c_custkey % 25 == 0 (4%)

Every other table is copied unchanged.  Run the strict bitwise audit on
the output dir: lanes that fail have a latent NULL-handling asymmetry
between their Spark plan and their DuckDB oracle (or a crash on NULL in
a UDF) — fix them BEFORE a regeneration makes the failure a red driver
hash row.

    python tools/perturb_testdata.py --src /root/testdata/sf0.001 \
        --dst .scale_cache/sf0.001-drift
    python tools/strict_audit.py --queries all --sf-dir .scale_cache/sf0.001-drift
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mod_mask(table: pa.Table, key: str, mod: int, rem: int):
    # pyarrow has no elementwise mod kernel; x - (x // m) * m is exact on int64
    k = table[key]
    return pc.equal(pc.subtract(k, pc.multiply(pc.divide(k, mod), mod)), rem)


def _null_where(table: pa.Table, col: str, key: str, mod: int, rem: int = 0):
    mask = _mod_mask(table, key, mod, rem)
    vals = pc.if_else(mask, pa.scalar(None, table.schema.field(col).type), table[col])
    return table.set_column(table.schema.get_field_index(col), col, vals)


def _set_where(table: pa.Table, col: str, key: str, mod: int, value, rem: int = 0):
    mask = _mod_mask(table, key, mod, rem)
    vals = pc.if_else(mask, pa.scalar(value, table.schema.field(col).type), table[col])
    return table.set_column(table.schema.get_field_index(col), col, vals)


def perturb(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(sp):
            continue
        if t == "events":
            tab = pq.read_table(sp)
            tab = _null_where(tab, "value", "event_id", 20)
            tab = _null_where(tab, "props", "event_id", 31)
            pq.write_table(tab, dp)
        elif t == "documents":
            tab = pq.read_table(sp)
            tab = _set_where(tab, "text", "doc_id", 37, "")
            tab = _null_where(tab, "text", "doc_id", 41)
            # keep the DERIVED column consistent: a real regeneration with
            # empty/NULL text would carry n_chars = 0/NULL, and several
            # lanes read n_chars directly rather than deriving it — a rig
            # with text='' but n_chars=473 certifies them against inputs
            # that cannot occur (verified n_chars == length(text) on every
            # clean row, so re-deriving is a no-op for unperturbed docs)
            tab = tab.set_column(
                tab.schema.get_field_index("n_chars"),
                "n_chars",
                pc.cast(pc.utf8_length(tab["text"]), pa.int64()),
            )
            pq.write_table(tab, dp)
        elif t == "customer":
            tab = pq.read_table(sp)
            tab = _null_where(tab, "c_acctbal", "c_custkey", 25)
            pq.write_table(tab, dp)
        else:
            shutil.copyfile(sp, dp)
        print(f"# {t}: {'perturbed' if t in ('events', 'documents', 'customer') else 'copied'}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default=".scale_cache/sf0.001-drift")
    args = ap.parse_args()
    perturb(args.src, args.dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
