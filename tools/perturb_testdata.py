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
no RNG) copy of a scale dir.

Round-7 classes (NULL/empty content):

- ``events.value``   -> NULL where event_id % 20 == 0   (5%)
- ``events.props``   -> NULL where event_id % 31 == 0   (~3%)
- ``documents.text`` -> ''   where doc_id % 37 == 0     (~2.7%)
- ``documents.text`` -> NULL where doc_id % 41 == 0     (~2.4%)
- ``customer.c_acctbal`` -> NULL where c_custkey % 25 == 0 (4%)

Round-8 classes (adversarial KEYS and TIME — the next drift axis: nothing
in TESTDATA.md promises unique (user, ts) pairs, in-range timestamps, or
positive prices):

- ``events.ts`` -> the user's FIRST event ts where event_id % 43 == 0
  (~2.3%): exact (user_id, ts) COLLISIONS, so every ordering tiebreak
  (sessionize's (ts, event_id), window lag/lead, latest-per-user) is
  actually exercised instead of vacuously deterministic
- ``events.ts`` -> epoch 0 where event_id % 53 == 0; 1969-12-31
  23:59:59.999999 (NEGATIVE epoch) where % 59 == 0; the Asia/Seoul DST
  spring-forward instant 1987-05-09 17:00:00 UTC (= local 02:00 jumping
  to 03:00) where % 61 == 0 and one microsecond before it where % 67 == 0
  — the KST normalization path (ops/temporal) meets a real historic DST
  transition, not just the fixed +09:00 of modern dates
- ``events.value`` -> negated where event_id % 73 == 0 (negative values)
- ``orders.o_totalprice`` / ``lineitem.l_extendedprice`` -> 0.0 where the
  row key % 47 == 0, negated where % 71 == 0 (zero/negative prices
  through every TPC-H revenue aggregate)

``--empty TABLE`` additionally writes the named table with ZERO rows
(schema preserved) — the fully-empty-source rig: after an aggressive
filter at 100 TB, any operator can legally see an empty input, and it
must return an empty (or identity) result, not crash.

``--nonfinite`` additionally poisons EVERY float column (round 9 widened
it beyond ``events.value`` — NaN propagates through
``aggregate(zip_with(...))`` without erroring, so a special in an
EMBEDDING would silently poison every cosine/PQ/k-means lane, and
negative zero / denormals were untested):

- ``events.value``: NaN (event_id % 79 == 0), +inf (% 83), -inf (% 89),
  NEGATIVE ZERO (% 97), double denormal 5e-324 (% 101)
- ``embeddings.embedding``: element-level — NaN at element 0
  (vec_id % 79 == 0), +inf at 1 (% 83), -inf at 2 (% 89), -0.0f at 3
  (% 97), float32 denormal 1e-45 at 4 (% 101), NULL at 5 (% 103 — the
  incomplete-vector class: DuckDB list_sum skips it, Spark's fold
  propagates it)
- every scalar double in the star schema — ``customer.c_acctbal``,
  ``supplier.s_acctbal``, ``part.p_retailprice``, ``orders.o_totalprice``,
  ``lineitem.l_quantity/l_extendedprice/l_discount/l_tax`` — gets NaN
  (row key % 79 == 0), +inf (% 83), -inf (% 89)

The probe rig for IEEE-special handling; NOT part of the
default perturbation set: lanes that feed ``value`` into exact-decimal
arithmetic have a declared finite-domain precondition (ANSI
double→decimal casts error on specials BY DESIGN — loud, not silent),
and `dq_constraint_report` is the production gate that detects the
specials upstream.  Run it to find lanes that diverge SILENTLY.

Every other table is copied unchanged.  Run the strict bitwise audit on
the output dir: lanes that fail have a latent asymmetry between their
Spark plan and their DuckDB oracle (or a crash in a UDF) — fix them
BEFORE a regeneration makes the failure a red driver hash row.

    python tools/perturb_testdata.py --src /root/testdata/sf0.001 \
        --dst .scale_cache/sf0.001-drift
    python tools/strict_audit.py --queries all --sf-dir .scale_cache/sf0.001-drift
    python tools/perturb_testdata.py --src /root/testdata/sf0.001 \
        --dst .scale_cache/sf0.001-empty-events --empty events
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


def _negate_where(table: pa.Table, col: str, key: str, mod: int, rem: int = 0):
    mask = _mod_mask(table, key, mod, rem)
    vals = pc.if_else(mask, pc.negate(table[col]), table[col])
    return table.set_column(table.schema.get_field_index(col), col, vals)


def _perturb_events_keys_time(tab: pa.Table) -> pa.Table:
    """The round-8 key/time classes (module docstring) — pandas for the
    per-user min-ts collision (arrow has no grouped transform), then
    point-timestamp overrides.  Order matters: collisions derive from the
    ORIGINAL timestamps, then the boundary instants overwrite (two events
    of one user both hitting % 53 == 0 collide at epoch 0 — compounding
    the duplicate-(user, ts) class, which is the point)."""
    import pandas as pd

    df = tab.to_pandas()
    first_ts = df.groupby("user_id")["ts"].transform("min")
    df.loc[df.event_id % 43 == 0, "ts"] = first_ts[df.event_id % 43 == 0]
    df.loc[df.event_id % 53 == 0, "ts"] = pd.Timestamp("1970-01-01 00:00:00")
    df.loc[df.event_id % 59 == 0, "ts"] = pd.Timestamp("1969-12-31 23:59:59.999999")
    # Asia/Seoul 1987 spring-forward: local 02:00 +09:00 -> 03:00 +10:00,
    # i.e. UTC 1987-05-09 17:00:00; one row lands ON it, one 1 us before
    df.loc[df.event_id % 61 == 0, "ts"] = pd.Timestamp("1987-05-09 17:00:00")
    df.loc[df.event_id % 67 == 0, "ts"] = pd.Timestamp("1987-05-09 16:59:59.999999")
    df.loc[df.event_id % 73 == 0, "value"] = -df.loc[df.event_id % 73 == 0, "value"]
    return pa.Table.from_pandas(df, schema=tab.schema, preserve_index=False)


def _specials_where(tab: pa.Table, col: str, key: str) -> pa.Table:
    """The scalar-double special triple: NaN / +inf / -inf at the shared
    % 79 / 83 / 89 moduli (same classes as events.value so one audit run
    exercises every consumer of every float column identically)."""
    tab = _set_where(tab, col, key, 79, float("nan"))
    tab = _set_where(tab, col, key, 83, float("inf"))
    return _set_where(tab, col, key, 89, float("-inf"))


def _poison_embeddings(tab: pa.Table) -> pa.Table:
    """Element-level specials inside the embedding arrays — NaN flows
    through `aggregate(zip_with(...))` without erroring, so this is the
    silent-divergence probe for every cosine/PQ/k-means/LSH lane; -0.0
    and the float32 denormal exercise sign-of-zero and underflow paths
    (bucket_sql's `> 0` test, norm sqrt, quantization rounding); the NULL
    element is its own class — DuckDB's list_sum SKIPS a NULL element
    where Spark's aggregate fold propagates it, so an incomplete vector
    diverges silently unless the declared domain excludes it.

    The column is rebuilt via pa.array over python lists: a pandas
    round-trip would silently convert the planted NaN to null
    (nan-as-missing), collapsing the two distinct classes into one."""
    ids = tab["vec_id"].to_pylist()
    vecs = [list(map(float, v)) for v in tab["embedding"].to_pylist()]
    specials = [
        (79, 0, float("nan")),
        (83, 1, float("inf")),
        (89, 2, float("-inf")),
        (97, 3, -0.0),
        (101, 4, 1e-45),  # float32 subnormal
        (103, 5, None),   # incomplete vector (NULL element)
    ]
    for i, vid in enumerate(ids):
        if not vecs[i]:
            # empty vectors are in the declared domain (they pass the
            # finite filter) — nothing to poison, and idx % 0 would raise
            continue
        for mod, idx, val in specials:
            if vid % mod == 0:
                vecs[i][idx % len(vecs[i])] = val
    col = pa.array(vecs, type=tab.schema.field("embedding").type)
    return tab.set_column(
        tab.schema.get_field_index("embedding"), "embedding", col
    )


def perturb(src: str, dst: str, empty: str = "", nonfinite: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    perturbed = ["events", "documents", "customer", "orders", "lineitem"]
    if nonfinite:
        perturbed += ["supplier", "part", "embeddings"]
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(sp):
            continue
        if t == empty:
            pq.write_table(pq.read_table(sp).slice(0, 0), dp)
            print(f"# {t}: EMPTIED (schema preserved)")
            continue
        if t == "events":
            tab = pq.read_table(sp)
            tab = _null_where(tab, "value", "event_id", 20)
            tab = _null_where(tab, "props", "event_id", 31)
            tab = _perturb_events_keys_time(tab)
            if nonfinite:
                tab = _specials_where(tab, "value", "event_id")
                tab = _set_where(tab, "value", "event_id", 97, -0.0)
                tab = _set_where(tab, "value", "event_id", 101, 5e-324)
            pq.write_table(tab, dp)
        elif t == "orders":
            tab = pq.read_table(sp)
            tab = _set_where(tab, "o_totalprice", "o_orderkey", 47, 0.0)
            tab = _negate_where(tab, "o_totalprice", "o_orderkey", 71)
            if nonfinite:
                tab = _specials_where(tab, "o_totalprice", "o_orderkey")
            pq.write_table(tab, dp)
        elif t == "lineitem":
            tab = pq.read_table(sp)
            tab = _set_where(tab, "l_extendedprice", "l_orderkey", 47, 0.0)
            tab = _negate_where(tab, "l_extendedprice", "l_orderkey", 71)
            if nonfinite:
                for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
                    tab = _specials_where(tab, c, "l_orderkey")
            pq.write_table(tab, dp)
        elif t == "supplier" and nonfinite:
            pq.write_table(
                _specials_where(pq.read_table(sp), "s_acctbal", "s_suppkey"), dp
            )
        elif t == "part" and nonfinite:
            pq.write_table(
                _specials_where(pq.read_table(sp), "p_retailprice", "p_partkey"), dp
            )
        elif t == "embeddings" and nonfinite:
            pq.write_table(_poison_embeddings(pq.read_table(sp)), dp)
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
            if nonfinite:
                tab = _specials_where(tab, "c_acctbal", "c_custkey")
            pq.write_table(tab, dp)
        else:
            shutil.copyfile(sp, dp)
        print(f"# {t}: {'perturbed' if t in perturbed else 'copied'}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default=".scale_cache/sf0.001-drift")
    ap.add_argument(
        "--empty",
        default="",
        help="write this table with zero rows (schema preserved) instead "
        "of perturbing it — the fully-empty-source rig",
    )
    ap.add_argument(
        "--nonfinite",
        action="store_true",
        help="also poison events.value with NaN/+inf/-inf — the "
        "IEEE-specials probe rig (not part of the default set; see "
        "module docstring)",
    )
    args = ap.parse_args()
    perturb(args.src, args.dst, empty=args.empty, nonfinite=args.nonfinite)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
