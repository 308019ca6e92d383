"""Cross-engine parity of the strict auditor's in-engine digest.

The digest replaces collect-and-bit-compare for relations quadratic in
the rig's duplication factor (tools/strict_audit.py `--digest`): both
engines fold their relation into (count, two 60-bit md5-prefix sums)
over a canonical row string.  These tests pin the canonicalization —
column order, NULL sentinel, per-type text form — to be byte-identical
between Spark and DuckDB, and that the digest actually detects a
single-value perturbation.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..", "tools")]

from strict_audit import digest_oracle, digest_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_digest_matches_across_engines_ints_strings_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", True), (2, None, False), (-3, "x\x1fy", None)],
        "k long, s string, b boolean",
    )
    sql = (
        "SELECT * FROM (VALUES (1::BIGINT, 'a', true),"
        " (2::BIGINT, NULL, false),"
        " (-3::BIGINT, 'x' || chr(31) || 'y', NULL)) AS t(k, s, b)"
    )
    assert digest_spark(df) == digest_oracle(sql, SF)


def test_digest_matches_dates_and_timestamps(spark):
    df = spark.createDataFrame(
        [("2023-01-02", "2023-01-02 03:04:05.123456"), (None, None)],
        "d string, ts string",
    ).selectExpr("CAST(d AS DATE) AS d", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    sql = (
        "SELECT * FROM (VALUES (DATE '2023-01-02',"
        " TIMESTAMP '2023-01-02 03:04:05.123456'),"
        " (NULL, NULL)) AS t(d, ts)"
    )
    assert digest_spark(df) == digest_oracle(sql, SF)


def test_digest_zero_fraction_timestamp_renders_identically(spark):
    # the risky case: engines disagree on printing '.000000' by default;
    # the canonicalization forces 6 fraction digits on both sides
    df = spark.createDataFrame([("2023-06-01 00:00:00",)], "ts string").selectExpr(
        "CAST(ts AS TIMESTAMP_NTZ) AS ts"
    )
    sql = "SELECT TIMESTAMP '2023-06-01 00:00:00' AS ts"
    assert digest_spark(df) == digest_oracle(sql, SF)


def test_digest_detects_single_value_perturbation(spark):
    df = spark.createDataFrame([(i, f"s{i}") for i in range(100)], "k long, s string")
    good = "SELECT range::BIGINT AS k, 's' || range AS s FROM range(100)"
    bad = (
        "SELECT range::BIGINT AS k,"
        " CASE WHEN range = 57 THEN 'sX' ELSE 's' || range END AS s FROM range(100)"
    )
    assert digest_spark(df) == digest_oracle(good, SF)
    assert digest_spark(df) != digest_oracle(bad, SF)


def test_digest_is_row_order_independent(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "k long").orderBy("k")
    rev = "SELECT range::BIGINT AS k FROM range(50) ORDER BY k DESC"
    assert digest_spark(df) == digest_oracle(rev, SF)


def test_digest_null_vs_marker_string_differ(spark):
    # NULL must not collide with any literal text, including the marker
    df_null = spark.createDataFrame([(None,)], "s string")
    for literal in ("'n'", "''", "'vn'"):
        assert digest_spark(df_null) != digest_oracle(f"SELECT {literal} AS s", SF)


def test_digest_separator_injection_cannot_shift_columns(spark):
    # ('a<US>vb', 'c') must not collide with ('a', 'b<US>vc'): unescaped
    # concat_ws would render both as the same byte string
    df = spark.createDataFrame([("a\x1fvb", "c")], "s1 string, s2 string")
    crafted = "SELECT 'a' AS s1, 'b' || chr(31) || 'vc' AS s2"
    assert digest_spark(df) != digest_oracle(crafted, SF)
    # and the escaped rendering still round-trips equal values
    same = "SELECT 'a' || chr(31) || 'vb' AS s1, 'c' AS s2"
    assert digest_spark(df) == digest_oracle(same, SF)


def test_digest_rejects_float32_columns(spark):
    # float64 digests under the round(x, 6) precondition; float32 and
    # decimal still have no engine-portable text form and must be rejected
    df = spark.createDataFrame([(1.5,)], "x float")
    with pytest.raises(ValueError, match="unsupported"):
        digest_spark(df)
    with pytest.raises(ValueError, match="unsupported"):
        digest_oracle("SELECT 1.5::FLOAT AS x", SF)


def test_digest_doubles_round6_precondition(spark):
    """round(x, 6)-product doubles must digest identically: the
    DECIMAL(38,6) re-cast is tie-free for such values (module docstring)
    and renders with identical trailing-zero scale; NULL, NaN and the
    infinities get explicit markers that cannot collide."""
    vals = [0.5, 1.0, -0.123457, 0.000001, -0.0, 123456.654321]
    rows = [(v,) for v in vals] + [
        (None,),
        (float("nan"),),
        (float("inf"),),
        (float("-inf"),),
    ]
    df = spark.createDataFrame(rows, "x double")
    sql = (
        "SELECT * FROM (VALUES "
        + ", ".join(f"({v!r}::DOUBLE)" for v in vals)
        + ", (NULL::DOUBLE), ('nan'::DOUBLE), ('infinity'::DOUBLE),"
        " ('-infinity'::DOUBLE)) AS t(x)"
    )
    assert digest_spark(df) == digest_oracle(sql, SF)
    # and a 1-in-last-decimal perturbation is detected
    bad = sql.replace("(0.5::DOUBLE)", "(0.500001::DOUBLE)")
    assert digest_spark(df) != digest_oracle(bad, SF)


def test_stray_digest_name_rejected_before_session():
    """A --digest name outside the selected query set must be a fast
    argparse-style error (exit 2), never a silent fall-back to a full
    collect of the very relation digest mode exists to avoid."""
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "strict_audit.py"),
            "--queries",
            "dedup_simhash_pairs",
            "--digest",
            "dedup_simhash_lsh",  # typo: not a registered query name
        ],
        capture_output=True,
        text=True,
        cwd=repo,
        timeout=120,
    )
    assert proc.returncode == 2
    assert "--digest names not in the selected query set" in proc.stderr
    # and it failed fast: no Spark session line in stderr
    assert "SparkContext" not in proc.stderr


def test_tripped_collect_guard_auto_retries_in_digest_mode(tmp_path):
    """End-to-end pin of the at-scale default: a lane whose collect trips
    the --max-result-size guard must be retried in-engine and reported
    under auto_digest with the run still exact — never a hard failure,
    never a silent unguarded collect."""
    import json
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    out = str(tmp_path / "audit.json")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "strict_audit.py"),
            "--queries", "sessionize_ids",
            "--max-result-size", "50k",
            "--sf-dir", SF,
            "--cpus", "4",
            "--out", out,
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    payload = json.load(open(out))
    assert payload["exact"] == 1 and not payload["failures"]
    assert payload["auto_digest"] == ["sessionize_ids"]
