"""NULL/empty-content robustness: the data-drift rig distilled to a test.

The driver regenerates testdata between rounds; nothing in TESTDATA.md
promises `events.value` or `documents.text` are non-null.  Round 7's
perturbation audit (tools/perturb_testdata.py + tools/strict_audit.py,
DRIFT_AUDIT_r07.json) found 24 lanes with latent NULL asymmetries — five
of which CRASHED outright (ANSI DIVIDE_BY_ZERO on empty text, len(None)
in pandas UDFs, float64-poisoned Bloom probes).  This test pins the crash
class: the five formerly-crashing lanes must run AND match their oracles
bitwise on perturbed data.  The full-registry drift audit stays a tool
(13 min); this guard is the 90-second core of it.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..", "tools")]

from perturb_testdata import perturb  # noqa: E402
from strict_audit import _bit_compare  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: the five lanes that crashed (not merely diverged) on NULL/empty content
CRASH_LANES = (
    "text_quality",
    "text_hybrid_rrf",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "dedup_incremental_bloom",
)


@pytest.fixture(scope="module")
def drift_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("drift"))
    perturb(SRC, d)
    return d


@pytest.mark.parametrize("name", CRASH_LANES)
def test_lane_survives_null_content_bitwise(spark, drift_dir, name):
    from sparkgraft import registry
    from tests.oracle import run_oracle

    spdf = registry.queries()[name](spark, drift_dir).toPandas()
    opdf = run_oracle(registry.oracles()[name], drift_dir)
    errs = _bit_compare(spdf, opdf)
    assert not errs, f"{name} diverged on drift data: {errs[:3]}"


def test_empty_docs_emit_zero_neardup_pairs(spark):
    """The zero-shingle policy's scale claim, pinned: a corpus of many
    empty/whitespace-only docs emits NO near-dup candidates at all (they
    drop at the shingle stage), instead of the N^2/2 pair blowup the old
    degenerate '' shingle produced.  Exact dedup still groups them — that
    is where byte-identical empties belong."""
    from sparkgraft.ext.dedup import (
        exact_dups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        normalized_dup_groups,
    )

    rows = [(i, "" if i % 2 else "   ") for i in range(200)]
    rows.append((1000, "a real document with several words in it"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    assert minhash_lsh_pairs(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    # exact dedup still owns them: byte-exact groups the two literal
    # contents, whitespace-normalized folds all 200 into one class
    assert {r.n_copies for r in exact_dups(docs).collect()} == {1, 100}
    assert 200 in {r.n_copies for r in normalized_dup_groups(docs).collect()}


def test_resize_stub_survives_null_payloads(spark):
    """decode -> resize must carry absent media END to end: decode emits
    NULL features for a NULL payload, and resize plans NULL geometry for
    them instead of dying in astype('int32') on the first NaN."""
    from sparkgraft.ext.multimodal import attach_payload, decode_features, resize_stub

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in resize_stub(
            decode_features(attach_payload(docs), fake=True), fake=True
        ).collect()
    }
    assert out[1].out_width == 224 and out[1].out_height >= 1
    assert (out[2].width, out[2].out_width, out[2].out_height) == (None, None, None)
    # empty payload is real media of zero bytes: clipped to 1x1 geometry
    assert out[3].width == 1 and out[3].out_width == 224


def test_decode_stub_is_byte_true_under_unicode(spark, tmp_path):
    """The decode stub's oracle is expressed byte-true (octet_length +
    UTF-8 lead-byte arithmetic), so non-ASCII text — a plausible future
    testdata regeneration — must still hash-match: n_bytes counts utf-8
    BYTES and head_byte is the first encoded BYTE, exactly what the
    engine's fake byte-decoder sees.  (frame_sample's per-window oracle
    keeps its documented ASCII precondition: DuckDB has no blob slicing.)"""
    import shutil

    from sparkgraft import registry
    from tests.oracle import run_oracle

    sys.path[:0] = [os.path.join(os.path.dirname(__file__), "..", "tools")]
    from strict_audit import _bit_compare

    d = str(tmp_path / "uni")
    os.makedirs(d)
    spark.createDataFrame(
        [
            (1, "héllo wörld", "en", "web", 11),
            (2, "日本語のテキスト", "ja", "web", 8),
            (3, "plain ascii", "en", "web", 11),
            (4, "", "en", "web", 0),
            (5, None, "en", "web", None),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(d, f"{t}.parquet"))

    spdf = registry.queries()["multimodal_decode_stub"](spark, d).toPandas()
    opdf = run_oracle(registry.oracles()["multimodal_decode_stub"], d)
    errs = _bit_compare(spdf, opdf)
    assert not errs, errs[:3]
    by_id = {int(r.doc_id): r for _, r in spdf.iterrows()}
    assert by_id[1]["n_bytes"] == len("héllo wörld".encode()) == 13
    assert by_id[2]["head_byte"] == "日本語のテキスト".encode()[0] == 230


#: round-8 additions — the lanes the adversarial KEY/TIME rig caught
#: diverging (not crashing): pre-epoch timestamps overflowed the z-order
#: interleave's 32-bit shiftleft and fed signed bits through `%`; a
#: 54-year xr span pushed the trend lane's decimal sums past the 2^53
#: double-rounding boundary (oracle now routes decimal->double through
#: VARCHAR); pre-epoch event times are below Spark's epoch-initialized
#: streaming watermark, so the state-inspect lane declares ts >= epoch on
#: both sides.  All three must now match bitwise on the widened rig.
KEYTIME_LANES = (
    "zorder_layout_audit",
    "user_value_trend",
    "streaming_state_inspect",
    # tiebreak-sensitive lanes: duplicate (user, ts) collisions must not
    # perturb the deterministic ordering contracts
    "sessionize_ids",
    "latest_event_per_user",
    "kst_daily_counts",
)


@pytest.mark.parametrize("name", KEYTIME_LANES)
def test_lane_survives_keytime_drift_bitwise(spark, drift_dir, name):
    from sparkgraft import registry
    from tests.oracle import run_oracle

    spdf = registry.queries()[name](spark, drift_dir).toPandas()
    opdf = run_oracle(registry.oracles()[name], drift_dir)
    errs = _bit_compare(spdf, opdf)
    assert not errs, f"{name} diverged on key/time drift data: {errs[:3]}"


#: round-8 empty-source class: after an aggressive filter at 100 TB any
#: operator can legally see an EMPTY input; the --empty rig caught four
#: lanes assuming otherwise (stream fixtures doing arithmetic on a
#: collected None max/min; SUM-as-count reading NULL on empty; Spark's
#: CUBE emitting no () row on an empty relation where ANSI emits one —
#: that last is a declared engine contract, pinned in the oracle).
EMPTY_EVENTS_LANES = (
    "cube_event_counts",
    "streaming_restart_sessionize",
    "streaming_session_window",
    "sessionize_auto",
    # round-9 lanes whose decision/gate statistics read a first() over an
    # aggregate — on empty input the row is all-NULL and must coerce to 0,
    # not crash (the round-8 empty-source class)
    "salted_join_auto",
    "dq_gated_value_rollup",
)
EMPTY_DOCS_LANES = ("corpus_quality_funnel", "dedup_minhash_lsh")


@pytest.fixture(scope="module")
def empty_events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_ev"))
    perturb(SRC, d, empty="events")
    return d


@pytest.fixture(scope="module")
def empty_docs_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_doc"))
    perturb(SRC, d, empty="documents")
    return d


@pytest.mark.parametrize("name", EMPTY_EVENTS_LANES)
def test_lane_survives_empty_events_bitwise(spark, empty_events_dir, name):
    from sparkgraft import registry
    from tests.oracle import run_oracle

    spdf = registry.queries()[name](spark, empty_events_dir).toPandas()
    opdf = run_oracle(registry.oracles()[name], empty_events_dir)
    errs = _bit_compare(spdf, opdf)
    assert not errs, f"{name} diverged on empty events: {errs[:3]}"


@pytest.mark.parametrize("name", EMPTY_DOCS_LANES)
def test_lane_survives_empty_documents_bitwise(spark, empty_docs_dir, name):
    from sparkgraft import registry
    from tests.oracle import run_oracle

    spdf = registry.queries()[name](spark, empty_docs_dir).toPandas()
    opdf = run_oracle(registry.oracles()[name], empty_docs_dir)
    errs = _bit_compare(spdf, opdf)
    assert not errs, f"{name} diverged on empty documents: {errs[:3]}"


#: round-8 IEEE-specials class (--nonfinite probe rig): NaN/±inf in
#: events.value.  Policy: lanes whose math is undefined over specials
#: declare a FINITE domain explicitly on both sides (histogram bins,
#: interpolated percentiles — both diverged silently before);
#: dq_constraint_report's events_value_finite check is the production
#: gate that detects specials upstream; exact-decimal lanes keep their
#: loud ANSI cast error (a declared precondition, not a bug).
NONFINITE_LANES = (
    "value_histogram",
    "percentile_value_by_type",
    "dq_constraint_report",
    # round-9 widening: element-level specials + NULL elements inside
    # embeddings (the rig poisons every float column).  The similarity
    # lanes declare a finite-AND-complete vector domain
    # (ext/simsearch.finite_vectors, _EMB_FINITE twin) — without it, NaN
    # hit numpy-vs-SQL ranking divergence and a NULL element split the
    # engines at the dot product itself (DuckDB list_sum skips it,
    # Spark's fold propagates it)
    "embed_cosine_topk",
    "embed_cosine_neardup",
    "embed_ivf_topk",
    "embed_lsh_topk",
    "embed_semantic_dedup",
    "embed_knn_graph",
    "graph_triangle_count",
    "graph_triangle_lsh",
    # the integer-path members of the family (same declared domain; their
    # pre-declaration behavior was a loud mid-job ANSI cast abort, now
    # they process the in-domain remainder)
    "embed_quantized_topk",
    "embedding_stats_by_label",
    "embed_vector_algebra",
    "embed_arrow_norms",
    "embed_pca_projection",
    # -0.0 class: sign-of-zero canonicalization (+ 0.0 on both engines)
    "value_decile_bins",
)


@pytest.fixture(scope="module")
def nonfinite_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nonfinite"))
    perturb(SRC, d, nonfinite=True)
    return d


@pytest.mark.parametrize("name", NONFINITE_LANES)
def test_lane_survives_nonfinite_values_bitwise(spark, nonfinite_dir, name):
    from sparkgraft import registry
    from tests.oracle import run_oracle

    spdf = registry.queries()[name](spark, nonfinite_dir).toPandas()
    opdf = run_oracle(registry.oracles()[name], nonfinite_dir)
    errs = _bit_compare(spdf, opdf)
    assert not errs, f"{name} diverged on nonfinite values: {errs[:3]}"


def test_dq_report_detects_nonfinite_values(spark, nonfinite_dir):
    from sparkgraft import registry

    rows = {
        r.check_name: r.n_violations
        for r in registry.queries()["dq_constraint_report"](
            spark, nonfinite_dir
        ).collect()
    }
    assert rows["events_value_finite"] > 0
    # round-9: the widened gate sees the poisoned embeddings too (NaN,
    # ±inf AND the NULL-element incomplete-vector class)
    assert rows["embeddings_finite"] > 0


def test_gated_lane_fails_closed_on_nonfinite_rig(spark, nonfinite_dir):
    """The gate-then-process lane on the poisoned rig must abort via the
    DQ gate (loud, pre-shuffle), never reach the rollup's ANSI cast."""
    from sparkgraft import registry
    from sparkgraft.ops.dq import DQGateError

    with pytest.raises(DQGateError):
        registry.queries()["dq_gated_value_rollup"](spark, nonfinite_dir)


def test_seed_anchored_lanes_fail_loud_when_seed_out_of_domain(spark, nonfinite_dir):
    """kmeans/PQ anchor their codebooks and query set on vec_ids 0..k-1;
    on the poisoned rig vec_id 0 is out of the declared finite domain, so
    the lanes must raise the CLEAR declared-precondition error (never a
    cryptic KeyError, never a silent partial model)."""
    from sparkgraft import registry

    for name in ("embed_kmeans_clusters", "embed_pq_topk"):
        with pytest.raises(ValueError, match="declared precondition"):
            registry.queries()[name](spark, nonfinite_dir)


def test_exact_decimal_lane_fails_loud_on_specials(spark, nonfinite_dir):
    """The declared finite-domain precondition: a scaled-integer lane fed
    ±inf must raise the ANSI cast error LOUDLY (matching the oracle's own
    ConversionException), never silently NULL the special away."""
    from sparkgraft import registry

    with pytest.raises(Exception, match="CAST_OVERFLOW|cannot be cast"):
        registry.queries()["ewma_user_value"](spark, nonfinite_dir).toPandas()
