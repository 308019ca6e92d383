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
