"""Causal EMA normalization: C++ and JAX backends vs the pure-Python spec.

Mirrors the reference test strategy (tests/data/test_normalization.py there):
golden-reference differential testing plus causality/edge-case properties.
"""

import numpy as np
import pytest

from wav2sleep_tpu.ops.ema_norm import (
    _ema_stats_numpy,
    _warmup_stats,
    causal_rolling_normalize,
    compute_sampling_freq_from_epoch_samples,
    ema_normalize_jax,
)
from wav2sleep_tpu import native


def _spec_normalize(signal, sampling_freq, tau=900.0, baseline_tau=120.0, min_sigma=0.1, eps=1e-6, thr=4.0):
    """Run the full pipeline through the pure-Python spec loop."""
    min_sigma_sq = min_sigma * min_sigma
    a_b, a_v, mu0, ss0 = _warmup_stats(signal, sampling_freq, baseline_tau, tau, min_sigma_sq)
    mu, ss, mask = _ema_stats_numpy(signal.astype(np.float64), a_b, a_v, mu0, ss0, thr, min_sigma_sq, eps)
    sigma = np.sqrt(np.maximum(ss, min_sigma_sq))
    return (signal - mu) / sigma, mask


@pytest.fixture(scope='module')
def cpp_available():
    if native.get_lib() is None:
        pytest.skip('native library unavailable')
    return True


class TestBackendEquivalence:
    def test_cpp_matches_spec_random(self, cpp_available):
        rng = np.random.default_rng(42)
        x = rng.normal(size=10_000).astype(np.float32)
        got, mask = causal_rolling_normalize(
            x, 34.0, baseline_tau_seconds=120.0, return_outlier_mask=True, backend='cpp'
        )
        want, want_mask = _spec_normalize(x, 34.0)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        np.testing.assert_array_equal(mask, want_mask)

    def test_cpp_matches_spec_with_outliers(self, cpp_available):
        rng = np.random.default_rng(123)
        x = rng.normal(size=5_000).astype(np.float32)
        x[1000], x[2000], x[3000] = 50.0, -50.0, 100.0
        got, mask = causal_rolling_normalize(
            x, 34.0, baseline_tau_seconds=120.0, return_outlier_mask=True, backend='cpp'
        )
        want, want_mask = _spec_normalize(x, 34.0)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        np.testing.assert_array_equal(mask, want_mask)
        assert mask[1000] and mask[2000] and mask[3000]

    @pytest.mark.parametrize('tau', [300.0, 900.0])
    @pytest.mark.parametrize('baseline_tau', [60.0, 300.0])
    def test_tau_grid(self, cpp_available, tau, baseline_tau):
        rng = np.random.default_rng(7)
        x = rng.normal(size=8_000).astype(np.float32)
        got = causal_rolling_normalize(
            x, 136.0, tau_seconds=tau, baseline_tau_seconds=baseline_tau, backend='cpp'
        )
        want, _ = _spec_normalize(x, 136.0, tau=tau, baseline_tau=baseline_tau)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_jax_scan_matches_spec(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=4_000).astype(np.float32)
        x[500] = 30.0
        got = np.asarray(ema_normalize_jax(x, 34.0, baseline_tau_seconds=120.0))
        want, _ = _spec_normalize(x, 34.0)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)  # f32 scan vs f64

    def test_determinism(self, cpp_available):
        rng = np.random.default_rng(11)
        x = rng.normal(size=3_000).astype(np.float32)
        a = causal_rolling_normalize(x, 8.533, backend='cpp')
        b = causal_rolling_normalize(x, 8.533, backend='cpp')
        np.testing.assert_array_equal(a, b)


class TestEdgeCases:
    def test_empty(self):
        x = np.zeros(0, dtype=np.float32)
        out = causal_rolling_normalize(x, 34.0)
        assert len(out) == 0
        out, mask = causal_rolling_normalize(x, 34.0, return_outlier_mask=True)
        assert len(out) == 0 and len(mask) == 0

    def test_single_sample(self):
        out = causal_rolling_normalize(np.array([3.0], dtype=np.float32), 34.0)
        assert out.shape == (1,)
        assert np.isfinite(out).all()

    def test_constant_signal(self):
        out = causal_rolling_normalize(np.full(2000, 5.0, dtype=np.float32), 34.0)
        assert np.isfinite(out).all()
        # After warm-up the constant signal should normalize to ~0.
        assert np.abs(out[100:]).max() < 1e-6

    def test_min_sigma_floor(self):
        """Near-zero variance segments must not blow up (sigma floored)."""
        x = np.concatenate([np.zeros(1000), np.ones(1000) * 1e-4]).astype(np.float32)
        out = causal_rolling_normalize(x, 34.0)
        assert np.isfinite(out).all()
        assert np.abs(out).max() <= 10.0

    def test_causality_suffix_independence(self):
        """Output at time t must not depend on samples after t.

        Sizes are chosen so the warm-up window (min(tau*fs, len//10)) is the
        same for the full signal and the prefix — beyond warm-up, causality
        means identical outputs.
        """
        rng = np.random.default_rng(5)
        fs = 8.533  # ABD/THX rate: warm-up = 120 * 8.533 ~ 1023 samples
        x = rng.normal(size=24_000).astype(np.float32)
        full = causal_rolling_normalize(x, fs, baseline_tau_seconds=120.0)
        half = causal_rolling_normalize(x[:12_000], fs, baseline_tau_seconds=120.0)
        assert min(int(120.0 * fs), 24_000 // 10) == min(int(120.0 * fs), 12_000 // 10)
        np.testing.assert_allclose(full[:12_000], half, rtol=1e-6, atol=1e-8)

    @pytest.mark.parametrize('spe', [256, 1024, 4096])
    def test_realistic_modalities(self, spe):
        fs = compute_sampling_freq_from_epoch_samples(spe)
        rng = np.random.default_rng(spe)
        minutes = 20
        x = (np.sin(np.arange(int(fs * 60 * minutes)) / fs) + rng.normal(size=int(fs * 60 * minutes)) * 0.1).astype(
            np.float32
        )
        out = causal_rolling_normalize(x, fs, baseline_tau_seconds=120.0)
        assert np.isfinite(out).all()
        assert 0.05 < np.std(out[len(out) // 4 :]) < 20.0


def test_type_preservation_jax_array():
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).normal(size=1000).astype(np.float32))
    out = causal_rolling_normalize(x, 34.0)
    assert out.dtype == x.dtype
    assert type(out).__module__.startswith('jax')


def test_numpy_returns_float64():
    x = np.random.default_rng(0).normal(size=1000).astype(np.float32)
    out = causal_rolling_normalize(x, 34.0)
    assert out.dtype == np.float64


def test_fused_f32_matches_generic_cast():
    """The fused native f32 path (causal_rolling_normalize_f32, used by the
    dataset hot path) must be bit-identical to the generic path + f32 cast
    for f32 input — same double recurrence, single final rounding."""
    from wav2sleep_tpu.ops.ema_norm import (
        causal_rolling_normalize,
        causal_rolling_normalize_f32,
    )

    rng = np.random.default_rng(21)
    x = (rng.normal(size=40_000) + 0.3 * np.sin(np.arange(40_000) / 700.0)).astype(np.float32)
    x[5000] += 50.0  # outlier clipping engages
    fused = causal_rolling_normalize_f32(x, sampling_freq=34.13)
    ref = np.asarray(causal_rolling_normalize(x, sampling_freq=34.13), dtype=np.float32)
    assert fused.dtype == np.float32
    np.testing.assert_array_equal(fused, ref)
