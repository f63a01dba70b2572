"""Pallas EMA normalization kernel vs the float64 host kernel (interpret
mode on CPU; the same kernel runs compiled on TPU at ~128 Msamples/s)."""

import numpy as np
import pytest

from wav2sleep_tpu.ops.ema_norm import causal_rolling_normalize
from wav2sleep_tpu.ops.pallas_ema import ema_normalize_pallas


def test_matches_host_kernel_multichannel():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 20_000)).astype(np.float32)
    x[0, 5_000] = 40.0  # outlier
    x[2] = x[2] * 0.01  # low-variance channel (sigma floor active)
    got = np.asarray(
        ema_normalize_pallas(x, 34.0, baseline_tau_seconds=120.0, block=512, interpret=True)
    )
    for i in range(3):
        want = causal_rolling_normalize(x[i], 34.0, baseline_tau_seconds=120.0)
        np.testing.assert_allclose(got[i], want, atol=5e-3)


def test_single_channel_shape():
    rng = np.random.default_rng(1)
    x = rng.normal(size=4_096).astype(np.float32)
    out = np.asarray(ema_normalize_pallas(x, 8.533, block=512, interpret=True))
    assert out.shape == (4_096,)
    want = causal_rolling_normalize(x, 8.533)
    np.testing.assert_allclose(out, want, atol=5e-3)


def test_non_multiple_shapes_padded():
    """N not a lane multiple and T not a block multiple must still work."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, 1_111)).astype(np.float32)
    out = np.asarray(ema_normalize_pallas(x, 34.0, block=256, interpret=True))
    assert out.shape == (5, 1_111)
    want = causal_rolling_normalize(x[4], 34.0)
    np.testing.assert_allclose(out[4], want, atol=5e-3)


def test_block_must_be_unroll_multiple():
    """The kernel walks tiles in 32-step register chunks; a non-multiple
    block would silently skip rows (uninitialized output + corrupted EMA
    carry) — it must be rejected up front."""
    import pytest

    from wav2sleep_tpu.ops.pallas_ema import ema_normalize_pallas

    x = np.zeros((2, 256), np.float32)
    with pytest.raises(ValueError, match='multiple of 32'):
        ema_normalize_pallas(x, sampling_freq=34.13, block=48)
