"""Causal (online) EMA normalization.

Functional equivalent of the reference's Numba-compiled normalizer
(src/wav2sleep/data/normalization.py:18-232): a two-time-constant exponential
moving average tracks baseline (mean) and variance, residuals are clipped at
``outlier_threshold_sigma`` times the *previous* sigma (which makes the
recurrence non-associative — no parallel scan is possible), and sigma is
floored at ``min_sigma``.

Three backends:

- ``cpp``   — sequential C++ loop (wav2sleep_tpu/native/src/ema_norm.cpp),
              the fast host path (the reference's Numba role).
- ``numpy`` — pure-Python loop; the executable spec used by the tests.
- ``jax``   — ``lax.lax.scan`` version, jittable/vmappable for on-device
              streaming pipelines (float32).
"""

from __future__ import annotations

from functools import partial
from typing import Union

import numpy as np

from ..settings import (
    CAUSAL_NORM_MIN_SIGMA,
    NORM_OUTLIER_THRESHOLD,
)

ArrayLike = Union[np.ndarray, 'jax.Array']  # noqa: F821


def compute_sampling_freq_from_epoch_samples(
    samples_per_epoch: int, epoch_duration_seconds: float = 30.0
) -> float:
    """Sampling frequency in Hz from samples per (30 s) epoch."""
    return samples_per_epoch / epoch_duration_seconds


def _warmup_stats(
    signal: np.ndarray, sampling_freq: float, baseline_tau: float, tau_seconds: float, min_sigma_sq: float
) -> tuple[float, float, float, float]:
    """Initial mean/variance from the warm-up window plus EMA alphas."""
    dt = 1.0 / sampling_freq
    alpha_baseline = dt / baseline_tau
    alpha_variance = dt / tau_seconds
    warm_up_tau = min(baseline_tau, tau_seconds)
    n_warm = int(warm_up_tau * sampling_freq)
    n_warm = min(n_warm, len(signal) // 10)
    n_warm = max(1, n_warm)
    warm = signal[:n_warm]
    mu_init = float(np.mean(warm))
    sigma_sq_init = max(float(np.var(warm)), min_sigma_sq)
    return alpha_baseline, alpha_variance, mu_init, sigma_sq_init


def _ema_stats_numpy(
    signal: np.ndarray,
    alpha_baseline: float,
    alpha_variance: float,
    mu_init: float,
    sigma_sq_init: float,
    outlier_threshold_sigma: float,
    min_sigma_sq: float,
    eps: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure-Python reference loop (the executable spec)."""
    n = len(signal)
    mu = np.empty(n, dtype=np.float64)
    sigma_sq = np.empty(n, dtype=np.float64)
    outlier = np.zeros(n, dtype=bool)
    mu[0] = mu_init
    sigma_sq[0] = max(sigma_sq_init, min_sigma_sq, eps)
    for t in range(1, n):
        mu[t] = alpha_baseline * signal[t] + (1.0 - alpha_baseline) * mu[t - 1]
        residual = signal[t] - mu[t]
        sigma_prev = np.sqrt(max(sigma_sq[t - 1], min_sigma_sq))
        threshold = outlier_threshold_sigma * sigma_prev
        if abs(residual) > threshold:
            outlier[t] = True
            residual = threshold if residual > 0 else -threshold
        sigma_sq[t] = alpha_variance * residual * residual + (1.0 - alpha_variance) * sigma_sq[t - 1]
    return mu, sigma_sq, outlier


def _ema_stats_cpp(signal_f64, alpha_baseline, alpha_variance, mu_init, sigma_sq_init,
                   outlier_threshold_sigma, min_sigma_sq, eps):
    from .. import native

    lib = native.get_lib()
    if lib is None:
        return None
    n = len(signal_f64)
    mu = np.empty(n, dtype=np.float64)
    sigma_sq = np.empty(n, dtype=np.float64)
    outlier = np.zeros(n, dtype=np.uint8)
    lib.w2s_ema_stats(
        np.ascontiguousarray(signal_f64), n, alpha_baseline, alpha_variance,
        mu_init, sigma_sq_init, outlier_threshold_sigma, min_sigma_sq, eps,
        mu, sigma_sq, outlier,
    )
    return mu, sigma_sq, outlier.astype(bool)


def causal_rolling_normalize(
    signal: ArrayLike,
    sampling_freq: float,
    tau_seconds: float = 900.0,
    eps: float = 1e-6,
    outlier_threshold_sigma: float = NORM_OUTLIER_THRESHOLD,
    return_outlier_mask: bool = False,
    baseline_tau_seconds: float | None = None,
    min_sigma: float = CAUSAL_NORM_MIN_SIGMA,
    backend: str = 'auto',
):
    """Causal EMA z-score normalization of a 1-D signal.

    Matches the reference semantics exactly (normalization.py:106-232):
    output = ``(x - mu_t) / sqrt(max(sigma_sq_t, min_sigma**2))`` with the
    recurrence computed in float64. Input dtype/type is preserved for JAX
    arrays; numpy input returns float64 like the reference.

    Args:
        backend: 'auto' (C++ if available else numpy), 'cpp', 'numpy'.
    """
    is_jax = type(signal).__module__.startswith('jax')
    signal_np = np.asarray(signal)
    if signal_np.ndim != 1:
        raise ValueError(f'Expected 1-D signal, got shape {signal_np.shape}')
    if len(signal_np) == 0:
        mask = np.zeros(0, dtype=bool)
        return (signal, mask) if return_outlier_mask else signal

    baseline_tau = baseline_tau_seconds if baseline_tau_seconds is not None else tau_seconds
    min_sigma_sq = min_sigma * min_sigma
    alpha_b, alpha_v, mu_init, sigma_sq_init = _warmup_stats(
        signal_np, sampling_freq, baseline_tau, tau_seconds, min_sigma_sq
    )
    signal_f64 = signal_np.astype(np.float64)

    stats = None
    if backend in ('auto', 'cpp'):
        stats = _ema_stats_cpp(
            signal_f64, alpha_b, alpha_v, mu_init, sigma_sq_init,
            outlier_threshold_sigma, min_sigma_sq, eps,
        )
        if stats is None and backend == 'cpp':
            raise RuntimeError('C++ backend requested but native library unavailable.')
    if stats is None:
        stats = _ema_stats_numpy(
            signal_f64, alpha_b, alpha_v, mu_init, sigma_sq_init,
            outlier_threshold_sigma, min_sigma_sq, eps,
        )
    mu, sigma_sq, outlier = stats
    sigma = np.sqrt(np.maximum(sigma_sq, min_sigma_sq))
    normalized = (signal_np - mu) / sigma

    if is_jax:
        import jax.numpy as jnp

        result = jnp.asarray(normalized).astype(signal.dtype)
        if return_outlier_mask:
            return result, jnp.asarray(outlier)
        return result
    if return_outlier_mask:
        return normalized, outlier
    return normalized


def causal_rolling_normalize_f32(
    signal: np.ndarray,
    sampling_freq: float,
    tau_seconds: float = 900.0,
    eps: float = 1e-6,
    outlier_threshold_sigma: float = NORM_OUTLIER_THRESHOLD,
    baseline_tau_seconds: float | None = None,
    min_sigma: float = CAUSAL_NORM_MIN_SIGMA,
) -> np.ndarray:
    """Fused float32 variant for the data-loading hot path.

    Routes through ``w2s_ema_normalize_f32`` (native/src/ema_norm.cpp),
    which writes the normalized f32 output directly — no mu/sigma_sq/
    outlier float64 temporaries (three O(n) fresh allocations that hit the
    sandboxed-host ~12 MB/s page-fault tax). The recurrence runs in double
    per sample, so for f32 input the result is bit-identical to
    ``causal_rolling_normalize(...).astype(np.float32)`` (pinned by
    tests/data/test_normalization.py). Falls back to that exact expression
    when the native library is unavailable.
    """
    from .. import native

    signal_np = np.ascontiguousarray(signal, np.float32)
    if signal_np.ndim != 1:
        raise ValueError(f'Expected 1-D signal, got shape {signal_np.shape}')
    lib = native.get_lib()
    if lib is None or len(signal_np) == 0:
        return np.asarray(
            causal_rolling_normalize(
                signal_np, sampling_freq, tau_seconds, eps,
                outlier_threshold_sigma, False, baseline_tau_seconds,
                min_sigma, backend='numpy',
            ),
            dtype=np.float32,
        )
    baseline_tau = baseline_tau_seconds if baseline_tau_seconds is not None else tau_seconds
    min_sigma_sq = min_sigma * min_sigma
    alpha_b, alpha_v, mu_init, sigma_sq_init = _warmup_stats(
        signal_np, sampling_freq, baseline_tau, tau_seconds, min_sigma_sq
    )
    n = len(signal_np)
    out = np.empty(n, np.float32)
    outlier = np.empty(n, np.uint8)
    lib.w2s_ema_normalize_f32(
        signal_np, n, alpha_b, alpha_v, mu_init, sigma_sq_init,
        outlier_threshold_sigma, min_sigma_sq, eps, out, outlier,
    )
    return out


# ---------------------------------------------------------------------------
# JAX (on-device) version — jittable, vmappable over channels/nights.
# ---------------------------------------------------------------------------


def ema_normalize_jax(
    signal,
    sampling_freq: float,
    tau_seconds: float = 900.0,
    eps: float = 1e-6,
    outlier_threshold_sigma: float = NORM_OUTLIER_THRESHOLD,
    baseline_tau_seconds: float | None = None,
    min_sigma: float = CAUSAL_NORM_MIN_SIGMA,
    unroll: int = 8,
):
    """On-device causal EMA normalization via ``lax.scan`` (float32).

    Use ``jax.vmap`` to batch across channels/nights — each lane carries its
    own (mu, sigma_sq) recurrence state, so batching is free parallelism.
    Tolerances vs. the float64 host kernel are ~1e-4 relative.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    signal = jnp.asarray(signal, dtype=jnp.float32)
    n = signal.shape[0]
    baseline_tau = baseline_tau_seconds if baseline_tau_seconds is not None else tau_seconds
    dt = 1.0 / sampling_freq
    alpha_b = jnp.float32(dt / baseline_tau)
    alpha_v = jnp.float32(dt / tau_seconds)
    min_sigma_sq = jnp.float32(min_sigma * min_sigma)

    warm_up_tau = min(baseline_tau, tau_seconds)
    n_warm = max(1, min(int(warm_up_tau * sampling_freq), n // 10))
    warm = signal[:n_warm]
    mu_init = jnp.mean(warm)
    sigma_sq_init = jnp.maximum(jnp.var(warm), min_sigma_sq)
    sigma_sq_init = jnp.maximum(sigma_sq_init, jnp.float32(eps))

    def step(carry, x):
        mu_prev, ss_prev = carry
        mu = alpha_b * x + (1.0 - alpha_b) * mu_prev
        residual = x - mu
        threshold = outlier_threshold_sigma * jnp.sqrt(jnp.maximum(ss_prev, min_sigma_sq))
        residual = jnp.clip(residual, -threshold, threshold)
        ss = alpha_v * residual * residual + (1.0 - alpha_v) * ss_prev
        return (mu, ss), (mu, ss)

    (_, _), (mu, sigma_sq) = lax.scan(step, (mu_init, sigma_sq_init), signal[1:], unroll=unroll)
    mu = jnp.concatenate([mu_init[None], mu])
    sigma_sq = jnp.concatenate([sigma_sq_init[None], sigma_sq])
    sigma = jnp.sqrt(jnp.maximum(sigma_sq, min_sigma_sq))
    return (signal - mu) / sigma
