"""Pallas TPU kernel: causal EMA normalization, vectorized across channels.

The EMA recurrence is non-associative (outlier clipping against the
*previous* sigma — see ops/ema_norm.py), so time must be walked
sequentially. The hardware-fitting axis of parallelism is *channels*: the
kernel lays signals out as ``[T, N]`` with up to 128 channels in VPU lanes,
carries (mu, sigma^2) in VMEM scratch that persists across the sequential
TPU grid, and streams time blocks HBM -> VMEM. One pass normalizes a whole
batch of nights x channels at VPU rate — the on-device analogue of the C++
host kernel (native/src/ema_norm.cpp), used by streaming/causal serving so
raw waveforms never bounce back to the host for normalization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import CAUSAL_NORM_MIN_SIGMA, NORM_OUTLIER_THRESHOLD

LANES = 128


def _ema_kernel(
    x_ref,  # [TB, N] input block
    mu0_ref,  # [1, N] warm-up mean
    ss0_ref,  # [1, N] warm-up variance (floored)
    out_ref,  # [TB, N] normalized output block
    mu_c,  # [1, N] VMEM carry
    ss_c,  # [1, N] VMEM carry
    *,
    alpha_b: float,
    alpha_v: float,
    thr: float,
    min_ss: float,
    block: int,
):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        mu_c[:, :] = mu0_ref[:, :]
        ss_c[:, :] = ss0_ref[:, :]

    UNROLL = 32  # Sequential steps per loop iteration, walked in registers —
    # a per-timestep loop pays ~us of control overhead per 128-lane vector op.

    def body(tb, _):
        base = tb * UNROLL
        tile = x_ref[pl.ds(base, UNROLL), :]  # [U, N] single VMEM read
        mu = mu_c[:, :]
        ss = ss_c[:, :]
        outs = []
        for u in range(UNROLL):
            x = tile[u, :][None, :]
            first = jnp.logical_and(i == 0, base + u == 0)
            mu = jnp.where(first, mu, alpha_b * x + (1.0 - alpha_b) * mu)
            resid = x - mu
            limit = thr * jnp.sqrt(jnp.maximum(ss, min_ss))
            resid = jnp.clip(resid, -limit, limit)
            ss = jnp.where(first, ss, alpha_v * resid * resid + (1.0 - alpha_v) * ss)
            outs.append((x - mu) * lax.rsqrt(jnp.maximum(ss, min_ss)))
        out_ref[pl.ds(base, UNROLL), :] = jnp.concatenate(outs, axis=0)
        mu_c[:, :] = mu
        ss_c[:, :] = ss
        return 0

    lax.fori_loop(0, block // UNROLL, body, 0)


@partial(jax.jit, static_argnames=('sampling_freq', 'tau_seconds', 'baseline_tau_seconds',
                                   'outlier_threshold_sigma', 'min_sigma', 'eps', 'block', 'interpret'))
def ema_normalize_pallas(
    x_NT: jnp.ndarray,
    sampling_freq: float,
    tau_seconds: float = 900.0,
    baseline_tau_seconds: float | None = None,
    outlier_threshold_sigma: float = NORM_OUTLIER_THRESHOLD,
    min_sigma: float = CAUSAL_NORM_MIN_SIGMA,
    eps: float = 1e-6,
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal EMA-normalize a batch of channels ``[N, T]`` on-device.

    All channels share one sampling rate (call per modality; vmap-free —
    lanes are the batch axis). float32; tolerances vs. the float64 host
    kernel are ~1e-3 relative over 10-hour signals.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if block % 32 != 0 or block <= 0:
        # The kernel walks each tile in UNROLL=32-step register chunks; a
        # non-multiple block would silently skip the remainder rows
        # (uninitialized VMEM output AND a corrupted EMA carry).
        raise ValueError(f'{block=} must be a positive multiple of 32.')
    if not interpret and jax.default_backend() == 'cpu':
        interpret = True  # CPU has no Mosaic; fall back to the interpreter.
    if x_NT.ndim == 1:
        return ema_normalize_pallas(
            x_NT[None], sampling_freq, tau_seconds, baseline_tau_seconds,
            outlier_threshold_sigma, min_sigma, eps, block, interpret,
        )[0]
    N, T = x_NT.shape
    baseline_tau = baseline_tau_seconds if baseline_tau_seconds is not None else tau_seconds
    dt = 1.0 / sampling_freq
    alpha_b = dt / baseline_tau
    alpha_v = dt / tau_seconds
    min_ss = min_sigma * min_sigma

    # Warm-up statistics (XLA reductions; matches ops/ema_norm._warmup_stats).
    warm_up_tau = min(baseline_tau, tau_seconds)
    n_warm = max(1, min(int(warm_up_tau * sampling_freq), T // 10))
    warm = x_NT[:, :n_warm].astype(jnp.float32)
    mu0 = jnp.mean(warm, axis=1)
    ss0 = jnp.maximum(jnp.var(warm, axis=1), min_ss)
    ss0 = jnp.maximum(ss0, eps)

    # Pad channels to the 128-lane width and time to a block multiple.
    N_pad = max(int(np.ceil(N / LANES)) * LANES, LANES)
    T_pad = int(np.ceil(T / block)) * block
    x = jnp.zeros((T_pad, N_pad), jnp.float32)
    x = x.at[:T, :N].set(x_NT.T.astype(jnp.float32))
    mu0_p = jnp.zeros((1, N_pad), jnp.float32).at[0, :N].set(mu0)
    ss0_p = jnp.ones((1, N_pad), jnp.float32).at[0, :N].set(ss0)

    kernel = partial(
        _ema_kernel,
        alpha_b=float(alpha_b),
        alpha_v=float(alpha_v),
        thr=float(outlier_threshold_sigma),
        min_ss=float(min_ss),
        block=block,
    )
    out = pl.pallas_call(
        kernel,
        grid=(T_pad // block,),
        in_specs=[
            pl.BlockSpec((block, N_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, N_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, N_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, N_pad), jnp.float32),
            pltpu.VMEM((1, N_pad), jnp.float32),
        ],
        interpret=interpret,
    )(x, mu0_p, ss0_p)
    return out[:T, :N].T
