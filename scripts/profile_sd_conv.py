#!/usr/bin/env python
"""Space-to-depth conv formulations for the encoder-front k3 convs.

A k3 conv at C in {16,32,64} wastes the MXU (K=3C, N=C << 128). Packing
r = 128//C consecutive samples into the feature dim gives x' [B, L/r, 128];
the conv becomes out' = x'_{t-1} @ W_m1 + x' @ W_0 + x'_{t+1} @ W_p1 with
three dense 128x128 weights (block-banded embeddings of the 3xCxC kernel) —
full MXU contraction/output utilization at 8/r x the true FLOPs.

Variants timed here (B=8, L=1.2M, C=16, bf16):
  im2col      — current production path (materializes [B,L,3C] in HBM)
  sd3mm       — 3 matmuls on shifted views + add (XLA decides fusion)
  sd3mm_gelu  — same + fused bias/gelu (the full ConvLayer minus norm)
Parity is asserted against the im2col path before timing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_sd_weights(kernel: np.ndarray, r: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Embed a k3 conv kernel [3, C, C] into three [rC, rC] block-banded
    matrices (W_m1, W_0, W_p1) acting on r-sample feature blocks."""
    k, Ci, Co = kernel.shape
    assert k == 3
    D_in, D_out = r * Ci, r * Co
    Wm1 = np.zeros((D_in, D_out), kernel.dtype)
    W0 = np.zeros((D_in, D_out), kernel.dtype)
    Wp1 = np.zeros((D_in, D_out), kernel.dtype)
    # Output sample s (0..r-1) within a block at block index t' is global
    # sample r*t' + s; conv taps j=0,1,2 read global input sample
    # r*t' + s + j - 1, i.e. block offset q = s + j - 1 (in [-1, r]).
    for s in range(r):
        for j in range(3):
            q = s + j - 1
            if q < 0:
                Wm1[(q + r) * Ci:(q + r + 1) * Ci, s * Co:(s + 1) * Co] = kernel[j]
            elif q >= r:
                Wp1[(q - r) * Ci:(q - r + 1) * Ci, s * Co:(s + 1) * Co] = kernel[j]
            else:
                W0[q * Ci:(q + 1) * Ci, s * Co:(s + 1) * Co] = kernel[j]
    return Wm1, W0, Wp1


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--length', type=int, default=1_228_800)
    parser.add_argument('--channels', type=int, default=16)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--k', type=int, default=5)
    parser.add_argument('--reps', type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', os.path.join(REPO, '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from wav2sleep_tpu.models.layers import _conv_mxu_friendly

    B, L, C = args.batch, args.length, args.channels
    r = 128 // C
    nb = L // r
    dt = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(B, L, C)).astype(np.float32)
    w_np = (rng.normal(size=(3, C, C)) * 0.1).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np, dt))
    w = jax.device_put(jnp.asarray(w_np, dt))
    Wm1, W0, Wp1 = (jax.device_put(jnp.asarray(m, dt)) for m in make_sd_weights(w_np, r))

    def sd3mm(v, wm1, w0, wp1):
        xb = v.reshape(B, nb, r * C)
        z = jnp.zeros((B, 1, r * C), v.dtype)
        xm1 = jnp.concatenate([z, xb[:, :-1]], axis=1)
        xp1 = jnp.concatenate([xb[:, 1:], z], axis=1)
        out = xm1 @ wm1 + xb @ w0 + xp1 @ wp1
        return out.reshape(B, L, C)

    def sd3mm_gelu(v, wm1, w0, wp1):
        return jax.nn.gelu(sd3mm(v, wm1, w0, wp1))

    f_im2col = jax.jit(lambda v, kk: _conv_mxu_friendly(v, kk, 1, (1, 1)))
    f_sd = jax.jit(sd3mm)
    f_sd_g = jax.jit(sd3mm_gelu)

    # Parity check (f32 on small input, CPU-free: same device, highest prec).
    xs = jnp.asarray(x_np[:1, : 4 * r * C], jnp.float32).reshape(1, -1, C)
    Wm1f, W0f, Wp1f = (jnp.asarray(m, jnp.float32) for m in make_sd_weights(w_np, r))
    ref = _conv_mxu_friendly(xs, jnp.asarray(w_np, jnp.float32), 1, (1, 1))
    Bs, Ls = 1, xs.shape[1]

    def sd_small(v):
        xb = v.reshape(Bs, Ls // r, r * C)
        z = jnp.zeros((Bs, 1, r * C), v.dtype)
        xm1 = jnp.concatenate([z, xb[:, :-1]], axis=1)
        xp1 = jnp.concatenate([xb[:, 1:], z], axis=1)
        return (xm1 @ Wm1f + xb @ W0f + xp1 @ Wp1f).reshape(Bs, Ls, C)

    got = sd_small(xs)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 1e-3, f'space-to-depth parity failed: max err {err}'

    def sync(o):
        float(o.ravel()[0])

    def timeit(fn, *fargs) -> float:
        sync(fn(*fargs))

        def chain(k):
            t0 = time.time()
            o = None
            for _ in range(k):
                o = fn(*fargs)
            sync(o)
            return time.time() - t0

        chain(1)
        return float(np.median([(chain(args.k) - chain(1)) / (args.k - 1) for _ in range(args.reps)]))

    # Pallas kernel: forward, and a conv3(s2)-after-conv2 chain.
    from wav2sleep_tpu.ops import pallas_conv

    bias0 = jax.device_put(jnp.zeros((C,), dt))
    f_pallas = jax.jit(lambda v, kk, bb: pallas_conv.sd_conv(v, kk, bb, 1))
    got_p = np.asarray(f_pallas(x, w, bias0)[0, :4096].astype(jnp.float32))
    want_p = np.asarray(f_im2col(x, w)[0, :4096].astype(jnp.float32))
    perr = float(np.max(np.abs(got_p - want_p)))

    f_pallas_s2 = jax.jit(lambda v, kk, bb: pallas_conv.sd_conv(v, kk, bb, 2))

    out = {
        'shape': f'B={B} L={L} C={C} r={r} {args.dtype}',
        'parity_max_err': err,
        'pallas_vs_im2col_max_err': perr,
        'im2col_ms': round(timeit(f_im2col, x, w) * 1000, 2),
        'sd3mm_ms': round(timeit(f_sd, x, Wm1, W0, Wp1) * 1000, 2),
        'pallas_ms': round(timeit(f_pallas, x, w, bias0) * 1000, 2),
        'pallas_s2_ms': round(timeit(f_pallas_s2, x, w, bias0) * 1000, 2),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
