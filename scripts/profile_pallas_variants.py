#!/usr/bin/env python
"""Bisect the Pallas sd-conv kernel cost: which part of the kernel makes it
6x slower than im2col instead of 3x faster? Times stripped-down variants
at the hot shape (B=8, L=1.2M, C=16 -> blocks [8, 153600, 128] bf16)."""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--tb', type=int, default=2048)
    parser.add_argument('--k', type=int, default=5)
    parser.add_argument('--reps', type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update('jax_compilation_cache_dir', os.path.join(REPO, '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    B, nb, D = 8, 153_600, 128
    TB = args.tb
    nT = nb // TB
    rng = np.random.default_rng(0)
    xb = jax.device_put(jnp.asarray(rng.normal(size=(B, nb, D)), jnp.bfloat16))
    W = jax.device_put(jnp.asarray(rng.normal(size=(3, D, D)) * 0.1, jnp.bfloat16))

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

    results = {'shape': f'B={B} nb={nb} D={D} TB={TB} bf16'}

    def call(kernel_fn, n_w, **kw):
        return pl.pallas_call(
            kernel_fn,
            grid=(B, nT),
            in_specs=[
                pl.BlockSpec((1, TB, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                *[
                    pl.BlockSpec((D, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
                    for _ in range(n_w)
                ],
            ],
            out_specs=pl.BlockSpec((1, TB, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nb, D), jnp.bfloat16),
            **kw,
        )

    # v0: pure copy through VMEM (pipeline floor).
    def k_copy(x_ref, y_ref):
        y_ref[0] = x_ref[0]

    results['copy_ms'] = round(timeit(jax.jit(lambda v: call(k_copy, 0)(v)), xb) * 1000, 2)

    # v2: ONE matmul, f32 accumulate + cast.
    def k_mm1f(x_ref, w_ref, y_ref):
        y_ref[0] = jnp.dot(x_ref[0], w_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    results['mm1_f32acc_ms'] = round(
        timeit(jax.jit(lambda v, w: call(k_mm1f, 1)(v, w)), xb, W[0]) * 1000, 2
    )

    # v3: THREE matmuls summed, f32 acc (no shifts/boundaries).
    def k_mm3(x_ref, w0_ref, w1_ref, w2_ref, y_ref):
        xt = x_ref[0]
        o = jnp.dot(xt, w0_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(xt, w1_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(xt, w2_ref[:], preferred_element_type=jnp.float32)
        y_ref[0] = o.astype(jnp.bfloat16)

    results['mm3_ms'] = round(
        timeit(jax.jit(lambda v, w: call(k_mm3, 3)(v, w[0], w[1], w[2])), xb, W) * 1000, 2
    )

    # v4: three matmuls + sublane-shifted adds via concatenate (the real thing
    # minus boundary rows).
    def k_mm3s(x_ref, w0_ref, w1_ref, w2_ref, y_ref):
        xt = x_ref[0]
        o = jnp.dot(xt, w1_ref[:], preferred_element_type=jnp.float32)
        a = jnp.dot(xt, w0_ref[:], preferred_element_type=jnp.float32)
        c = jnp.dot(xt, w2_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.concatenate([a[:1] * 0, a[:-1]], axis=0)
        o = o + jnp.concatenate([c[1:], c[:1] * 0], axis=0)
        y_ref[0] = o.astype(jnp.bfloat16)

    results['mm3_shift_ms'] = round(
        timeit(jax.jit(lambda v, w: call(k_mm3s, 3)(v, w[0], w[1], w[2])), xb, W) * 1000, 2
    )

    # v5: v3 with parallel dimension semantics.
    params = pltpu.CompilerParams(dimension_semantics=('parallel', 'arbitrary'))
    results['mm3_parsem_ms'] = round(
        timeit(
            jax.jit(lambda v, w: call(k_mm3, 3, compiler_params=params)(v, w[0], w[1], w[2])),
            xb,
            W,
        )
        * 1000,
        2,
    )

    # v7: complete/correct formulation — boundary rows as 3-D blocked inputs,
    # shifts built on the bf16 INPUT side (one concat per neighbor matmul).
    xprev3 = jax.device_put(jnp.zeros((B, nT * 8, D), jnp.bfloat16))
    xnext3 = jax.device_put(jnp.zeros((B, nT * 8, D), jnp.bfloat16))

    def k_v7(x_ref, xp_ref, xn_ref, w0_ref, w1_ref, w2_ref, y_ref):
        xt = x_ref[0]
        xm1 = jnp.concatenate([xp_ref[0, 0:1], xt[:-1]], axis=0)
        xp1 = jnp.concatenate([xt[1:], xn_ref[0, 0:1]], axis=0)
        o = jnp.dot(xm1, w0_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(xt, w1_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(xp1, w2_ref[:], preferred_element_type=jnp.float32)
        y_ref[0] = o.astype(jnp.bfloat16)

    def call_v7(**kw):
        return pl.pallas_call(
            k_v7,
            grid=(B, nT),
            in_specs=[
                pl.BlockSpec((1, TB, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                *[
                    pl.BlockSpec((D, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
                    for _ in range(3)
                ],
            ],
            out_specs=pl.BlockSpec((1, TB, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nb, D), jnp.bfloat16),
            **kw,
        )

    results['v7_full_ms'] = round(
        timeit(jax.jit(lambda v, p, n, w: call_v7()(v, p, n, w[0], w[1], w[2])), xb, xprev3, xnext3, W)
        * 1000,
        2,
    )
    params7 = pltpu.CompilerParams(dimension_semantics=('parallel', 'arbitrary'))
    results['v7_parsem_ms'] = round(
        timeit(
            jax.jit(lambda v, p, n, w: call_v7(compiler_params=params7)(v, p, n, w[0], w[1], w[2])),
            xb, xprev3, xnext3, W,
        )
        * 1000,
        2,
    )

    print(json.dumps(results))


if __name__ == '__main__':
    main()
