#!/usr/bin/env python
"""Micro-benchmarks for the encoder-front ops (the hot 72 ms of the ECG
encoder): conv / instance-norm / gelu in isolation and fused, at the
block-0/1 shapes. Decides where a custom (Pallas) kernel can actually win:
if the stage is HBM-bound on activation traffic, only FUSION helps; if it
is lane-utilization-bound, layouts/kernels help.

Prints one JSON line of ms-per-op (marginal-K, terminal-fetch timing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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
    from jax import lax

    jax.config.update('jax_compilation_cache_dir', os.path.join(REPO, '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from wav2sleep_tpu.models.layers import _conv_mxu_friendly

    B, L, C = args.batch, args.length, args.channels
    dt = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.normal(size=(B, L, C)), dt))
    w = jax.device_put(jnp.asarray(rng.normal(size=(3, C, C)) * 0.1, dt))

    def sync(o):
        # Terminal D2H fetch of ONE element (fetching the whole activation
        # would move hundreds of MB and swamp the measurement).
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(leaf.ravel()[0])

    def timeit(fn, *fargs) -> float:
        sync(fn(*fargs))  # compile + warm

        def chain(k):
            t0 = time.time()
            o = None
            for _ in range(k):
                o = fn(*fargs)
            sync(o)
            return time.time() - t0

        chain(1)
        return float(np.median([(chain(args.k) - chain(1)) / (args.k - 1) for _ in range(args.reps)]))

    results = {'shape': f'B={B} L={L} C={C} {args.dtype}'}

    # 1. copy bound: pure read+write of the activation.
    results['copy_ms'] = round(timeit(jax.jit(lambda v: v + jnp.asarray(1.0, dt)), x) * 1000, 2)

    # 2. conv alone (current im2col fast path).
    conv = jax.jit(lambda v, k_: _conv_mxu_friendly(v, k_, 1, (1, 1)))
    results['conv_im2col_ms'] = round(timeit(conv, x, w) * 1000, 2)

    # 2b. conv alone, native XLA lowering.
    conv_native = jax.jit(
        lambda v, k_: lax.conv_general_dilated(
            v, k_, (1,), ((1, 1),), dimension_numbers=('NHC', 'HIO', 'NHC')
        )
    )
    results['conv_native_ms'] = round(timeit(conv_native, x, w) * 1000, 2)

    # 3. instance norm alone (stats over T per (B, C), eps 1e-2).
    def inorm(v):
        mu = jnp.mean(v.astype(jnp.float32), axis=1, keepdims=True)
        var = jnp.mean(jnp.square(v.astype(jnp.float32) - mu), axis=1, keepdims=True)
        return ((v.astype(jnp.float32) - mu) * lax.rsqrt(var + 1e-2)).astype(v.dtype)

    results['instance_norm_ms'] = round(timeit(jax.jit(inorm), x) * 1000, 2)

    # 4. gelu alone.
    results['gelu_ms'] = round(timeit(jax.jit(jax.nn.gelu), x) * 1000, 2)

    # 5. conv + norm + gelu fused under one jit (XLA's best effort).
    layer = jax.jit(lambda v, k_: jax.nn.gelu(inorm(_conv_mxu_friendly(v, k_, 1, (1, 1)))))
    results['layer_fused_ms'] = round(timeit(layer, x, w) * 1000, 2)

    # 6. three layers chained (one conv block sans stride/residual).
    block = jax.jit(
        lambda v, k_: jax.nn.gelu(
            inorm(
                _conv_mxu_friendly(
                    jax.nn.gelu(inorm(_conv_mxu_friendly(v, k_, 1, (1, 1)))), k_, 1, (1, 1)
                )
            )
        )
    )
    results['two_layers_ms'] = round(timeit(block, x, w) * 1000, 2)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
