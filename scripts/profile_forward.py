#!/usr/bin/env python
"""Per-stage timing of the flagship forward (and optionally the train step).

Times, with the marginal-K method and a terminal D2H fetch (see
docs/design.md "Measurement methodology"):
  - each per-signal encoder alone (ECG/PPG at 1024 spe, ABD/THX at 256),
  - the epoch mixer (set attention over <=7 tokens x B*S epochs),
  - the sequence mixer (dilated convs over S),
  - the full forward,
so kernel work can be aimed at the stage that actually dominates.

Prints one JSON line.
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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--epochs-per-night', type=int, default=1200)
    parser.add_argument('--feature-dim', type=int, default=128)
    parser.add_argument('--precision', default='bfloat16', choices=['float32', 'bfloat16'])
    parser.add_argument('--k', type=int, default=5, help='chained steps for the marginal timing (>= 2)')
    parser.add_argument('--reps', type=int, default=3)
    args = parser.parse_args()
    if args.k < 2:
        parser.error('--k must be >= 2 (marginal timing divides by k - 1)')

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', os.path.join(REPO, '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from __graft_entry__ import _example_batch, _flagship_model

    model, _ = _flagship_model(feature_dim=args.feature_dim)
    B, S = args.batch, args.epochs_per_night
    x, _ = _example_batch(B=B, S=S)
    dtype = jnp.bfloat16 if args.precision == 'bfloat16' else jnp.float32
    x = {k: jnp.asarray(v, dtype) for k, v in x.items()}

    variables = model.init(jax.random.PRNGKey(0), {k: np.zeros((1, 2048 if k in ('ECG', 'PPG') else 512), np.float32) for k in x})
    if args.precision == 'bfloat16':
        variables = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), variables)
    variables = jax.device_put(variables)
    x = jax.device_put(x)

    encoders = model.signal_encoders

    def timeit(fn, *fargs) -> float:
        out = fn(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0])  # compile+sync

        def chain(k):
            t0 = time.time()
            o = None
            for _ in range(k):
                o = fn(*fargs)
            np.asarray(jax.tree_util.tree_leaves(o)[0][0])
            return time.time() - t0

        chain(1)
        return float(np.median([(chain(args.k) - chain(1)) / (args.k - 1) for _ in range(args.reps)]))

    results = {}

    def enc_method(m, xi):
        return m.signal_encoders(xi, train=False)

    def mix_method(m, zi):
        return m.epoch_mixer(zi, train=False)

    def seq_method(m, ei):
        return m.sequence_mixer(ei, train=False)

    # Stage 1: each encoder alone (apply SignalEncoders on a single signal).
    for sig in x:
        fn = jax.jit(lambda v, xx: model.apply(v, xx, method=enc_method))
        results[f'encoder_{sig}_ms'] = round(timeit(fn, variables, {sig: x[sig]}) * 1000, 2)

    # Stage 1 all: the full encoder bank.
    fn_enc = jax.jit(lambda v, xx: model.apply(v, xx, method=enc_method))
    results['encoders_all_ms'] = round(timeit(fn_enc, variables, x) * 1000, 2)
    z = jax.block_until_ready(fn_enc(variables, x))

    # Stage 2: epoch mixer on the encoder output.
    fn_mix = jax.jit(lambda v, zz: model.apply(v, zz, method=mix_method))
    results['epoch_mixer_ms'] = round(timeit(fn_mix, variables, z) * 1000, 2)
    e = jax.block_until_ready(fn_mix(variables, z))

    # Stage 3: sequence mixer.
    fn_seq = jax.jit(lambda v, ee: model.apply(v, ee, method=seq_method))
    results['sequence_mixer_ms'] = round(timeit(fn_seq, variables, e) * 1000, 2)

    # Full forward.
    fn_full = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    results['full_forward_ms'] = round(timeit(fn_full, variables, x) * 1000, 2)

    print(json.dumps({'metric': f'forward stages (B={B}, S={S}, {args.precision})', **results}))


if __name__ == '__main__':
    main()
