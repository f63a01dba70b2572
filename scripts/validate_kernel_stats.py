#!/usr/bin/env python
"""TPU validation of the in-kernel stats chain (WAV2SLEEP_KERNEL_STATS).

The sd convs can emit their output's instance-norm (mu, 1/sqrt(var+eps))
from VMEM (ops/pallas_conv.py `_conv_stats_kernel`), replacing the two-pass
`block_stats` HBM reads. The chain is interpreter-verified in-suite; this
script is the REAL-HARDWARE gate for flipping the default ON — one process,
one tunnel hold:

  1. Mosaic-compile the flagship forward with the stats chain ON.
  2. Parity: forward logits ON vs OFF (same params/inputs, bf16).
  3. Marginal-K timing of forward ON vs OFF.
  4. Same for the full jitted train step (compute only, q8 transport).

Prints progress lines + one final JSON line.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def log(msg):
    print(f'[{time.strftime("%H:%M:%S")}] {msg}', flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', os.path.join(REPO, '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    log(f'backend={jax.default_backend()} devices={jax.devices()}')

    from __graft_entry__ import _example_batch, _flagship_model
    from wav2sleep_tpu.ops import block_domain
    from wav2sleep_tpu.ops.q8_transport import encode_batch
    from wav2sleep_tpu.train.masker import SignalMasker
    from wav2sleep_tpu.train.scheduler import exp_warmup_schedule
    from wav2sleep_tpu.train.step import init_train_state, make_optimizer, make_train_step

    results = {}

    # ---------------- Forward parity + timing (B=8, bf16) ----------------
    model, _ = _flagship_model(feature_dim=128)
    B, S = 8, 1200
    x, _ = _example_batch(B=B, S=S)
    x = {k: jnp.asarray(v, jnp.bfloat16) for k, v in x.items()}
    variables = model.init(
        jax.random.PRNGKey(0),
        {k: np.zeros((1, 2048 if k in ('ECG', 'PPG') else 512), np.float32) for k in x})
    variables = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), variables)
    variables = jax.device_put(variables)
    x = jax.device_put(x)

    def timeit(fn, *fargs, k=5, reps=3):
        o = fn(*fargs)
        np.asarray(jax.tree_util.tree_leaves(o)[0][0])

        def chain(n):
            t0 = time.time()
            oo = None
            for _ in range(n):
                oo = fn(*fargs)
            np.asarray(jax.tree_util.tree_leaves(oo)[0][0])
            return time.time() - t0

        chain(1)
        return float(np.median([(chain(k) - chain(1)) / (k - 1) for _ in range(reps)]))

    outs = {}
    for mode, flag in (('on', True), ('off', False)):
        block_domain.KERNEL_STATS = flag
        log(f'compiling forward stats {mode}...')
        fn = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
        t0 = time.time()
        outs[mode] = np.asarray(jax.device_get(fn(variables, x)), np.float32)
        log(f'{mode} compile+run: {time.time()-t0:.1f}s')
        results[f'forward_{mode}_ms'] = round(timeit(fn, variables, x) * 1000, 2)
        log(f'forward {mode}: {results[f"forward_{mode}_ms"]} ms')

    diff = float(np.max(np.abs(outs['on'] - outs['off'])))
    results['logit_max_abs_diff'] = diff
    results['logit_max_abs'] = float(np.max(np.abs(outs['off'])))
    log(f'parity: max|on-off| = {diff:.3e} (max|logit| {results["logit_max_abs"]:.3f})')

    # ---------------- Train step compute (B=4, q8 transport) ----------------
    B, S = 4, 1200
    raw_x, y = _example_batch(B=B, S=S)
    xq = encode_batch(raw_x)
    tx = make_optimizer(exp_warmup_schedule(1e-3, 2000, 10000), weight_decay=1e-4, grad_clip=1.0)
    masker = SignalMasker(
        dropouts={'ABD': 0.7, 'THX': 0.7, 'ECG': 0.5, 'PPG': 0.1}, backups=['ECG', 'PPG'])
    rng = jax.random.PRNGKey(1)
    dev_x = jax.device_put(xq)
    dev_y = jax.device_put(y)

    for mode, flag in (('on', True), ('off', False)):
        block_domain.KERNEL_STATS = flag
        state = init_train_state(model, tx, xq, jax.random.PRNGKey(0), ema=True)
        train_step = make_train_step(
            model, tx, num_classes=4, masker=masker, flip_polarity=True,
            ema_decay=0.9999, ema_start_step=2000, compute_dtype=jnp.bfloat16)
        step = jax.jit(train_step)
        log(f'compiling train step stats {mode}...')
        t0 = time.time()
        st, metrics = step(state, (dev_x, dev_y), rng)
        loss = float(metrics['loss'])
        log(f'{mode} train compile+run: {time.time()-t0:.1f}s loss={loss:.4f}')
        results[f'train_loss_{mode}'] = loss

        def chain(k):
            t0 = time.time()
            s, m = state, None
            for _ in range(k):
                s, m = step(s, (dev_x, dev_y), rng)
            float(m['loss'])
            return time.time() - t0

        chain(1)
        results[f'train_compute_{mode}_ms'] = round(
            float(np.median([(chain(5) - chain(1)) / 4 for _ in range(3)])) * 1000, 1)
        log(f'train compute {mode}: {results[f"train_compute_{mode}_ms"]} ms')

    results['metric'] = 'kernel-stats TPU validation (fwd B=8 / train B=4, bf16, q8)'
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
