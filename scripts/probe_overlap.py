#!/usr/bin/env python
"""Probe: does H2D transfer overlap device compute on this runtime?

Times three protocols over K steps of the flagship train step:
  serial   — fetch step-i metrics, then device_put batch i+1 (the old
             Trainer.train_epoch order: transfer happens while device idle),
  overlap  — device_put batch i+1 right after dispatching step i, fetch
             metrics afterwards (transfer races execution),
  compute  — operands resident, per-step fetch (lower bound).

Prints one JSON line with ms/step for each.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax

    jax.config.update('jax_compilation_cache_dir', os.path.join(REPO, '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import ml_dtypes

    from __graft_entry__ import _example_batch, _flagship_model
    from wav2sleep_tpu.train.masker import SignalMasker
    from wav2sleep_tpu.train.scheduler import exp_warmup_schedule
    from wav2sleep_tpu.train.step import init_train_state, make_optimizer, make_train_step

    B, S, K = 4, 1200, 8
    model, _ = _flagship_model(feature_dim=128)
    x, y = _example_batch(B=B, S=S)
    x = {k: v.astype(ml_dtypes.bfloat16) for k, v in x.items()}
    tx = make_optimizer(exp_warmup_schedule(1e-3, 2000, 10000), weight_decay=1e-4, grad_clip=1.0)
    state = init_train_state(model, tx, x, jax.random.PRNGKey(0), ema=True)
    masker = SignalMasker(dropouts={'ABD': 0.7, 'THX': 0.7, 'ECG': 0.5, 'PPG': 0.1}, backups=['ECG', 'PPG'])
    train_step = make_train_step(
        model, tx, num_classes=4, masker=masker, flip_polarity=True,
        ema_decay=0.9999, ema_start_step=2000, compute_dtype=ml_dtypes.bfloat16,
    )
    step = jax.jit(train_step)
    rng = jax.random.PRNGKey(1)

    # Two host slot pairs, page-warmed (the Trainer's pooled-buffer protocol).
    slots = [
        {k: np.array(v) for k, v in x.items()},
        {k: np.array(v) for k, v in x.items()},
    ]
    ys = np.asarray(y)

    st, m = step(state, (jax.device_put(slots[0]), jax.device_put(ys)), rng)
    float(m['loss'])  # compile+warm

    def serial() -> float:
        t0 = time.time()
        s = state
        for i in range(K):
            dev = (jax.device_put(slots[i % 2]), jax.device_put(ys))
            s, m = step(s, dev, rng)
            float(m['loss'])
        return (time.time() - t0) / K

    def overlap() -> float:
        t0 = time.time()
        s = state
        dev = (jax.device_put(slots[0]), jax.device_put(ys))
        for i in range(K):
            s, m = step(s, dev, rng)
            if i + 1 < K:
                dev = (jax.device_put(slots[(i + 1) % 2]), jax.device_put(ys))
            float(m['loss'])
        return (time.time() - t0) / K

    def compute() -> float:
        dev = (jax.device_put(slots[0]), jax.device_put(ys))
        t0 = time.time()
        s = state
        for _ in range(K):
            s, m = step(s, dev, rng)
            float(m['loss'])
        return (time.time() - t0) / K

    # Deferred-fetch protocols: dispatch steps without fetching metrics
    # (device refs held; one drain at the end), R-deep slot ring with a
    # block-until-ready on the transfer staged R batches ago before reuse —
    # the candidate production protocol for closing the transfer gap.
    ring = [{k: np.array(v) for k, v in x.items()} for _ in range(8)]

    def deferred(R: int) -> float:
        t0 = time.time()
        s = state
        pend: list = []
        inflight: list = [None] * R
        for i in range(K):
            j = i % R
            if inflight[j] is not None:
                jax.block_until_ready(inflight[j])
            dev = (jax.device_put(ring[j]), jax.device_put(ys))
            inflight[j] = dev
            s, m = step(s, dev, rng)
            pend.append(m['loss'])
        for p in pend:
            float(p)
        return (time.time() - t0) / K

    def xfer_only() -> float:
        t0 = time.time()
        prev = None
        for i in range(K):
            if prev is not None:
                jax.block_until_ready(prev)
            prev = jax.device_put(ring[i % 8])
        jax.block_until_ready(prev)
        return (time.time() - t0) / K

    protocols = {
        'serial_ms': serial,
        'overlap_ms': overlap,
        'compute_ms': compute,
        'deferred2_ms': lambda: deferred(2),
        'deferred4_ms': lambda: deferred(4),
        'xfer_ms': xfer_only,
    }
    for f in protocols.values():
        f()  # warm each protocol once
    out = {
        name: round(float(np.median([f() for _ in range(3)])) * 1000, 1)
        for name, f in protocols.items()
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
