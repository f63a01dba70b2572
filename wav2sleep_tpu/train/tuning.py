"""Batch-size auto-tuning (the Lightning Tuner power-scaling role,
reference scripts/train.py:49-57).

Probes doubling global batch sizes by compiling + executing one train step
with synthetic data until the device runs out of HBM, then returns the last
size that fit. Single-trace probes: each size costs one compile.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


def tune_batch_size(
    model,
    columns: list[str],
    num_classes: int = 4,
    epochs_per_night: int = 1200,
    start: int = 4,
    max_batch: int = 512,
    family: str = 'wav2sleep',
    ema: bool = False,
    grad_accum: bool = False,
    ema_pending_trees: int = 0,
) -> int:
    """Largest power-of-two batch whose train step fits on one device.

    The probe step must carry the same param-sized state trees as the REAL
    training step, or a size that just fits the probe OOMs on the first
    real step: ``grad_accum=True`` wraps the optimizer in
    ``optax.MultiSteps`` (one acc_grads tree — its size is independent of
    the accumulation count, which is only computed after tuning) and
    ``ema=True`` adds the in-graph EMA tree. ``ema_pending_trees`` models
    the CPU-offloaded EMA instead: its deferred fold pins up to
    ``max(2, stage_ring)`` param-tree snapshots (plus the in-flight one)
    on device between drains (loop._enqueue_host_ema), HBM the probe must
    hold live across the step. Polarity flip and the masker are
    elementwise (no persistent state) and are left off."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..settings import COLS_TO_SAMPLES_PER_EPOCH
    from .step import init_train_state, make_optimizer, make_train_step

    tx = make_optimizer(1e-3)
    if grad_accum:
        tx = optax.MultiSteps(tx, every_k_schedule=2)
    rng = jax.random.PRNGKey(0)

    def make_batch(b: int):
        x = {
            c: jnp.zeros((b, COLS_TO_SAMPLES_PER_EPOCH[c] * epochs_per_night), jnp.float32)
            for c in columns
        }
        y = jnp.zeros((b, epochs_per_night), jnp.float32)
        return x, y

    best = 0
    b = start
    while b <= max_batch:
        try:
            x, y = make_batch(b)
            state = init_train_state(model, tx, x, rng, family=family, ema=ema)
            # Offloaded-EMA snapshot ring: these trees stay live ACROSS the
            # step (they are drained asynchronously in the real loop).
            copy = jax.jit(lambda p: jax.tree_util.tree_map(jnp.copy, p))
            pending = [copy(state.params) for _ in range(ema_pending_trees)]
            step = jax.jit(
                make_train_step(
                    model, tx, num_classes, flip_polarity=False, family=family,
                    **({'ema_decay': 0.999} if ema else {}),
                )
            )
            state, metrics = step(state, (x, y), rng)
            jax.block_until_ready(metrics['loss'])
            del state, metrics, pending
            logger.info(f'batch {b}: OK')
            best = b
            b *= 2
        except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED etc.
            if 'RESOURCE_EXHAUSTED' in str(e) or 'out of memory' in str(e).lower():
                logger.info(f'batch {b}: OOM — settling on {best}.')
                break
            raise
    return best
