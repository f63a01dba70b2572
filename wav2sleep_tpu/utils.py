"""Seeds and multi-host (rank-zero) helpers.

Equivalent of reference src/wav2sleep/utils.py:12-46, translated to JAX's
multi-process model: 'rank zero' is ``jax.process_index() == 0`` (one process
per TPU-VM host).
"""

from __future__ import annotations

import functools
import queue
import random

import numpy as np


def is_rank_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def rank_zero_only(fn):
    """Run ``fn`` only on process 0 (logging / artifact writes)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if is_rank_zero():
            return fn(*args, **kwargs)
        return None

    return wrapped


def fix_seeds(seed: int = 42):
    """Seed numpy/python RNGs and return the root JAX PRNG key.

    JAX randomness is explicit (keys thread through the program), so unlike
    the reference there is no global framework state to pin beyond numpy and
    ``random`` (used by host-side shuffling).
    """
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def stop_aware_put(q, stop, item, poll: float = 0.2) -> bool:
    """Bounded-queue put that aborts when ``stop`` is set.

    Shared by the producer threads in pipeline._stream and
    data.dataset.batch_iterator: an abandoned generator (consumer breaks
    early) must release a producer blocked on the bounded queue instead of
    deadlocking it. Returns False when aborted.
    """
    while not stop.is_set():
        try:
            q.put(item, timeout=poll)
            return True
        except queue.Full:
            continue
    return False
