"""Seeds and multi-host (rank-zero) helpers.

Equivalent of reference src/wav2sleep/utils.py:12-46, translated to JAX's
multi-process model: 'rank zero' is ``jax.process_index() == 0`` (one process
per TPU-VM host).
"""

from __future__ import annotations

import functools
import logging
import queue
import random
import threading

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


def _fetch_once(x, timeout: float):
    """np.asarray(x) in a watchdog thread; (value, True) on completion,
    (None, False) if the fetch is still blocked after ``timeout`` seconds
    (the worker is a daemon and is abandoned — if its reply ever does
    arrive the result is simply discarded)."""
    out: dict = {}

    def run():
        try:
            out['v'] = np.asarray(x)
        except BaseException as e:  # noqa: BLE001 — surfaced to the caller
            out['e'] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    if 'e' in out:
        raise out['e']
    if 'v' in out:
        return out['v'], True
    return None, False


def _rematerialize(x):
    """Copy ``x`` into a FRESH device buffer (x + 0, dtype-exact — ints and
    IEEE floats are unchanged by adding zero) so a retry fetch is a brand-new
    transport request on a new buffer, not a second wait on the same one."""
    import jax.numpy as jnp

    return jnp.add(x, jnp.zeros((), x.dtype))


def robust_fetch(x, timeout: float = 90.0, retries: int = 2):
    """Device->host fetch that survives a lost transfer reply (SURVEY §5.3
    failure-detection role).

    On relay-attached TPUs (remote tunnel, CLAUDE.md), ``Array.__array__``
    can block FOREVER: the fetch's reply is occasionally dropped in transit
    (observed repeatedly on the v5e tunnel 2026-08-21 — faulthandler stacks
    in ``jax/_src/array.py:_value`` with an idle link, while every
    ``block_until_ready`` in the same runs completed). Execution and H2D
    dispatch are reliable; only the D2H reply is lossy. So: run the fetch
    under a watchdog; on timeout, re-materialize the value into a fresh
    device buffer (``x + 0``) whose fetch is a NEW request, and try again.

    A premature timeout is safe, not a correctness hazard: the retry simply
    dispatches a trivial add and blocks on the same queue, so the only cost
    is one tiny kernel. Raises RuntimeError after ``retries`` fresh-buffer
    attempts so a truly poisoned buffer fails loudly instead of hanging the
    training loop.

    Plain numpy/scalars pass straight through.
    """
    import jax

    if not isinstance(x, jax.Array):
        return np.asarray(x)
    v, ok = _fetch_once(x, timeout)
    attempt = 0
    while not ok and attempt < retries:
        attempt += 1
        logging.getLogger(__name__).warning(
            'D2H fetch blocked >%.0fs (lost reply?) — rematerializing into a '
            'fresh buffer, retry %d/%d', timeout, attempt, retries
        )
        v, ok = _fetch_once(_rematerialize(x), timeout)
    if not ok:
        raise RuntimeError(
            f'device fetch failed: no reply after {retries} fresh-buffer '
            f'retries x {timeout:.0f}s (shape {getattr(x, "shape", "?")})'
        )
    return v


_HEARTBEAT = {'thread': None, 'stop': None}


def start_d2h_heartbeat(interval: float = 60.0, timeout: float = 30.0) -> None:
    """Keep the device->host reply stream warm (SURVEY §5.3).

    The wedge signature behind ``robust_fetch`` (docs/design.md "Transport
    fault tolerance") is consistently the PROCESS'S FIRST D2H data fetch
    dying after many minutes of fetch-silence — large-graph compiles leave
    the reply stream idle for 7-8 min, after which the orchestrator side
    appears to tear it down (runs whose first fetch came sooner never
    wedged). This daemon thread fetches one tiny device scalar every
    ``interval`` seconds from process start, so the stream never idles
    long enough to be reaped. A failed/blocked heartbeat is logged and the
    thread keeps going — detection and restart belong to robust_fetch and
    train/supervise.py, not here.

    Idempotent; a no-op heartbeat costs one trivial kernel + a 4-byte
    reply per minute.
    """
    if _HEARTBEAT['thread'] is not None and _HEARTBEAT['thread'].is_alive():
        return
    stop = threading.Event()

    def run():
        import time as _time

        import jax
        import jax.numpy as jnp

        log = logging.getLogger(__name__)
        n = 0
        while not stop.is_set():
            try:
                # A fresh tiny buffer each beat: vary the value so no cache
                # can elide the round-trip.
                _, ok = _fetch_once(jnp.full((), n, jnp.int32), timeout)
                if not ok:
                    log.warning('D2H heartbeat %d got no reply in %.0fs', n, timeout)
            except Exception as e:  # pragma: no cover - backend teardown races
                log.debug('D2H heartbeat error: %s', e)
            n += 1
            stop.wait(interval)

    t = threading.Thread(target=run, daemon=True, name='d2h-heartbeat')
    t.start()
    _HEARTBEAT['thread'] = t
    _HEARTBEAT['stop'] = stop


def stop_d2h_heartbeat() -> None:
    if _HEARTBEAT['stop'] is not None:
        _HEARTBEAT['stop'].set()
    _HEARTBEAT['thread'] = None
    _HEARTBEAT['stop'] = None
