"""utils.robust_fetch: D2H fetch that survives a lost transfer reply.

On relay-attached TPUs a fetch's reply can be dropped in transit, leaving
``Array.__array__`` blocked forever (SURVEY §5.3 failure-detection role;
the reference's torch stack has no analog — its device fetches are local
PCIe). These tests pin the pass-through, the fresh-buffer retry path, and
the loud failure after retries exhaust.
"""

import numpy as np
import pytest

import wav2sleep_tpu.utils as U
from wav2sleep_tpu.utils import robust_fetch


def test_numpy_passthrough():
    x = np.arange(6.0).reshape(2, 3)
    out = robust_fetch(x)
    np.testing.assert_array_equal(out, x)


def test_jax_array_fetch_roundtrip():
    import jax.numpy as jnp

    x = jnp.arange(12, dtype=jnp.int32).reshape(3, 4)
    out = robust_fetch(x, timeout=30.0)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, np.arange(12, dtype=np.int32).reshape(3, 4))


def test_retry_rematerializes_fresh_buffer(monkeypatch):
    """First fetch 'loses its reply' (simulated timeout); the retry must go
    through a rematerialized buffer and return the exact value."""
    import jax.numpy as jnp

    x = jnp.asarray([1.5, -2.0, 3.25], jnp.float32)
    calls = {'fetch': 0, 'remat': 0}
    real_fetch, real_remat = U._fetch_once, U._rematerialize

    def flaky_fetch(arr, timeout):
        calls['fetch'] += 1
        if calls['fetch'] == 1:
            return None, False  # reply dropped
        return real_fetch(arr, timeout)

    def counting_remat(arr):
        calls['remat'] += 1
        return real_remat(arr)

    monkeypatch.setattr(U, '_fetch_once', flaky_fetch)
    monkeypatch.setattr(U, '_rematerialize', counting_remat)
    out = robust_fetch(x, timeout=30.0, retries=2)
    np.testing.assert_array_equal(out, np.asarray([1.5, -2.0, 3.25], np.float32))
    assert calls['fetch'] == 2
    assert calls['remat'] == 1  # retried through a FRESH buffer, not the same one


def test_raises_after_retries_exhausted(monkeypatch):
    import jax.numpy as jnp

    x = jnp.zeros((2, 2), jnp.float32)
    monkeypatch.setattr(U, '_fetch_once', lambda arr, timeout: (None, False))
    monkeypatch.setattr(U, '_rematerialize', lambda arr: arr)
    with pytest.raises(RuntimeError, match='fresh-buffer'):
        robust_fetch(x, timeout=0.01, retries=2)


def test_rematerialize_is_value_exact():
    """x + 0 must be bit-exact for ints and IEEE floats (incl. -inf, the
    missing-modality sentinel)."""
    import jax.numpy as jnp

    f = jnp.asarray([0.1, -np.inf, np.inf, 0.0, -7.5], jnp.float32)
    np.testing.assert_array_equal(np.asarray(U._rematerialize(f)), np.asarray(f))
    i = jnp.asarray([[5, -3], [2**30, 0]], jnp.int32)
    np.testing.assert_array_equal(np.asarray(U._rematerialize(i)), np.asarray(i))
    assert U._rematerialize(f).dtype == f.dtype
    assert U._rematerialize(i).dtype == i.dtype


def test_worker_exception_propagates():
    class Boom:
        def __array__(self, dtype=None, copy=None):
            raise ValueError('decode failed')

    # _fetch_once surfaces worker exceptions instead of treating them as
    # timeouts (a real decode error must not trigger transport retries).
    with pytest.raises(ValueError, match='decode failed'):
        U._fetch_once(Boom(), timeout=10.0)


def test_d2h_heartbeat_beats_and_stops(monkeypatch):
    """The heartbeat must issue periodic tiny fetches from start, and stop
    cleanly (so suites don't leak a busy thread)."""
    import time

    calls = []
    monkeypatch.setattr(U, '_fetch_once', lambda x, timeout: (calls.append(1), True)[1:] and (np.zeros(()), True))
    U.stop_d2h_heartbeat()
    U.start_d2h_heartbeat(interval=0.05)
    try:
        deadline = time.time() + 5.0
        while len(calls) < 3 and time.time() < deadline:
            time.sleep(0.05)
        assert len(calls) >= 3
        # Idempotent: a second start must not spawn a second thread.
        t = U._HEARTBEAT['thread']
        U.start_d2h_heartbeat(interval=0.05)
        assert U._HEARTBEAT['thread'] is t
    finally:
        U.stop_d2h_heartbeat()
    n = len(calls)
    time.sleep(0.3)
    assert len(calls) <= n + 1  # stopped (at most one in-flight beat)
