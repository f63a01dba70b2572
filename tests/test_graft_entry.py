"""Driver-contract tests for __graft_entry__.py.

The driver imports this file under the environment's default platform (the
single-chip TPU plugin, JAX_PLATFORMS pre-set to a non-CPU value) and calls
``dryrun_multichip(8)`` / compile-checks ``entry()``. Round 1 shipped a green
test suite with a red driver check precisely because nothing here exercised
that import path — these tests run it the way the driver does: in a fresh
subprocess, platform pre-set to a non-CPU name, no XLA_FLAGS forcing.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_child(code: str, platforms: str | None) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # No pre-forced device count: the entry file must do this itself.
    env.pop('XLA_FLAGS', None)
    if platforms is None:
        env.pop('JAX_PLATFORMS', None)
    else:
        env['JAX_PLATFORMS'] = platforms
    # Strip the TPU-plugin site dir so the child can never resolve the real
    # chip (the tunnel is single-tenant and would hang under a held parent);
    # the non-CPU JAX_PLATFORMS value still simulates the driver's env, and
    # resolving it would crash — proving the entry file switched platforms
    # before any device query.
    env['PYTHONPATH'] = REPO
    # Share the persistent compile cache: halves child wall time.
    env.setdefault('JAX_COMPILATION_CACHE_DIR', os.path.join(REPO, '.cache', 'jax'))
    env.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.3')
    return subprocess.run(
        [sys.executable, '-c', code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


@pytest.mark.slow
def test_dryrun_multichip_under_driver_env():
    """The exact round-1 failure mode: import under a non-CPU platform with
    no XLA_FLAGS, then call dryrun_multichip(8)."""
    proc = _run_child(
        'import __graft_entry__ as g; g.dryrun_multichip(8)', platforms='axon'
    )
    assert proc.returncode == 0, f'stdout={proc.stdout}\nstderr={proc.stderr}'
    assert 'dryrun_multichip OK: 8 devices' in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_initialized():
    """If a too-small backend is already live (driver touched jax.devices()
    first), the dry run must still pass via its clean-subprocess fallback."""
    code = (
        'import jax\n'
        'assert len(jax.devices()) == 1, jax.devices()\n'
        'import __graft_entry__ as g\n'
        'g.dryrun_multichip(8)\n'
    )
    proc = _run_child(code, platforms='cpu')
    assert proc.returncode == 0, f'stdout={proc.stdout}\nstderr={proc.stderr}'
    assert 'dryrun_multichip OK: 8 devices' in proc.stdout


def test_entry_returns_jittable_fn():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    # Lowering traces the full forward graph (catches shape/trace errors)
    # without paying the XLA compile; the driver does the full compile on TPU.
    jax.jit(fn).lower(*args)
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 16, 4)
