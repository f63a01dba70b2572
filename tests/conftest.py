"""Test configuration: 8-device virtual CPU mesh + persistent compile cache.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) since only one physical TPU
chip is attached in CI.
"""

import os

# The CI environment pre-sets JAX_PLATFORMS to the TPU plugin AND its
# sitecustomize imports jax at interpreter startup, so env vars set here are
# read too late — force the platform through jax.config instead. XLA_FLAGS is
# still read at (lazy) CPU-client creation, so the 8-device forcing works as
# long as no jax computation ran before this file was imported.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import importlib
import sys
import types

import jax
import pytest

jax.config.update('jax_platforms', 'cpu')

jax.config.update('jax_compilation_cache_dir', os.path.join(os.path.dirname(__file__), '..', '.cache', 'jax'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
# Parity tests compare against float32 torch; keep MXU-style bf16 out of them.
jax.config.update('jax_default_matmul_precision', 'highest')

REFERENCE_SRC = os.environ.get('W2S_REFERENCE_SRC', '/root/reference/src')


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_SRC, 'wav2sleep'))


def load_reference_module(modname: str):
    """Import a module from the read-only reference checkout for differential
    testing, without executing the reference package's top-level __init__
    (which pulls in deps not installed here)."""
    if not reference_available():
        pytest.skip('reference checkout not available')
    if 'wav2sleep' not in sys.modules or not hasattr(sys.modules['wav2sleep'], '__w2s_stub__'):
        pkg = types.ModuleType('wav2sleep')
        pkg.__path__ = [os.path.join(REFERENCE_SRC, 'wav2sleep')]
        pkg.__w2s_stub__ = True
        sys.modules['wav2sleep'] = pkg
    return importlib.import_module(modname)


@pytest.fixture
def ref_models():
    return load_reference_module('wav2sleep.models.wav2sleep')


@pytest.fixture
def ref_blocks():
    return load_reference_module('wav2sleep.models.blocks')


@pytest.fixture
def ref_ppgnet():
    return load_reference_module('wav2sleep.models.ppgnet')
