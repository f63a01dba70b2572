"""Activation registry with exact PyTorch-parity semantics.

The reference builds activations by name (src/wav2sleep/models/utils.py:61-74).
Checkpoint parity requires *exact* GELU (erf form): torch ``nn.GELU()``
defaults to ``approximate='none'`` while ``jax.nn.gelu`` defaults to the tanh
approximation — we pin ``approximate=False`` here.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def _leaky_relu(x):
    # torch nn.LeakyReLU default negative_slope=0.01.
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def _identity(x):
    return x


_ACTIVATIONS: dict[str, Callable] = {
    'relu': jax.nn.relu,
    'leaky': _leaky_relu,
    'gelu': _gelu_exact,
    'silu': jax.nn.silu,
    'swish': jax.nn.silu,
    'linear': _identity,
}


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return an activation function from its name."""
    if name not in _ACTIVATIONS:
        raise ValueError(f'{name=} is unsupported.')
    return _ACTIVATIONS[name]
