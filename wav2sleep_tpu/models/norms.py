"""Normalization layers for channels-last 1-D feature maps.

All modules take inputs shaped ``[N, T, C]`` (time-major, channels-last — the
layout XLA prefers on TPU). Semantics mirror the reference's channels-first
torch modules (src/wav2sleep/models/utils.py:9-58 and torch built-ins):

- ``ConvLayerNorm``  — normalize over the channel axis, affine [C].
- ``ConvRMSNorm``    — RMS over the channel axis, scale only.
- ``InstanceNorm``   — per-(sample, channel) stats over time, no affine
  (torch ``nn.InstanceNorm1d`` default ``affine=False``).
- ``ConvGroupNorm``  — grouped channel/time stats, affine.
- ``BatchNorm``      — flax BatchNorm over (N, T), running stats in the
  ``batch_stats`` collection (torch ``nn.BatchNorm1d`` eps/momentum defaults).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvLayerNorm(nn.Module):
    """Layer norm across channels for conv feature maps (biased variance)."""

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x_NTC: jnp.ndarray) -> jnp.ndarray:
        scale = self.param('scale', nn.initializers.ones, (self.num_features,))
        bias = self.param('bias', nn.initializers.zeros, (self.num_features,))
        mu = jnp.mean(x_NTC, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x_NTC - mu), axis=-1, keepdims=True)
        y = (x_NTC - mu) / jnp.sqrt(var + self.eps)
        return y * scale + bias


class ConvRMSNorm(nn.Module):
    """RMS normalization across channels for conv feature maps."""

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x_NTC: jnp.ndarray) -> jnp.ndarray:
        scale = self.param('scale', nn.initializers.ones, (self.num_features,))
        ms = jnp.mean(jnp.square(x_NTC), axis=-1, keepdims=True)
        return x_NTC / jnp.sqrt(ms + self.eps) * scale


class InstanceNorm(nn.Module):
    """Instance norm over the time axis, no affine parameters.

    Matches torch ``nn.InstanceNorm1d(C, eps=eps)`` defaults
    (``affine=False``, ``track_running_stats=False`` — always uses the
    per-sample statistics). The reference sets ``eps=1e-2`` inside signal
    encoders to avoid NaN on low-variance maps
    (src/wav2sleep/models/wav2sleep.py:213-215).
    """

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x_NTC: jnp.ndarray) -> jnp.ndarray:
        mu = jnp.mean(x_NTC, axis=-2, keepdims=True)
        var = jnp.mean(jnp.square(x_NTC - mu), axis=-2, keepdims=True)
        return (x_NTC - mu) / jnp.sqrt(var + self.eps)


class ConvGroupNorm(nn.Module):
    """Group norm with the reference's instance-norm fallback when
    ``num_features < num_groups`` (src/wav2sleep/models/utils.py:41-58)."""

    num_features: int
    num_groups: int = 8
    channels_per_group: int | None = None
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x_NTC: jnp.ndarray) -> jnp.ndarray:
        num_groups = self.num_groups
        if self.channels_per_group is not None:
            num_groups = self.num_features // self.channels_per_group
        if self.num_features < num_groups:
            num_groups = self.num_features  # Degrades to instance norm.
        if self.num_features % num_groups != 0:
            raise ValueError(f'{self.num_features=} must be divisible by {num_groups=}.')
        return nn.GroupNorm(num_groups=num_groups, epsilon=self.eps, use_bias=True, use_scale=True)(x_NTC)


class BatchNorm(nn.Module):
    """Batch norm over (N, T) with running statistics.

    torch ``nn.BatchNorm1d`` defaults: eps=1e-5, momentum=0.1 (note flax
    ``momentum`` is the *retain* factor = 1 - torch momentum).
    """

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x_NTC: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        scale = self.param('scale', nn.initializers.ones, (self.num_features,))
        bias = self.param('bias', nn.initializers.zeros, (self.num_features,))
        ra_mean = self.variable('batch_stats', 'mean', lambda: jnp.zeros(self.num_features))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones(self.num_features))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x_NTC.ndim - 1))
            mean = jnp.mean(x_NTC, axis=axes)
            var = jnp.mean(jnp.square(x_NTC), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x_NTC.size // x_NTC.shape[-1]
                # torch tracks the *unbiased* variance in running stats.
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        y = (x_NTC - mean) / jnp.sqrt(var + self.eps)
        return y * scale + bias


def get_norm(
    name: str | None, num_features: int, norm_eps: float | None = None, module_name: str | None = None
) -> nn.Module | None:
    """Build a norm module by name (reference: src/wav2sleep/models/utils.py:77-96).

    Returns None for ``name is None`` (identity). ``norm_eps`` only applies to
    instance norm, mirroring the reference. ``module_name`` pins the flax
    scope name so checkpoint conversion paths stay stable.
    """
    if name == 'batch':
        return BatchNorm(num_features=num_features, name=module_name)
    elif name == 'layer':
        return ConvLayerNorm(num_features=num_features, name=module_name)
    elif name == 'rms':
        return ConvRMSNorm(num_features=num_features, name=module_name)
    elif name is None:
        return None
    elif name == 'instance':
        eps = norm_eps if norm_eps is not None else 1e-5
        return InstanceNorm(num_features=num_features, eps=eps, name=module_name)
    elif name == 'group':
        return ConvGroupNorm(num_features=num_features, name=module_name)
    else:
        raise ValueError(f'Normalisation with {name=} unknown.')
