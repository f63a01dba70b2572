from .ema_norm import (
    causal_rolling_normalize,
    compute_sampling_freq_from_epoch_samples,
    ema_normalize_jax,
)

__all__ = [
    'causal_rolling_normalize',
    'compute_sampling_freq_from_epoch_samples',
    'ema_normalize_jax',
]
