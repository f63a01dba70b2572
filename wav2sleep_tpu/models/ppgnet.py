"""SleepPPG-Net baseline, TPU-native (flax.linen, channels-last).

Unimodal baseline re-implemented from the same sources as the reference
(src/wav2sleep/models/ppgnet.py:19-126): Kotzen et al. 2023, adapting
Sridhar et al. 2020. Fixed 10-hour input of 1,228,800 samples (1,024 per
30 s epoch), 8 stride-2 conv blocks (channels 16..256), a time-distributed
dense to ``feature_dim``, two dilated conv blocks, and a linear classifier
producing 1,200 per-epoch logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .activations import get_activation
from .layers import ConvBlock1D, DilatedConvBlock
from .wav2sleep import dense_kernel_init

WINDOW_CHANNELS = (16, 16, 32, 32, 64, 64, 128, 256)


class SleepPPGNet(nn.Module):
    """SleepPPG-Net for 4-class sleep staging from a single waveform."""

    INPUT_LENGTH = 1_228_800  # 10 h at 1,024 samples per 30 s epoch.

    n_classes: int = 4
    feature_dim: int = 128
    dropout: float = 0.2
    activation: str = 'leaky'
    norm: str = 'batch'
    remat: bool = False  # Rematerialize window-encoder blocks in backward.

    @nn.compact
    def __call__(self, x_BT: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, 1228800] -> logits [B, 1200, n_classes]."""
        return nn.Dense(self.n_classes, kernel_init=dense_kernel_init, name='classifier')(
            self.encode(x_BT, train=train)
        )

    def encode(self, x_BT: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x_BT.shape[1] != self.INPUT_LENGTH:
            raise ValueError(f'Input tensor had unexpected shape: {x_BT.shape}')
        y = x_BT[:, :, None]
        block_cls = ConvBlock1D
        if self.remat:
            block_cls = nn.remat(ConvBlock1D, static_argnums=(2,))
        # Window encoder: 8 stride-2 blocks -> [B, 4800, 256].
        for i, ch in enumerate(WINDOW_CHANNELS):
            y = block_cls(
                features=ch, activation=self.activation, norm=self.norm, name=f'conv_block_{i}'
            )(y, train)
        # Time-distributed dense: [B, 4800, 256] -> [B, 1200, 1024] -> [B, 1200, F].
        y = y.reshape(y.shape[0], 1200, 1024)
        y = nn.Dense(self.feature_dim, kernel_init=dense_kernel_init, name='dense')(y)
        y = get_activation('leaky')(y)
        for i in range(2):
            y = DilatedConvBlock(
                feature_dim=self.feature_dim,
                dropout=self.dropout,
                activation=self.activation,
                norm=self.norm,
                name=f'dilated_{i}',
            )(y, train=train)
        return y
