"""wav2sleep model family, TPU-native (flax.linen on channels-last tensors).

Re-design of the reference architecture (src/wav2sleep/models/wav2sleep.py):

1. Per-signal CNN encoders downsample each raw waveform to one feature vector
   per 30 s sleep epoch (``SignalEncoder``, reference :164-267).
2. A set-attention block fuses the per-epoch feature vectors across available
   modalities via a CLS token (``MultiModalAttentionEmbedder``, reference
   :270-346).
3. A dilated CNN mixes features across the night (``SequenceCNN``, reference
   :349-391).
4. A linear classifier emits per-epoch sleep-stage logits.

Missing-modality contract (the central cross-layer invariant, reference
:150-154 and :319-335): a missing signal is an all ``-inf`` tensor. Encoders
detect ``isinf`` on the first sample, zero the input for stability, and
re-poison their output with ``-inf``; the epoch mixer converts that into a
key-padding mask so attention never reads absent modalities.

TPU notes: everything is shape-static per signal-set so one ``jit`` trace
serves a whole run; signal subsets are expressed through the ``present``
mask (one compiled graph — masking a token out of the CLS softmax is exactly
equivalent to removing it), avoiding the reference's need for
``recompile_limit=64`` (scripts/train.py:30-36).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.block_domain import BlockedArray, block_path_enabled, from_blocks
from ..settings import COLS_TO_SAMPLES_PER_EPOCH
from .activations import get_activation
from .layers import ConvBlock1D, DilatedConvBlock
from .norms import get_norm

SignalMap = tuple[tuple[str, str], ...]

# torch nn.Linear-equivalent init for Dense layers.
dense_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in', 'uniform')


def as_signal_map(mapping) -> SignalMap:
    """Normalize a {signal: encoder} mapping into a hashable tuple of pairs."""
    if isinstance(mapping, tuple):
        return mapping
    return tuple((str(k), str(v)) for k, v in dict(mapping).items())


class SignalEncoder(nn.Module):
    """Per-modality CNN encoder: raw waveform -> one vector per sleep epoch.

    ``num_blocks = log2(samples_per_epoch) - 2`` stride-2 blocks reduce each
    epoch to 4 positions; channels double every other block up to
    ``max_channels`` (reference :198-201). A time-distributed dense layer maps
    the flattened ``4 * C_last`` values to ``feature_dim``.
    """

    feature_dim: int = 256
    samples_per_epoch: int = 1024
    activation: str = 'gelu'
    norm: str = 'instance'
    initial_channels: int = 16
    max_channels: int = 128
    causal: bool = False
    chunk_causal: bool = True
    output_norm: bool = False
    use_residual: bool = True
    # Rematerialize each conv block in the backward pass. The early blocks
    # hold [B, ~1.2M, C] activations; saving them all OOMs a 16 GB chip at
    # batch 4, while recomputing costs ~1/3 extra encoder FLOPs. Enable for
    # training (scripts/config/model/wav2sleep.yaml); inference ignores it.
    remat: bool = False

    @property
    def channels(self) -> list[int]:
        if self.samples_per_epoch & (self.samples_per_epoch - 1) != 0:
            raise ValueError(f'samples_per_epoch must be a power of 2, got {self.samples_per_epoch}')
        num_blocks = int(math.log2(self.samples_per_epoch)) - 2
        return [min(self.initial_channels * 2 ** (i // 2), self.max_channels) for i in range(num_blocks)]

    @property
    def epoch_dim(self) -> int:
        return self.channels[-1] * 4

    @nn.compact
    def __call__(self, x_BT: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x_BT.shape[-1] % self.samples_per_epoch:
            raise ValueError(
                f'Input length {x_BT.shape[-1]} must be divisible by samples_per_epoch={self.samples_per_epoch}.'
            )
        B = x_BT.shape[0]
        S = x_BT.shape[-1] // self.samples_per_epoch
        causal_conv_mode = self.causal and not self.chunk_causal

        if self.causal and self.chunk_causal:
            # Quasi-causal: process each 30 s epoch independently.
            y = x_BT.reshape(B * S, self.samples_per_epoch, 1)
        else:
            y = x_BT[:, :, None]  # [B, T, 1]

        block_cls = ConvBlock1D
        if self.remat:
            # static_argnums counts the bound method's args: (self, x, train).
            block_cls = nn.remat(ConvBlock1D, static_argnums=(2,))
        # Block-domain fast path (docs/design.md): on TPU backends, long
        # non-causal instance-norm encoders carry activations as dense-lane
        # [B, T/r, 128] BlockedArrays with Pallas space-to-depth convs.
        use_blocks = (
            not self.causal
            and self.norm == 'instance'
            and block_path_enabled()
        )
        for i, ch in enumerate(self.channels):
            if self.norm == 'auto':
                norm_i = 'instance' if i < 2 else 'layer'
            else:
                norm_i = self.norm
            # Larger instance-norm eps prevents NaN on low-variance maps
            # (reference :213-215).
            norm_eps = 1e-2 if norm_i == 'instance' else None
            y = block_cls(
                features=ch,
                activation=self.activation,
                norm=norm_i,
                norm_eps=norm_eps,
                causal=causal_conv_mode,
                use_residual=self.use_residual,
                block_domain=use_blocks,
                name=f'cnn_{i}',
            )(y, train)
        if isinstance(y, BlockedArray):
            y = from_blocks(y)

        # [*, 4S or 4, C] -> [B, S, 4*C]; channels-last layout makes this the
        # same memory order as the reference's transpose+reshape (:254-261).
        y = y.reshape(B, S, self.epoch_dim)
        y = nn.Dense(self.feature_dim, kernel_init=dense_kernel_init, name='linear')(y)
        y = get_activation(self.activation)(y)
        if self.output_norm:
            y = nn.LayerNorm(epsilon=1e-5, name='output_norm')(y)
        return y


class SignalEncoders(nn.Module):
    """Registry of per-signal encoders; many signals may share one encoder.

    Reference :83-161. Detects missing signals via ``isinf`` on the first
    sample, zeroes them, and re-marks encoder outputs with ``-inf``.
    """

    signal_map: SignalMap
    feature_dim: int
    activation: str
    norm: str = 'instance'
    causal: bool = False
    chunk_causal: bool = True
    embed_signals: bool = False
    initial_channels: int = 16
    max_channels: int = 128
    output_norm: bool = False
    use_residual: bool = True
    remat: bool = False

    def setup(self):
        encoders = {}
        for signal_name, encoder_name in as_signal_map(self.signal_map):
            if encoder_name in encoders:
                continue
            if signal_name not in COLS_TO_SAMPLES_PER_EPOCH:
                raise ValueError(f"Column {signal_name} unrecognised. Doesn't have a sampling rate.")
            encoders[encoder_name] = SignalEncoder(
                feature_dim=self.feature_dim,
                samples_per_epoch=COLS_TO_SAMPLES_PER_EPOCH[signal_name],
                activation=self.activation,
                norm=self.norm,
                causal=self.causal,
                chunk_causal=self.chunk_causal,
                initial_channels=self.initial_channels,
                max_channels=self.max_channels,
                output_norm=self.output_norm,
                use_residual=self.use_residual,
                remat=self.remat,
                name=f'encoders_{encoder_name}',
            )
        self.encoders = encoders
        self.sig_to_embedding_idx = {
            sig: i for i, sig in enumerate(sorted(dict(as_signal_map(self.signal_map)).keys()))
        }
        if self.embed_signals:
            self.embedder = nn.Embed(
                num_embeddings=len(self.signal_map), features=self.feature_dim, name='embedder'
            )

    def __len__(self) -> int:
        return len({enc for _, enc in as_signal_map(self.signal_map)})

    @property
    def valid_signals(self) -> list[str]:
        return [sig for sig, _ in as_signal_map(self.signal_map)]

    def get_encoder(self, signal_name: str) -> SignalEncoder:
        return self.encoders[dict(as_signal_map(self.signal_map))[signal_name]]

    def __call__(
        self,
        x: dict[str, jnp.ndarray],
        train: bool = False,
        present: Optional[dict[str, jnp.ndarray]] = None,
    ) -> dict[str, jnp.ndarray]:
        z_dict: dict[str, jnp.ndarray] = {}
        for signal_name, x_BT in x.items():
            mask_B = jnp.isinf(x_BT[:, 0])
            if present is not None and signal_name in present:
                mask_B = mask_B | ~present[signal_name]
            x_BT = jnp.where(jnp.isinf(x_BT), 0.0, x_BT)
            z_BSF = self.get_encoder(signal_name)(x_BT, train=train)
            z_BSF = jnp.where(mask_B[:, None, None], -jnp.inf, z_BSF)
            if self.embed_signals:
                e_F = self.embedder(jnp.array(self.sig_to_embedding_idx[signal_name], dtype=jnp.int32))
                z_BSF = z_BSF + e_F[None, None, :]
            z_dict[signal_name] = z_BSF
        return z_dict


class MultiModalAttentionEmbedder(nn.Module):
    """Set attention over modality tokens within each sleep epoch.

    Reference :270-346. Stacks per-signal epoch features, prepends a learned
    CLS (+ optional register) token, masks unavailable modalities out of the
    attention, and returns the CLS vector per epoch. Token count is
    ``#modalities + 1 + registers`` (~5-8), so this is a batch of tiny
    attention problems over the fused ``B*S`` axis.
    """

    feature_dim: int
    layers: int = 4
    dropout: float = 0.0
    dim_ff: int = 512
    activation: str = 'gelu'
    norm_first: bool = True
    nhead: int = 4
    register_tokens: int = 0

    @nn.compact
    def __call__(self, z_dict: dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        from .transformer import TransformerEncoder

        signals = sorted(z_dict.keys())
        if len(signals) == 0:
            raise ValueError('No signals provided to MultiModalAttentionEmbedder.')
        z_stack, m_stack = [], []
        for signal_name in signals:
            z_BSF = z_dict[signal_name]
            m_B = jnp.any(jnp.isinf(z_BSF), axis=(1, 2))
            z_BSF = jnp.where(m_B[:, None, None], 0.0, z_BSF)
            z_stack.append(z_BSF)
            m_stack.append(m_B)
        z_BSFC = jnp.stack(z_stack, axis=-1)
        m_BC = jnp.stack(m_stack, axis=-1)  # True where signal unavailable.
        B, S, F, C = z_BSFC.shape
        if F != self.feature_dim:
            raise ValueError(f'Feature dimension {F} does not match feature_dim={self.feature_dim}.')
        R1 = self.register_tokens + 1
        reg = self.param(
            'register_tokens', nn.initializers.normal(stddev=1.0), (1, 1, self.feature_dim, R1)
        )
        z_BSFD = jnp.concatenate([jnp.broadcast_to(reg, (B, S, F, R1)).astype(z_BSFC.dtype), z_BSFC], axis=-1)
        D = R1 + C
        # CLS / register tokens are always attendable.
        m_BD = jnp.concatenate([jnp.zeros((B, R1), dtype=bool), m_BC], axis=-1)
        z_NDF = z_BSFD.reshape(B * S, F, D).transpose(0, 2, 1)
        m_ND = jnp.broadcast_to(m_BD[:, None, :], (B, S, D)).reshape(B * S, D)
        z_NDF = TransformerEncoder(
            d_model=self.feature_dim,
            nhead=self.nhead,
            num_layers=self.layers,
            dim_ff=self.dim_ff,
            dropout=self.dropout,
            activation=self.activation,
            norm_first=self.norm_first,
            name='transformer_encoder',
        )(z_NDF, key_padding_mask=m_ND, train=train)
        z_BSFD = z_NDF.transpose(0, 2, 1).reshape(B, S, F, D)
        return z_BSFD[:, :, :, 0]  # CLS token per epoch.


class SequenceCNN(nn.Module):
    """Dilated CNN over the night's epoch sequence (reference :349-391).

    Operates natively on ``[B, S, F]`` channels-last — no transposes needed,
    unlike the torch version.
    """

    feature_dim: int = 128
    dropout: float = 0.2
    num_layers: int = 2
    activation: str = 'gelu'
    norm: str = 'batch'
    causal: bool = False
    num_dilations: int = 6
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x_BSF: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            x_BSF = DilatedConvBlock(
                feature_dim=self.feature_dim,
                dropout=self.dropout,
                activation=self.activation,
                norm=self.norm,
                causal=self.causal,
                num_dilations=self.num_dilations,
                kernel_size=self.kernel_size,
                name=f'blocks_{i}',
            )(x_BSF, train=train)
        return x_BSF


class Wav2Sleep(nn.Module):
    """Top-level sleep staging model (reference :16-80)."""

    signal_encoders: SignalEncoders
    epoch_mixer: MultiModalAttentionEmbedder
    sequence_mixer: SequenceCNN
    num_classes: int

    @property
    def valid_signals(self) -> list[str]:
        return self.signal_encoders.valid_signals

    @property
    def feature_dim(self) -> int:
        return self.epoch_mixer.feature_dim

    @nn.compact
    def __call__(
        self,
        x: dict[str, jnp.ndarray],
        train: bool = False,
        present: Optional[dict[str, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """Classify sleep stages from a dict of ``[B, T_sig]`` inputs.

        Returns logits ``[B, S, num_classes]``.
        """
        z_dict = self.signal_encoders(x, train=train, present=present)
        z_BSF = self.epoch_mixer(z_dict, train=train)
        z_BSF = self.sequence_mixer(z_BSF, train=train)
        logits = nn.Dense(self.num_classes, kernel_init=dense_kernel_init, name='classifier')(z_BSF)
        return logits

    def predict(self, x: dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Most likely class per epoch, ``[B, S]``."""
        return jnp.argmax(self(x), axis=2)
