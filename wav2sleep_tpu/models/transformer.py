"""Transformer encoder with exact PyTorch ``nn.TransformerEncoder`` semantics.

The reference's epoch mixer wraps ``nn.TransformerEncoderLayer`` with
``batch_first=True, norm_first=True`` (src/wav2sleep/models/wav2sleep.py:286-296).
For checkpoint parity we reproduce:

- packed QKV projection (``in_proj_weight`` [3F, F] + ``in_proj_bias``),
- pre-norm residual layout:
  ``x += attn(norm1(x)); x += ff(norm2(x))``,
- key-padding masking that excludes masked *keys* from every query's softmax,
- LayerNorm eps 1e-5, exact (erf) GELU in the feed-forward.

Sequence lengths here are tiny (#modalities + CLS + registers, ~5-8 tokens),
so attention is a handful of small matmuls — XLA fuses these; no flash/Pallas
attention is warranted at D≈8 (see SURVEY.md §5.7).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .activations import get_activation

_NEG_INF = -1e30


class MultiHeadSelfAttention(nn.Module):
    """Self-attention with torch ``nn.MultiheadAttention`` parameterization."""

    d_model: int
    nhead: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x_NDF: jnp.ndarray,
        key_padding_mask: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        F = self.d_model
        if F % self.nhead:
            raise ValueError(f'd_model={F} not divisible by nhead={self.nhead}')
        head_dim = F // self.nhead
        in_proj = nn.Dense(3 * F, name='in_proj')
        out_proj = nn.Dense(F, name='out_proj')
        qkv = in_proj(x_NDF)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        N, D, _ = x_NDF.shape

        def to_heads(t):
            return t.reshape(N, D, self.nhead, head_dim).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        scores = jnp.einsum('nhqd,nhkd->nhqk', q, k) / jnp.sqrt(head_dim).astype(x_NDF.dtype)
        if key_padding_mask is not None:
            # True => key is masked out for all queries.
            scores = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, scores)
        attn = nn.softmax(scores, axis=-1)
        if self.dropout > 0.0:
            attn = nn.Dropout(rate=self.dropout, name='attn_drop')(attn, deterministic=not train)
        out = jnp.einsum('nhqk,nhkd->nhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(N, D, F)
        return out_proj(out)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (torch-parity)."""

    d_model: int
    nhead: int
    dim_ff: int = 512
    dropout: float = 0.0
    activation: str = 'gelu'
    norm_first: bool = True

    @nn.compact
    def __call__(
        self,
        x_NDF: jnp.ndarray,
        key_padding_mask: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        attn = MultiHeadSelfAttention(self.d_model, self.nhead, dropout=self.dropout, name='self_attn')
        norm1 = nn.LayerNorm(epsilon=1e-5, name='norm1')
        norm2 = nn.LayerNorm(epsilon=1e-5, name='norm2')
        linear1 = nn.Dense(self.dim_ff, name='linear1')
        linear2 = nn.Dense(self.d_model, name='linear2')
        act = get_activation(self.activation)

        def _drop(name, t):
            if self.dropout > 0.0:
                return nn.Dropout(rate=self.dropout, name=name)(t, deterministic=not train)
            return t

        def _sa(t):
            return _drop('drop1', attn(t, key_padding_mask=key_padding_mask, train=train))

        def _ff(t):
            return _drop('drop2', linear2(_drop('drop_ff', act(linear1(t)))))

        if self.norm_first:
            x_NDF = x_NDF + _sa(norm1(x_NDF))
            x_NDF = x_NDF + _ff(norm2(x_NDF))
        else:
            x_NDF = norm1(x_NDF + _sa(x_NDF))
            x_NDF = norm2(x_NDF + _ff(x_NDF))
        return x_NDF


class TransformerEncoder(nn.Module):
    """Stack of identical encoder layers (torch ``nn.TransformerEncoder``)."""

    d_model: int
    nhead: int
    num_layers: int
    dim_ff: int = 512
    dropout: float = 0.0
    activation: str = 'gelu'
    norm_first: bool = True

    @nn.compact
    def __call__(
        self,
        x_NDF: jnp.ndarray,
        key_padding_mask: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        for i in range(self.num_layers):
            x_NDF = TransformerEncoderLayer(
                d_model=self.d_model,
                nhead=self.nhead,
                dim_ff=self.dim_ff,
                dropout=self.dropout,
                activation=self.activation,
                norm_first=self.norm_first,
                name=f'layers_{i}',
            )(x_NDF, key_padding_mask=key_padding_mask, train=train)
        return x_NDF
