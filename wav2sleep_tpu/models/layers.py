"""1-D convolutional building blocks, channels-last, XLA/TPU-friendly.

Re-designed equivalents of the reference blocks
(src/wav2sleep/models/blocks.py:8-186): same math, but operating on
``[N, T, C]`` tensors so XLA lowers the convs directly onto the MXU without
layout transposes. Parameter trees are structured so a mechanical converter
can map PyTorch ``state_dict`` keys onto them (see wav2sleep_tpu/convert.py).

Causality contract (reference blocks.py:149-153, 173-182): in causal mode the
conv pads ``(k-1)*dilation`` on both sides and trims
``max(padding - (stride-1), 0)`` samples from the right after the conv, which
keeps norm statistics unskewed and aligns stride-2 residual branches.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops import block_domain as bd
from ..ops import pallas_conv
from ..ops.block_domain import BlockedArray, bmap, from_blocks, to_blocks
from .activations import get_activation
from .norms import BatchNorm, get_norm

# torch-style kaiming-uniform(a=sqrt(5)) equivalent: var = 1/(3*fan_in).
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in', 'uniform')


def _conv_mxu_friendly(x, kernel, stride, padding):
    """Small-channel 1-D conv reformulated for the TPU.

    XLA's native conv on [N, T, C] with C in the 16-32 range tiles the MXU at
    <2 TFLOP/s (the contraction and output dims are far below the 128x128
    systolic array). Measured on v5e, these equivalent formulations are
    2.5-4.5x faster for the encoder-front shapes that dominate wav2sleep's
    forward (k=3 convs over ~1.2M samples at 1-32 channels):

    - ``k*C_in <= 4``: pure VPU broadcast multiply-add over the k taps
      (no MXU involvement at all).
    - stride 1: im2col — k shifted contiguous slices concatenated to
      [N, T, k*C_in] and one dot against [k*C_in, C_out].
    - stride 2 (k=3, pad 1): strided slices are slow on TPU, so split the
      input into even/odd phases via reshape (contiguous) and express the
      conv as [x_odd[-1], x_even, x_odd] concat -> one dot.

    Returns None when the shape doesn't match a supported fast pattern
    (caller falls back to ``lax.conv_general_dilated``).
    """
    k, Ci, Co = kernel.shape
    B, L, _ = x.shape
    if stride == 2 and k == 1 and padding == (0, 0) and L % 2 == 0:
        # 1x1 stride-2 projection: take the even phase, then a plain matmul.
        x = x.reshape(B, L // 2, 2, Ci)[:, :, 0, :]
        return x @ kernel.reshape(Ci, Co)
    if stride == 1:
        xp = jnp.pad(x, ((0, 0), padding, (0, 0)))
        Lout = xp.shape[1] - k + 1
        if k * Ci <= 4:
            out = None
            for j in range(k):
                for c in range(Ci):
                    term = lax.slice(xp, (0, j, c), (B, j + Lout, c + 1)) * kernel[j, c][None, None, :]
                    out = term if out is None else out + term
            return out
        if Ci <= 32:
            wins = jnp.concatenate(
                [lax.slice(xp, (0, j, 0), (B, j + Lout, Ci)) for j in range(k)], axis=-1
            )
            return wins @ kernel.reshape(k * Ci, Co)
        return None
    if stride == 2 and k == 3 and padding == (1, 1) and L % 2 == 0 and Ci <= 32:
        xr = x.reshape(B, L // 2, 2, Ci)
        xe, xo = xr[:, :, 0, :], xr[:, :, 1, :]
        xo_m1 = jnp.pad(xo, ((0, 0), (1, 0), (0, 0)))[:, : L // 2, :]
        wins = jnp.concatenate([xo_m1, xe, xo], axis=-1)
        return wins @ kernel.reshape(3 * Ci, Co)
    return None


class Conv1D(nn.Module):
    """Bare 1-D convolution on [N, T, C] with explicit padding control.

    Kernel is stored ``[K, C_in // groups, C_out]`` (XLA 'HIO' layout); a
    PyTorch ``Conv1d.weight`` of shape ``[C_out, C_in//g, K]`` converts via a
    (2, 1, 0) transpose.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: tuple[int, int] = (0, 0)
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    # Encoder fast path (docs/design.md "block-domain encoders"): when set
    # and the backend/shape allow, activations travel as dense-lane
    # BlockedArrays and k3/k1 convs run the Pallas space-to-depth kernel.
    block_domain: bool = False

    def _conv_blocked(self, xb: BlockedArray, kernel, bias, fused_in=None,
                      emit_stats_eps=None):
        """Block-domain conv via the Pallas sd kernel (k=3) or an embedded
        matmul (k=1 stride-2 residual downsample); None if unsupported.

        ``fused_in=(mu_c, inv_c, act_name)`` folds the previous layer's
        instance-norm apply + activation into the kernel's input read.
        ``emit_stats_eps`` additionally makes the kernel emit the output's
        own instance-norm statistics (returns (BlockedArray, mu, inv)) —
        the fused chain's block_stats passes never re-read the map."""
        if self.dilation != 1 or self.groups != 1:
            return None
        Ci, Co = xb.channels, self.features
        nb = xb.data.shape[1]
        if (
            self.kernel_size == 3
            and self.padding == (1, 1)
            and pallas_conv.blocks_supported(nb, Ci, Co, self.stride)
        ):
            b = bias if bias is not None else jnp.zeros((Co,), kernel.dtype)
            if emit_stats_eps is not None:
                if fused_in is not None:
                    mu_c, inv_c, act_name = fused_in
                    data, mu, inv = pallas_conv.sd_conv_blocks_fused_stats(
                        xb.data, kernel, b, mu_c, inv_c, Ci, Co, self.stride,
                        act_name, emit_stats_eps
                    )
                else:
                    data, mu, inv = pallas_conv.sd_conv_blocks_stats(
                        xb.data, kernel, b, Ci, Co, self.stride, emit_stats_eps
                    )
                return BlockedArray(data=data, channels=Co), mu, inv
            if fused_in is not None:
                mu_c, inv_c, act_name = fused_in
                data = pallas_conv.sd_conv_blocks_fused(
                    xb.data, kernel, b, mu_c, inv_c, Ci, Co, self.stride, act_name
                )
            else:
                data = pallas_conv.sd_conv_blocks(xb.data, kernel, b, Ci, Co, self.stride)
            return BlockedArray(data=data, channels=Co)
        if fused_in is not None:
            return None  # caller materializes the pending transform first
        if (
            self.kernel_size == 1
            and self.stride == 2
            and self.padding == (0, 0)
            and Co in (16, 32, 64, 128)
            and (nb * 128) % (2 * (128 // Co) * Ci) == 0
        ):
            data = pallas_conv.ds_1x1_s2_blocks(
                xb.data, kernel.astype(xb.data.dtype), Ci, Co, bias=bias
            )
            return BlockedArray(data=data, channels=Co)
        return None

    @nn.compact
    def __call__(self, x_NTC, fused_in=None, emit_stats_eps=None) -> jnp.ndarray:
        blocked_in = isinstance(x_NTC, BlockedArray)
        in_features = x_NTC.channels if blocked_in else x_NTC.shape[-1]
        kshape = (self.kernel_size, in_features // self.groups, self.features)
        if self.weight_norm:
            # torch weight_norm(dim=0): per-output-channel direction/magnitude.
            v = self.param('kernel_v', conv_kernel_init, kshape)
            g = self.param('kernel_g', nn.initializers.ones, (self.features,))
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True) + 1e-12)
            kernel = v / norm * g[None, None, :]
        else:
            kernel = self.param('kernel', conv_kernel_init, kshape)
        bias = self.param('bias', nn.initializers.zeros, (self.features,)) if self.use_bias else None
        if blocked_in:
            yb = self._conv_blocked(x_NTC, kernel, bias, fused_in, emit_stats_eps)
            if yb is not None:
                return yb
            if fused_in is not None:
                # Unsupported fused shape: materialize the pending
                # norm+activation, then demote to channels-last.
                mu_c, inv_c, act_name = fused_in
                x_NTC = bd.apply_norm_act(x_NTC, mu_c, inv_c, pallas_conv._in_act(act_name))
            x_NTC = from_blocks(x_NTC)  # unsupported config: demote
        if (
            self.block_domain
            and not blocked_in
            and fused_in is None
            and in_features == 1
            and self.dilation == 1
            and self.groups == 1
            and bd.block_path_enabled()
            and self.features in (16, 32, 64, 128)
            and bd.entry_pack_enabled()
        ):
            # Single-channel entry convs write PACKED output directly (one
            # matmul into the block layout) instead of a channels-last map
            # followed by a to_blocks relayout — the measured ~9 ms entry
            # pack and ~5 ms cnn_0 residual pack (docs/design.md).
            r = 128 // self.features
            T = x_NTC.shape[1]
            if (
                self.kernel_size == 3
                and self.stride == 1
                and self.padding == (1, 1)
                and T % r == 0
                and T >= bd.MIN_PROMOTE_LENGTH
            ):
                return bd.entry_conv_blocks(x_NTC, kernel, bias)
            if (
                self.kernel_size == 1
                and self.stride == 2
                and self.padding == (0, 0)
                and T % (2 * r) == 0
                and T // 2 >= bd.MIN_PROMOTE_LENGTH
            ):
                return bd.entry_ds_1x1_s2_blocks(x_NTC, kernel, bias)
        y = None
        if self.dilation == 1 and self.groups == 1:
            y = _conv_mxu_friendly(x_NTC, kernel.astype(x_NTC.dtype), self.stride, self.padding)
        if y is None:
            y = lax.conv_general_dilated(
                x_NTC,
                kernel.astype(x_NTC.dtype),
                window_strides=(self.stride,),
                padding=(self.padding,),
                rhs_dilation=(self.dilation,),
                feature_group_count=self.groups,
                dimension_numbers=('NHC', 'HIO', 'NHC'),
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        if (
            self.block_domain
            and not blocked_in
            and bd.block_path_enabled()
            and bd.packable(y.shape[1], y.shape[2])
            and y.shape[1] >= bd.MIN_PROMOTE_LENGTH
        ):
            # One-time promotion into the dense-lane block domain; every
            # downstream conv/norm/activation stays there.
            return to_blocks(y)
        return y


class ConvLayer1D(nn.Module):
    """Conv + norm + activation + dropout (reference blocks.py:129-186)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dropout: float = 0.0
    causal: bool = False
    groups: int = 1
    activation: str = 'relu'
    use_bias: bool = False
    norm: str | None = 'batch'
    norm_eps: float | None = None
    block_domain: bool = False

    @nn.compact
    def __call__(self, x_NTC, train: bool = False, fused_in=None,
                 fused_emit_prenorm: bool = False,
                 emit_stats_eps=None) -> jnp.ndarray:
        # emit_stats_eps is only meaningful together with fused_emit_prenorm
        # (the fused-chain mode): the blocked conv then returns
        # (pre-norm BlockedArray, mu, inv) with the output statistics
        # computed inside the kernel.
        if self.causal:
            pad = (self.kernel_size - 1) * self.dilation
        else:
            pad = self.padding
        conv = Conv1D(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=(pad, pad),
            dilation=self.dilation,
            groups=self.groups,
            use_bias=self.use_bias or self.norm is None,
            weight_norm=self.norm == 'weight',
            block_domain=self.block_domain and not self.causal,
            name='conv',
        )
        out = conv(x_NTC, fused_in=fused_in,
                   emit_stats_eps=emit_stats_eps if fused_emit_prenorm else None)
        if fused_emit_prenorm:
            # Fused chain (ConvBlock1D): the caller owns this layer's norm
            # + activation (folded into the NEXT conv's input read when the
            # output is blocked, applied explicitly when it is plain) — in
            # BOTH cases the raw conv output must be returned, or the
            # norm+act would run twice.
            return out
        if isinstance(out, BlockedArray) and self.norm not in ('instance', None, 'weight'):
            out = from_blocks(out)  # only instance norm has a block-domain form
        if self.causal and pad > 0:
            right_trim = max(pad - (self.stride - 1), 0)
            if right_trim > 0:
                out = out[:, : out.shape[1] - right_trim, :]
        if isinstance(out, BlockedArray):
            if self.norm == 'instance':
                eps = self.norm_eps if self.norm_eps is not None else 1e-5
                out = bd.instance_norm_blocks(out, eps)
        elif self.norm != 'weight':
            norm = get_norm(self.norm, num_features=self.features, norm_eps=self.norm_eps, module_name='norm')
            if norm is not None:
                if isinstance(norm, BatchNorm):
                    out = norm(out, use_running_average=not train)
                else:
                    out = norm(out)
        out = bmap(get_activation(self.activation), out)
        if self.dropout > 0.0:
            drop = nn.Dropout(rate=self.dropout, name='drop')
            out = bmap(lambda a: drop(a, deterministic=not train), out)
        return out


class ConvBlock1D(nn.Module):
    """Three conv layers with a stride-2 downsample on the third plus a 1x1
    stride-2 residual projection (reference blocks.py:8-71)."""

    features: int
    dropout: float = 0.0
    activation: str = 'leaky'
    norm: str = 'batch'
    causal: bool = False
    norm_eps: float | None = None
    use_residual: bool = True
    block_domain: bool = False

    @nn.compact
    def __call__(self, x_NTC, train: bool = False) -> jnp.ndarray:
        def make(name: str, stride: int = 1) -> ConvLayer1D:
            return ConvLayer1D(
                features=self.features,
                kernel_size=3,
                stride=stride,
                padding=1,
                activation=self.activation,
                norm=self.norm,
                dropout=self.dropout,
                causal=self.causal,
                norm_eps=self.norm_eps,
                block_domain=self.block_domain,
                name=name,
            )

        l1, l2, l3 = make('conv1'), make('conv2'), make('conv3', stride=2)
        fused_ok = (
            self.block_domain
            and self.norm == 'instance'
            and self.dropout == 0.0
            and not self.causal
        )
        if fused_ok:
            # Fused chain: each Pallas conv consumes the previous layer's
            # instance-norm + activation inside its input read; stats come
            # from one matmul-reduce pass per layer. HBM sees only the conv
            # outputs.
            eps = self.norm_eps if self.norm_eps is not None else 1e-5
            # In-kernel stats emission (opt-in until TPU-validated): when
            # off, emit_stats_eps=None and split() falls back to the
            # two-pass block_stats read.
            eps_emit = eps if bd.kernel_stats_enabled() else None
            act = get_activation(self.activation)

            def finish_plain(c):
                # Instance norm (parameter-free, identical math to the
                # in-layer module) + activation for a channels-last stage.
                mu = jnp.mean(c, axis=-2, keepdims=True)
                var = jnp.mean(jnp.square(c - mu), axis=-2, keepdims=True)
                return act((c - mu) / jnp.sqrt(var + eps))

            # Every c_i below is the PRE-norm conv output (blocked or
            # plain — a layer may fall back mid-chain when its shape misses
            # the kernel): blocked stages hand their norm+act to the next
            # conv's fused input read; plain stages get it applied here.
            # Blocked Pallas stages emit their own output statistics from
            # inside the kernel ((c, mu, inv) tuples); block_stats is only
            # the fallback for stages that produced a BlockedArray some
            # other way (e.g. the single-channel entry conv).
            def split(c):
                if isinstance(c, tuple):
                    return c
                if isinstance(c, BlockedArray):
                    return (c,) + bd.block_stats(c, eps)
                return c, None, None

            c1, mu1, inv1 = split(l1(x_NTC, train=train, fused_emit_prenorm=True,
                                     emit_stats_eps=eps_emit))
            if isinstance(c1, BlockedArray):
                c2 = l2(c1, train=train, fused_in=(mu1, inv1, self.activation),
                        fused_emit_prenorm=True, emit_stats_eps=eps_emit)
            else:
                c2 = l2(finish_plain(c1), train=train, fused_emit_prenorm=True,
                        emit_stats_eps=eps_emit)
            c2, mu2, inv2 = split(c2)
            if isinstance(c2, BlockedArray):
                c3 = l3(c2, train=train, fused_in=(mu2, inv2, self.activation),
                        fused_emit_prenorm=True, emit_stats_eps=eps_emit)
            else:
                c3 = l3(finish_plain(c2), train=train, fused_emit_prenorm=True,
                        emit_stats_eps=eps_emit)
            c3, mu3, inv3 = split(c3)
            if isinstance(c3, BlockedArray):
                out = bd.apply_norm_act(c3, mu3, inv3, act)
            else:
                out = finish_plain(c3)
        else:
            out = l1(x_NTC, train=train)
            out = l2(out, train=train)
            out = l3(out, train=train)
        if self.use_residual:
            res = Conv1D(
                features=self.features,
                kernel_size=1,
                stride=2,
                padding=(0, 0),
                use_bias=False,
                block_domain=self.block_domain,
                name='downsample',
            )(x_NTC)
            out_b, res_b = isinstance(out, BlockedArray), isinstance(res, BlockedArray)
            if out_b and not res_b:
                if bd.packable(res.shape[1], res.shape[2]) and res.shape[2] == out.channels:
                    res = to_blocks(res)  # align the residual with the main path
                else:
                    out, out_b = from_blocks(out), False
            elif res_b and not out_b:
                res = from_blocks(res)
            if isinstance(out, BlockedArray):
                out = out.replace(data=out.data + res.data)
            else:
                out = out + res
        return bmap(get_activation(self.activation), out)


class DilatedConvBlock(nn.Module):
    """Residual stack of dilated conv layers with dilations ``2**i``
    (reference blocks.py:74-126)."""

    feature_dim: int = 128
    dropout: float = 0.2
    activation: str = 'leaky'
    norm: str = 'batch'
    kernel_size: int = 7
    causal: bool = False
    num_dilations: int = 6

    @property
    def dilations(self) -> Sequence[int]:
        return [2**i for i in range(self.num_dilations)]

    @nn.compact
    def __call__(self, x_NTC: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = x_NTC
        for j, dilation in enumerate(self.dilations):
            k_eff = self.kernel_size + (self.kernel_size - 1) * (dilation - 1)
            out = ConvLayer1D(
                features=self.feature_dim,
                kernel_size=self.kernel_size,
                stride=1,
                dilation=dilation,
                padding=k_eff // 2,
                activation=self.activation,
                norm=self.norm,
                causal=self.causal,
                name=f'convs_{j}',
            )(out, train=train)
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout, name='drop')(out, deterministic=not train)
        out = out + x_NTC
        return get_activation(self.activation)(out)
