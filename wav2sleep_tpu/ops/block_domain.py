"""Block-domain activations for the encoder fast path.

Measured motivation (one v5e, B=8, L=1.2M, bf16; scripts/profile_*):
channels-last ``[B, T, 16]`` activations waste 7/8 of every vector lane —
a plain elementwise add costs 0.97 ms vs 0.20 ms on a dense-lane layout,
and every conv pays HBM traffic on materialized im2col windows (3.7 ms vs
a 0.76 ms Pallas kernel). The fix: pack ``r = 128 // C`` consecutive
samples into the feature dim once per encoder (``[B, T/r, 128]``,
sample-major: feature ``s*C + c``) and keep ALL downstream convs, norms
and activations in that dense-lane "block domain". Conversion is a single
XLA relayout (~10 ms at the largest shape, paid once; block0's exit at
C=128 is the identity).

``BlockedArray`` is a pytree (works under ``nn.remat``) carrying the
channel count; model layers (models/layers.py) dispatch on it.
"""

from __future__ import annotations

import os

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class BlockedArray:
    """[B, T/r, 128] sample-major packing of a channels-last [B, T, C] map;
    feature index = (sample_within_block * channels + channel)."""

    data: jnp.ndarray
    channels: int = flax.struct.field(pytree_node=False)

    @property
    def r(self) -> int:
        return 128 // self.channels

    @property
    def length(self) -> int:
        return self.data.shape[1] * self.r

    @property
    def batch(self) -> int:
        return self.data.shape[0]


# Test hook: force the block path on (CPU + Pallas interpreter) or off.
FORCE_BLOCK_PATH: bool | None = None

# In-kernel statistics emission (sd convs return their output's
# instance-norm mu/inv from VMEM instead of a separate two-pass
# block_stats read). Interpreter-verified and suite-covered, but
# REJECTED on real-hardware measurement (scripts/validate_kernel_stats.py,
# v5e: forward 90.2 ms ON vs 79.4 OFF, train step 326.5 vs 193.4 — the
# emission defeats the remat backward's fusion; see docs/design.md).
# OPT-IN via WAV2SLEEP_KERNEL_STATS=1 for future Mosaic versions only.
KERNEL_STATS: bool | None = None


def kernel_stats_enabled() -> bool:
    if KERNEL_STATS is not None:
        return KERNEL_STATS
    return bool(os.environ.get('WAV2SLEEP_KERNEL_STATS'))


def entry_pack_enabled() -> bool:
    """A/B knob (trace-time) for the packed single-channel entry convs —
    mirrors ``WAV2SLEEP_DISABLE_BLOCK_PATH``'s opt-out pattern."""
    return not os.environ.get('WAV2SLEEP_DISABLE_ENTRY_PACK')


def block_path_enabled() -> bool:
    """Whether the encoder block-domain fast path is active (default ON for
    TPU backends; ``WAV2SLEEP_DISABLE_BLOCK_PATH=1`` opts out; on CPU the
    plain XLA paths win and the parity suite pins them).

    Measured on one v5e (B=8, S=1200, bf16): ECG encoder 58.5 ms vs 72 ms
    on the im2col path, full flagship forward 154 vs 179 ms, train-step
    compute 236 vs 268 ms — see docs/design.md "block-domain encoders".
    """
    if FORCE_BLOCK_PATH is not None:
        return FORCE_BLOCK_PATH
    if os.environ.get('WAV2SLEEP_DISABLE_BLOCK_PATH'):
        return False
    try:
        # Multi-chip meshes are supported: the pallas convs are registered
        # batch-parallel via custom_partitioning (ops/pallas_conv.py
        # ``_sd_core_spmd``), so GSPMD/Shardy runs them per-shard over the
        # mesh's data axis instead of replicating.
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


# Promote to block domain only when the map is long enough for the one-time
# pack relayout to pay for itself.
MIN_PROMOTE_LENGTH = 1 << 16


def packable(T: int, C: int) -> bool:
    return C in (16, 32, 64, 128) and T % (128 // C) == 0


def to_blocks(x_BTC: jnp.ndarray, channels: int | None = None) -> BlockedArray:
    B, T, C = x_BTC.shape
    if channels is not None and channels != C:
        raise ValueError(f'channels mismatch: {channels} != {C}')
    r = 128 // C
    return BlockedArray(data=x_BTC.reshape(B, T // r, 128), channels=C)


def from_blocks(xb: BlockedArray) -> jnp.ndarray:
    B, N, _ = xb.data.shape
    return xb.data.reshape(B, N * xb.r, xb.channels)


def entry_conv_blocks(x_BT1: jnp.ndarray, kernel: jnp.ndarray, bias) -> BlockedArray:
    """k=3 stride-1 pad-(1,1) conv from a SINGLE-channel input straight into
    the packed block domain — the encoder entry conv (cnn_0/conv1).

    The plain path computes channels-last [B, T, Co] on the VPU and then
    pays a ~9 ms to_blocks relayout at the largest shape; here the three
    conv taps become one [B, N, 3r] @ [3r, 128] MXU matmul whose output IS
    the packed layout (feature s*Co + c), so no relayout ever happens.
    Rows are built from the free [B, T] -> [B, N, r] reshape plus two
    one-sample shifts.
    """
    k, Ci, Co = kernel.shape
    if k != 3 or Ci != 1:
        raise ValueError(f'entry_conv_blocks needs a [3, 1, Co] kernel, got {kernel.shape}')
    B, T, _ = x_BT1.shape
    r = 128 // Co
    N = T // r
    xr = x_BT1.reshape(B, N, r)
    zeros_col = jnp.zeros((B, 1, 1), x_BT1.dtype)
    prev_last = jnp.concatenate([zeros_col, xr[:, :-1, -1:]], axis=1)  # x[rn - 1]
    next_first = jnp.concatenate([xr[:, 1:, :1], zeros_col], axis=1)  # x[rn + r]
    xm1 = jnp.concatenate([prev_last, xr[:, :, :-1]], axis=2)
    xp1 = jnp.concatenate([xr[:, :, 1:], next_first], axis=2)
    wins = jnp.concatenate([xm1, xr, xp1], axis=2)  # [B, N, 3r]
    W = jnp.zeros((3 * r, r * Co), kernel.dtype)
    for j in range(3):
        for s in range(r):
            W = W.at[j * r + s, s * Co:(s + 1) * Co].set(kernel[j, 0])
    out = wins @ W.astype(x_BT1.dtype)
    if bias is not None:
        out = out + jnp.tile(bias, r).astype(out.dtype)
    return BlockedArray(data=out, channels=Co)


def entry_ds_1x1_s2_blocks(x_BT1: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> BlockedArray:
    """1x1 stride-2 conv from a single-channel input straight into the
    packed block domain — cnn_0's residual downsample (reference
    blocks.py:45-53 role). Even-phase extraction via a free reshape, then
    one [B, N, r] @ [r, 128] matmul into packed layout (no to_blocks)."""
    _, Ci, Co = kernel.shape
    if Ci != 1:
        raise ValueError(f'entry_ds_1x1_s2_blocks needs a [1, 1, Co] kernel, got {kernel.shape}')
    B, T, _ = x_BT1.shape
    r = 128 // Co
    N = T // (2 * r)
    xe = x_BT1.reshape(B, N, r, 2)[..., 0]  # even phase [B, N, r]
    W = jnp.zeros((r, r * Co), kernel.dtype)
    for s in range(r):
        W = W.at[s, s * Co:(s + 1) * Co].set(kernel[0, 0])
    out = xe @ W.astype(x_BT1.dtype)
    if bias is not None:
        out = out + jnp.tile(bias, r).astype(out.dtype)
    return BlockedArray(data=out, channels=Co)


def bmap(fn, x):
    """Apply an elementwise fn in whichever domain ``x`` lives in."""
    if isinstance(x, BlockedArray):
        return x.replace(data=fn(x.data))
    return fn(x)


def _channel_selector(C: int, dtype) -> jnp.ndarray:
    """[128, C] 0/1 matrix mapping block features (s*C + c) to channels —
    lets per-channel reductions run as one MXU matmul instead of a
    lane-splitting reshape (which would relayout the whole map)."""
    r = 128 // C
    eye = jnp.eye(C, dtype=dtype)
    return jnp.tile(eye, (r, 1))  # rows s*C + c -> column c


def block_stats(xb: BlockedArray, eps: float):
    """Per-(batch, channel) instance-norm statistics of a block-domain map:
    returns (mu_c [B, C] f32, inv_c [B, C] f32 = 1/sqrt(var + eps)).
    Two-pass centered variance (mean matmul, then a selector matmul over the
    centered squares) — the same formula as instance_norm_blocks and the
    standard InstanceNorm, so the fused chain can't drift from the unfused
    paths on high-mean/low-variance maps (f32 E[x^2]-mu^2 cancellation is
    exactly the case the encoders' eps=1e-2 exists for)."""
    B, N, _ = xb.data.shape
    r, C = xb.r, xb.channels
    v = xb.data
    sel = _channel_selector(C, v.dtype)
    n = N * r
    mu = jnp.einsum('bnf,fc->bc', v, sel, preferred_element_type=jnp.float32) / n
    mu_f = (mu @ _channel_selector(C, jnp.float32).T).astype(v.dtype)[:, None, :]
    centered = v - mu_f
    var = (
        jnp.einsum('bnf,fc->bc', jnp.square(centered), sel, preferred_element_type=jnp.float32)
        / n
    )
    return mu, 1.0 / jnp.sqrt(var + eps)


def apply_norm_act(xb: BlockedArray, mu_c, inv_c, act_fn) -> BlockedArray:
    """Materialize act((x - mu) * inv) for a block-domain map (the final
    layer of a fused chain, where the next consumer is a residual add)."""
    C = xb.channels
    sel32 = _channel_selector(C, jnp.float32)
    mu_f = (mu_c @ sel32.T).astype(xb.data.dtype)[:, None, :]
    inv_f = (inv_c @ sel32.T).astype(xb.data.dtype)[:, None, :]
    return xb.replace(data=act_fn((xb.data - mu_f) * inv_f))


def instance_norm_blocks(xb: BlockedArray, eps: float) -> BlockedArray:
    """Instance norm (stats over time per (batch, channel), no affine) on a
    block-domain map — composed from ``block_stats`` + ``apply_norm_act``
    so the fused and unfused paths share ONE statistics formula by
    construction (they must not drift on high-mean/low-variance maps)."""
    mu_c, inv_c = block_stats(xb, eps)
    return apply_norm_act(xb, mu_c, inv_c, lambda t: t)
