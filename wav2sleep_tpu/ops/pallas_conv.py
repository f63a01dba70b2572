"""Pallas TPU kernel for the encoder-front small-channel k3 convs.

Why: wav2sleep's per-signal encoders spend their FLOPs in kernel-3 1-D convs
at 16-128 channels over up to 1.2M samples. On TPU every XLA formulation of
those shapes is bounded away from the hardware:

- native ``lax.conv``: ~17 ms for [8, 1.2M, 16] bf16 (layout-padded lanes),
- im2col matmul (production fallback, ``models/layers.py``): ~4 ms — HBM
  traffic on the materialized [B, L, 3C] window buffer, ~3x the copy bound,
- shifted-matmul space-to-depth in plain XLA: ~23 ms (XLA materializes every
  shifted view).

This kernel keeps the space-to-depth formulation entirely in VMEM: pack
``r = 128 // C_out`` consecutive samples into the feature dim, so the k3
conv becomes THREE dense matmuls against [r*C_in, 128] block-banded
weights — full MXU contraction/output utilization — plus sublane-shifted
adds for the cross-block taps and two [1, D] boundary rows per tile fed as
tiny side inputs. One read of x, one write of y, zero HBM intermediates.

The same kernel serves stride 2 (input blocks hold ``2r`` samples; the
"next-block" term vanishes) — exactly the encoder's downsampling convs.
Weight embeddings are built in XLA from the ordinary [3, C_in, C_out] conv
kernel at trace time (cheap, fully differentiable).

Reference behavior being accelerated: torch ``nn.Conv1d(k=3, padding=1)``
inside ConvBlock1D (reference src/wav2sleep/models/blocks.py:8-71); parity
vs the im2col path is pinned by tests/ops/test_pallas_conv.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

_MAX_TILE_ELEMS = 1 << 20  # per-operand VMEM budget (elements)

# Flipped to True by tests to run the kernel through the Pallas interpreter
# on CPU (read at trace time; the jit cache is per-process so tests set it
# before the first call).
_INTERPRET = False


def embed_sd_weights(kernel: jnp.ndarray, r: int, stride: int = 1):
    """Embed a k3 conv kernel [3, Ci, Co] into block-banded matmul weights.

    Returns (WA, WB, WC): out'[n] = x'[n-1] @ WA + x'[n] @ WB + x'[n+1] @ WC
    where x' packs ``stride*r`` consecutive input samples per block
    ([stride*r*Ci] features) and out' packs ``r`` output samples
    ([r*Co] features). For stride 2, WC is identically zero (the window of
    the last output sample of a block ends inside the same input block).

    Pure jnp — differentiable, runs at trace time, negligible cost.
    """
    k, Ci, Co = kernel.shape
    if k != 3:
        raise ValueError(f'embed_sd_weights supports k=3, got {k}')
    rin = stride * r
    D_in, D_out = rin * Ci, r * Co
    WA = jnp.zeros((D_in, D_out), kernel.dtype)
    WB = jnp.zeros((D_in, D_out), kernel.dtype)
    WC = jnp.zeros((D_in, D_out), kernel.dtype)
    for s in range(r):  # output sample s within its block
        for j in range(3):  # conv tap
            q = stride * s + j - 1  # input sample offset within block
            cols = (slice(q * Ci, (q + 1) * Ci), slice(s * Co, (s + 1) * Co))
            if q < 0:
                WA = WA.at[(q + rin) * Ci:(q + rin + 1) * Ci, cols[1]].set(kernel[j])
            elif q >= rin:
                WC = WC.at[(q - rin) * Ci:(q - rin + 1) * Ci, cols[1]].set(kernel[j])
            else:
                WB = WB.at[cols].set(kernel[j])
    return WA, WB, WC


def _pick_tile(nb: int, d_in: int, elem_bytes: int = 2) -> int:
    """Largest power-of-two row tile within the per-operand VMEM budget.

    ``_MAX_TILE_ELEMS`` is calibrated for 2-byte (bf16) elements — the
    production train/serving dtype; wider dtypes scale the element budget
    down so the scoped-VMEM BYTES stay constant. An f32 graph at the bf16
    tile size overflows Mosaic's 16 MiB scoped-vmem stack at the deepest
    EOG regroup shape (22.45M needed — the round-5 EOG drive's f32 eval
    compile), while the same shape in bf16 compiles and runs; eligibility
    predicates (``supported``/``blocks_supported``) stay dtype-free at the
    2-byte default, so path selection never depends on eval precision —
    f32 only shrinks the tile."""
    budget = (_MAX_TILE_ELEMS * 2) // max(elem_bytes, 1)
    tb = 4096
    while tb >= 8 and (nb % tb != 0 or tb * d_in > budget):
        tb //= 2
    return tb


def _in_act(name: str | None):
    """Elementwise activations available inside the kernel — must match
    models/activations.py get_activation semantics for the fused names."""
    import jax as _jax

    if name is None:
        return lambda v: v
    if name == 'gelu':
        # erf-form gelu. Neither erf nor erfc has a Pallas TPU lowering, so
        # erf is computed in-kernel via Abramowitz & Stegun 7.1.26
        # (max abs error 1.5e-7 — below f32 gelu round-off, far below the
        # bf16 compute noise of the surrounding matmuls).
        def _erf(x):
            p = 0.3275911
            a1, a2, a3, a4, a5 = (
                0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
            )
            ax = jnp.abs(x)
            t = 1.0 / (1.0 + p * ax)
            poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
            y = 1.0 - poly * jnp.exp(-ax * ax)
            return jnp.sign(x) * y

        def _gelu(v):
            f32 = v.astype(jnp.float32)
            return (0.5 * f32 * (1.0 + _erf(f32 * (2.0 ** -0.5)))).astype(v.dtype)

        return _gelu
    if name == 'relu':
        return _jax.nn.relu
    if name == 'leaky':
        return lambda v: _jax.nn.leaky_relu(v, negative_slope=0.01)
    if name in ('silu', 'swish'):
        return _jax.nn.silu
    if name == 'linear':
        return lambda v: v
    raise ValueError(f'unsupported fused activation {name!r}')


def _conv_kernel(x_ref, xprev_ref, xnext_ref, wa_ref, wb_ref, wc_ref, b_ref,
                 sh_ref, sc_ref, y_ref, *, use_next: bool, out_dtype,
                 in_norm: bool, act, TB: int, D_in: int, P: int):
    """Three clean MXU matmuls; the cross-block taps are realized by
    shifting the bf16 INPUT (one cheap concat per neighbor term) rather
    than the f32 output — measured at the VMEM copy floor (0.76 ms for
    [8, 153600, 128] vs 3.7 ms for the XLA im2col path). Optionally fuses
    the PREVIOUS layer's instance-norm apply + activation into the input
    read (shift/scale per feature), so the norm/gelu passes never touch
    HBM.

    When ``D_in > 128`` the operand arrives in its NATIVE [.., 128]-lane
    block layout and the [TB*d, 128] -> [TB, D_in] row regroup happens
    HERE, in VMEM (a lane-widening reshape Mosaic turns into register
    shuffles) — replacing the XLA-side relayout that cost ~0.27 ms per
    stride-2 / channel-transition conv (measured marginal-K, v5e bf16; the
    lane-NARROWING direction for D_in=64 fails to compile in Mosaic, so
    those convs keep the XLA reshape). ``P`` is the x'-rows per 8-row
    boundary panel (8 when the operand is pre-grouped, 8*128//D_in raw)."""
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    xt = x_ref[0].reshape(TB, D_in)  # regroup (no-op when pre-grouped)
    xm1r = xprev_ref[0].reshape(P, D_in)[P - 1:P]  # row ending at x'[t*TB-1]
    xp1r = xnext_ref[0].reshape(P, D_in)[0:1]  # first row at x'[(t+1)*TB]
    if in_norm:
        sh = sh_ref[0].astype(xt.dtype)
        sc = sc_ref[0].astype(xt.dtype)
        xt = act((xt - sh) * sc)
        xm1r = act((xm1r - sh) * sc)
        xp1r = act((xp1r - sh) * sc)
    # Sequence-edge tiles read a clamped (wrong) panel; mask those rows to
    # zero — the conv's zero padding, applied AFTER any fused transform.
    t = pl.program_id(1)
    zero = jnp.zeros_like(xm1r)
    xm1r = jnp.where(t == 0, zero, xm1r)
    if use_next:
        xp1r = jnp.where(t == pl.num_programs(1) - 1, zero, xp1r)
    xm1 = jnp.concatenate([xm1r, xt[:-1]], axis=0)
    out = jnp.dot(xm1, wa_ref[:], preferred_element_type=f32)
    out = out + jnp.dot(xt, wb_ref[:], preferred_element_type=f32)
    if use_next:
        xp1 = jnp.concatenate([xt[1:], xp1r], axis=0)
        out = out + jnp.dot(xp1, wc_ref[:], preferred_element_type=f32)
    out = out + b_ref[:].astype(f32)
    y_ref[0] = out.astype(out_dtype)


def _conv_stats_kernel(x_ref, xprev_ref, xnext_ref, wa_ref, wb_ref, wc_ref,
                       b_ref, sh_ref, sc_ref, sel_ref, selT_ref,
                       y_ref, mu_ref, m2_ref, *, use_next: bool, out_dtype,
                       in_norm: bool, act, TB: int, D_in: int, P: int,
                       Cch: int, eps: float):
    """_conv_kernel plus per-channel instance-norm statistics of the STORED
    output, accumulated across the sequential t-grid (Chan/Welford pairwise
    merge of per-tile centered moments — numerically equivalent to the
    two-pass centered variance block_stats computes, without the two extra
    full-map HBM reads it costs: ~0.42 ms each at the block-0 shape). The
    ``mu_ref``/``m2_ref`` outputs are whole-[B, C] blocks with a constant
    index map (Mosaic's tiling rule rejects a (1, C) block over a [B, C]
    array when B isn't the block's sublane count), so they stay VMEM-
    resident across the ENTIRE grid; each batch program read-modify-writes
    its own row, and the last tile turns the M2 accumulator into
    ``inv = 1/sqrt(var + eps)`` in place."""
    import jax.experimental.pallas as pl

    _conv_kernel(x_ref, xprev_ref, xnext_ref, wa_ref, wb_ref, wc_ref, b_ref,
                 sh_ref, sc_ref, y_ref, use_next=use_next, out_dtype=out_dtype,
                 in_norm=in_norm, act=act, TB=TB, D_in=D_in, P=P)
    f32 = jnp.float32
    # Stats on the values as STORED (match block_stats reading the bf16 map).
    y_st = y_ref[0].astype(f32)  # [TB, D_out]
    t = pl.program_id(1)
    nT = pl.num_programs(1)
    r_out = y_st.shape[1] // Cch
    n_t = float(TB * r_out)  # samples per (tile, channel) — static
    tile_sum = jnp.dot(jnp.sum(y_st, axis=0, keepdims=True), sel_ref[:],
                       preferred_element_type=f32)  # [1, C]
    m_t = tile_sum * (1.0 / n_t)
    m_feat = jnp.dot(m_t, selT_ref[:], preferred_element_type=f32)  # [1, D_out]
    sq = jnp.square(y_st - m_feat)
    s2_t = jnp.dot(jnp.sum(sq, axis=0, keepdims=True), sel_ref[:],
                   preferred_element_type=f32)  # [1, C] tile M2
    row = (pl.ds(pl.program_id(0), 1), slice(None))  # this program's [1, C]

    @pl.when(t == 0)
    def _init():
        mu_ref[row] = m_t
        m2_ref[row] = s2_t

    @pl.when(t != 0)
    def _merge():
        n_run = t.astype(f32) * n_t
        n_new = n_run + n_t
        mu_cur = mu_ref[row]
        delta = m_t - mu_cur
        mu_ref[row] = mu_cur + delta * (n_t / n_new)
        m2_ref[row] = m2_ref[row] + s2_t + jnp.square(delta) * (n_run * n_t / n_new)

    @pl.when(t == nT - 1)
    def _finalize():
        var = m2_ref[row] / (nT * n_t)
        m2_ref[row] = 1.0 / jnp.sqrt(var + eps)


def _sd_core(xb, WA, WB, WC, bias_tiled, use_next: bool,
             shift=None, scale=None, act_name: str | None = None):
    """pallas_call on block-domain operands: xb [B, N, D_in] -> [B, N, D_out].

    ``shift``/``scale`` ([1, D_in], f32) fuse the previous layer's
    instance-norm apply + ``act_name`` activation into the input read.

    Routed through a ``custom_partitioning`` wrapper: the kernel is
    batch-parallel (the grid's first axis is B; all cross-row logic stays
    within one sequence), so under a multi-device mesh GSPMD/Shardy runs it
    per-shard over the batch axis instead of replicating the full batch on
    every device (``pallas_call`` has no built-in SPMD rule — without this,
    a jit with a data-sharded batch silently all-gathers the input)."""
    B = xb.shape[0]
    D_in = WA.shape[0]  # xb may be in native [B, nb, 128] layout (raw path)
    in_norm = shift is not None
    if not in_norm:
        shift = jnp.zeros((B, 1, D_in), jnp.float32)
        scale = jnp.ones((B, 1, D_in), jnp.float32)
    return _sd_core_spmd(xb, WA, WB, WC, bias_tiled, shift, scale,
                         use_next, in_norm, act_name)


def _sd_core_local(xb, WA, WB, WC, bias_tiled, shift, scale,
                   use_next: bool, in_norm: bool, act_name: str | None):
    """The raw (single-shard) pallas_call; operands all explicit.

    ``xb`` arrives either pre-grouped ([B, N, D_in], last dim == WA rows) or
    — when D_in is a >128 multiple of 128 — in the native [B, nb, 128]
    block layout, with the row regroup absorbed into the kernel's VMEM read
    (see _conv_kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D_in, D_out = WA.shape
    B, rows, lane = xb.shape
    raw = lane != D_in  # native 128-lane layout; kernel regroups
    N = rows if not raw else (rows * 128) // D_in
    TB = _pick_tile(N, D_in, xb.dtype.itemsize)
    nT = N // TB
    P = 8 if not raw else (8 * 128) // D_in  # x'-rows per 8-row panel
    npan = TB // P  # boundary panels per tile
    x_block = (1, TB, D_in) if not raw else (1, TB * (D_in // 128), 128)
    pan_block = (1, 8, D_in) if not raw else (1, 8, 128)
    # Tile-boundary neighbor rows are read straight from xb through two
    # extra 8-row-panel views with shifted (clamped) index maps: the panel
    # ending at x'[t*TB - 1] and the panel starting at x'[(t+1)*TB]. The
    # kernel masks the t=0 / t=nT-1 reads to zero (the conv's sequence
    # padding). No XLA-side gather/concat/pad — constructing these rows in
    # XLA materialized full-array reshape views (measured ~half the
    # encoder's runtime).

    grid = (B, nT)
    return pl.pallas_call(
        functools.partial(
            _conv_kernel,
            use_next=use_next,
            out_dtype=xb.dtype,
            in_norm=in_norm,
            act=_in_act(act_name),
            TB=TB,
            D_in=D_in,
            P=P,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(x_block, lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                pan_block,
                lambda b, t: (b, jnp.maximum(t * npan - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                pan_block,
                lambda b, t: (b, jnp.minimum((t + 1) * npan, nT * npan - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((D_in, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_in, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_in, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D_in), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D_in), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TB, D_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nT * TB, D_out), xb.dtype),
        interpret=_INTERPRET,
    )(xb, xb, xb, WA, WB, WC, bias_tiled, shift, scale)


def _dim0_sharding(s, ndim: int) -> NamedSharding:
    """Keep only the batch (dim-0) entry of an operand sharding; every other
    dim of the kernel's operands must be whole per shard."""
    spec = getattr(s, 'spec', None)
    d0 = spec[0] if spec is not None and len(spec) > 0 else None
    return NamedSharding(s.mesh, P(*((d0,) + (None,) * (ndim - 1))))


def _spmd_infer(use_next, in_norm, act_name, mesh, arg_shapes, result_shape):
    return _dim0_sharding(arg_shapes[0].sharding, len(result_shape.shape))


def _spmd_partition(use_next, in_norm, act_name, mesh, arg_shapes, result_shape):
    x_sh = _dim0_sharding(arg_shapes[0].sharding, 3)
    rep2 = NamedSharding(x_sh.mesh, P(None, None))

    def lower(xb, WA, WB, WC, bias_tiled, shift, scale):
        return _sd_core_local(xb, WA, WB, WC, bias_tiled, shift, scale,
                              use_next, in_norm, act_name)

    arg_sh = (x_sh, rep2, rep2, rep2, rep2, x_sh, x_sh)
    return mesh, lower, x_sh, arg_sh


_sd_core_spmd = functools.partial(custom_partitioning, static_argnums=(7, 8, 9))(
    _sd_core_local
)
# Shardy factor rule: only the batch factor ``b`` is shared between operands
# and result, so propagation can shard the kernel over batch and nothing
# else; ``partition`` pins the per-shard layout (weights replicated).
_sd_core_spmd.def_partition(
    infer_sharding_from_operands=_spmd_infer,
    partition=_spmd_partition,
    sharding_rule='b n i, c d, e f, g h, j k, b l m, b o p -> b q r',
)


def _sd_core_stats_local(xb, WA, WB, WC, bias_tiled, shift, scale, sel, selT,
                         use_next: bool, in_norm: bool, act_name: str | None,
                         Cch: int, eps: float):
    """_sd_core_local variant that also emits per-(batch, channel)
    instance-norm statistics of the stored output: returns
    (y [B, N, D_out], mu [B, C] f32, inv [B, C] f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D_in, D_out = WA.shape
    B, rows, lane = xb.shape
    raw = lane != D_in
    N = rows if not raw else (rows * 128) // D_in
    TB = _pick_tile(N, D_in, xb.dtype.itemsize)
    nT = N // TB
    P = 8 if not raw else (8 * 128) // D_in
    npan = TB // P
    x_block = (1, TB, D_in) if not raw else (1, TB * (D_in // 128), 128)
    pan_block = (1, 8, D_in) if not raw else (1, 8, 128)

    grid = (B, nT)
    return pl.pallas_call(
        functools.partial(
            _conv_stats_kernel,
            use_next=use_next,
            out_dtype=xb.dtype,
            in_norm=in_norm,
            act=_in_act(act_name),
            TB=TB,
            D_in=D_in,
            P=P,
            Cch=Cch,
            eps=eps,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(x_block, lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                pan_block,
                lambda b, t: (b, jnp.maximum(t * npan - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                pan_block,
                lambda b, t: (b, jnp.minimum((t + 1) * npan, nT * npan - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((D_in, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_in, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_in, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D_in), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D_in), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_out, Cch), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cch, D_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, D_out), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            # Whole-array stats blocks (constant index map): a (1, C) block
            # over [B, C] violates Mosaic's sublane tiling when B != 1; the
            # full block instead stays VMEM-resident across the grid and
            # each batch program updates only its own row.
            pl.BlockSpec((B, Cch), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Cch), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nT * TB, D_out), xb.dtype),
            jax.ShapeDtypeStruct((B, Cch), jnp.float32),
            jax.ShapeDtypeStruct((B, Cch), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(xb, xb, xb, WA, WB, WC, bias_tiled, shift, scale, sel, selT)


def _spmd_stats_infer(use_next, in_norm, act_name, Cch, eps,
                      mesh, arg_shapes, result_shape):
    x3 = _dim0_sharding(arg_shapes[0].sharding, 3)
    x2 = _dim0_sharding(arg_shapes[0].sharding, 2)
    return (x3, x2, x2)


def _spmd_stats_partition(use_next, in_norm, act_name, Cch, eps,
                          mesh, arg_shapes, result_shape):
    x_sh = _dim0_sharding(arg_shapes[0].sharding, 3)
    s_sh = _dim0_sharding(arg_shapes[0].sharding, 2)
    rep2 = NamedSharding(x_sh.mesh, P(None, None))

    def lower(xb, WA, WB, WC, bias_tiled, shift, scale, sel, selT):
        return _sd_core_stats_local(xb, WA, WB, WC, bias_tiled, shift, scale,
                                    sel, selT, use_next, in_norm, act_name,
                                    Cch, eps)

    arg_sh = (x_sh, rep2, rep2, rep2, rep2, x_sh, x_sh, rep2, rep2)
    return mesh, lower, (x_sh, s_sh, s_sh), arg_sh


_sd_core_stats_spmd = functools.partial(
    custom_partitioning, static_argnums=(9, 10, 11, 12, 13)
)(_sd_core_stats_local)
_sd_core_stats_spmd.def_partition(
    infer_sharding_from_operands=_spmd_stats_infer,
    partition=_spmd_stats_partition,
    sharding_rule='b n i, c d, e f, g h, j k, b l m, b o p, q r, s t '
                  '-> b u v, b w, b x',
)


def _sd_core_stats(xb, WA, WB, WC, bias_tiled, use_next: bool, Cch: int,
                   eps: float, shift=None, scale=None,
                   act_name: str | None = None):
    """_sd_core plus fused per-channel statistics of the stored output."""
    B = xb.shape[0]
    D_in, D_out = WA.shape
    in_norm = shift is not None
    if not in_norm:
        shift = jnp.zeros((B, 1, D_in), jnp.float32)
        scale = jnp.ones((B, 1, D_in), jnp.float32)
    r_out = D_out // Cch
    sel = jnp.tile(jnp.eye(Cch, dtype=jnp.float32), (r_out, 1))  # [D_out, C]
    return _sd_core_stats_spmd(xb, WA, WB, WC, bias_tiled, shift, scale,
                               sel, sel.T, use_next, in_norm, act_name,
                               Cch, eps)


def _embedded_operands(kernel, bias, r: int, stride: int, dtype):
    WA, WB, WC = embed_sd_weights(kernel, r, stride)
    bias_tiled = jnp.tile(bias.astype(jnp.float32), r)[None, :]
    return WA.astype(dtype), WB.astype(dtype), WC.astype(dtype), bias_tiled


@functools.partial(jax.jit, static_argnames=('stride',))
def _sd_conv_impl(x, kernel, bias, stride):
    B, L, Ci = x.shape
    _, _, Co = kernel.shape
    r = 128 // Co
    rin = stride * r
    nb = L // rin
    D_in = rin * Ci
    WA, WB, WC, bias_tiled = _embedded_operands(kernel, bias, r, stride, x.dtype)
    out = _sd_core(x.reshape(B, nb, D_in), WA, WB, WC, bias_tiled, use_next=stride == 1)
    return out.reshape(B, L // stride, Co)


def blocks_supported(nb: int, Ci: int, Co: int, stride: int) -> bool:
    """Whether a block-domain conv (input [B, nb, 128] packed at
    r_in = 128//Ci) hits the Pallas kernel."""
    if stride not in (1, 2) or Co not in (16, 32, 64, 128) or not 8 <= Ci <= 128:
        return False
    D_in = stride * (128 // Co) * Ci
    if D_in > 512 or (nb * 128) % D_in:
        return False
    return _pick_tile((nb * 128) // D_in, D_in) >= 8


def _maybe_group(data, D_in: int):
    """Pre-group [B, nb, 128] block data to [B, N, D_in] for the kernel —
    except when the kernel can absorb the regroup into its VMEM read (raw
    path), skipping the XLA relayout. The raw path additionally needs the
    8-raw-row boundary panels to hold a whole number of regrouped rows
    (1024 % D_in == 0) — e.g. D_in=384 (Ci=96, Co=64, s=2) passes
    ``blocks_supported`` but must stay on the pre-grouped layout."""
    B, nb, _ = data.shape
    if D_in > 128 and D_in % 128 == 0 and 1024 % D_in == 0:
        return data
    return data.reshape(B, (nb * 128) // D_in, D_in)


@functools.partial(jax.jit, static_argnames=('Ci', 'Co', 'stride'))
def _sd_conv_blocks_impl(data, kernel, bias, Ci, Co, stride):
    r = 128 // Co
    D_in = stride * r * Ci
    WA, WB, WC, bias_tiled = _embedded_operands(kernel, bias, r, stride, data.dtype)
    return _sd_core(_maybe_group(data, D_in), WA, WB, WC, bias_tiled, use_next=stride == 1)


def _blocks_reference(data, kernel, bias, Ci, Co, stride):
    """Identical math in plain XLA ON THE BLOCK ARRAYS: the block-domain
    conv IS a k=3 stride-1 conv over block rows with the embedded weights,
    so its autodiff (used for the custom backward) never leaves the dense
    block layout — no unpack relayouts in the backward pass."""
    from jax import lax

    B, nb, _ = data.shape
    r = 128 // Co
    D_in = stride * r * Ci
    N = (nb * 128) // D_in
    xb2 = data.reshape(B, N, D_in)
    WA, WB, WC = embed_sd_weights(kernel, r, stride)
    W3 = jnp.stack([WA, WB, WC]).astype(data.dtype)
    y = lax.conv_general_dilated(
        xb2, W3, (1,), ((1, 1),), dimension_numbers=('NHC', 'HIO', 'NHC')
    )
    return y + jnp.tile(bias, r).astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sd_conv_blocks(data, kernel, bias, Ci: int, Co: int, stride: int):
    """Block-domain k3 pad-(1,1) conv: [B, nb, 128] (packed at 128//Ci)
    -> [B, nb*Ci//(stride*Co), 128] (packed at 128//Co). Caller must check
    ``blocks_supported`` first."""
    return _sd_conv_blocks_impl(data, kernel, bias, Ci, Co, stride)


def _sd_conv_blocks_fwd(data, kernel, bias, Ci, Co, stride):
    return _sd_conv_blocks_impl(data, kernel, bias, Ci, Co, stride), (data, kernel, bias)


def _sd_conv_blocks_bwd(Ci, Co, stride, residuals, g):
    data, kernel, bias = residuals
    _, vjp = jax.vjp(
        lambda d, k, b: _blocks_reference(d, k, b, Ci, Co, stride), data, kernel, bias
    )
    return vjp(g)


def _stats_of_blocks(y, Co: int, eps: float):
    """The exact block_stats math (two-pass centered, block_domain.py) on a
    block-domain map — the custom-backward / parity reference for the
    in-kernel Chan-merged statistics."""
    from .block_domain import BlockedArray, block_stats

    return block_stats(BlockedArray(data=y, channels=Co), eps)


@functools.partial(jax.jit, static_argnames=('Ci', 'Co', 'stride', 'eps'))
def _sd_conv_blocks_stats_impl(data, kernel, bias, Ci, Co, stride, eps):
    r = 128 // Co
    D_in = stride * r * Ci
    WA, WB, WC, bias_tiled = _embedded_operands(kernel, bias, r, stride, data.dtype)
    return _sd_core_stats(_maybe_group(data, D_in), WA, WB, WC, bias_tiled,
                          use_next=stride == 1, Cch=Co, eps=eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def sd_conv_blocks_stats(data, kernel, bias, Ci: int, Co: int, stride: int,
                         eps: float):
    """``sd_conv_blocks`` that ALSO returns the output's per-(batch,
    channel) instance-norm statistics (mu [B, Co] f32, inv [B, Co] f32),
    accumulated inside the kernel while the output tile is VMEM-resident —
    the two full-map HBM reads of a separate ``block_stats`` pass never
    happen."""
    return _sd_conv_blocks_stats_impl(data, kernel, bias, Ci, Co, stride, eps)


def _sd_conv_blocks_stats_fwd(data, kernel, bias, Ci, Co, stride, eps):
    out = _sd_conv_blocks_stats_impl(data, kernel, bias, Ci, Co, stride, eps)
    return out, (data, kernel, bias)


def _sd_conv_blocks_stats_bwd(Ci, Co, stride, eps, residuals, g):
    data, kernel, bias = residuals

    def ref(d, k, b):
        y = _blocks_reference(d, k, b, Ci, Co, stride)
        mu, inv = _stats_of_blocks(y, Co, eps)
        return y, mu, inv

    _, vjp = jax.vjp(ref, data, kernel, bias)
    return vjp(g)


sd_conv_blocks_stats.defvjp(_sd_conv_blocks_stats_fwd, _sd_conv_blocks_stats_bwd)


@functools.partial(jax.jit, static_argnames=('Ci', 'Co', 'stride', 'act', 'eps'))
def _sd_fused_stats_impl(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, act, eps):
    r = 128 // Co
    D_in = stride * r * Ci
    WA, WB, WC, bias_tiled = _embedded_operands(kernel, bias, r, stride, data.dtype)
    return _sd_core_stats(
        _maybe_group(data, D_in), WA, WB, WC, bias_tiled,
        use_next=stride == 1, Cch=Co, eps=eps,
        shift=_tile_to_din(mu_c, Ci, D_in),
        scale=_tile_to_din(inv_c, Ci, D_in),
        act_name=act,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def sd_conv_blocks_fused_stats(data, kernel, bias, mu_c, inv_c, Ci: int,
                               Co: int, stride: int, act: str | None,
                               eps: float):
    """``sd_conv_blocks_fused`` that also emits the output's instance-norm
    statistics (see ``sd_conv_blocks_stats``) — one kernel both consumes the
    previous layer's norm+activation and produces the next layer's stats."""
    return _sd_fused_stats_impl(data, kernel, bias, mu_c, inv_c, Ci, Co,
                                stride, act, eps)


def _sd_fused_stats_fwd(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, act, eps):
    out = _sd_fused_stats_impl(data, kernel, bias, mu_c, inv_c, Ci, Co,
                               stride, act, eps)
    return out, (data, kernel, bias, mu_c, inv_c)


def _sd_fused_stats_bwd(Ci, Co, stride, act, eps, residuals, g):
    data, kernel, bias, mu_c, inv_c = residuals

    def ref(d, k, b, m, i):
        y = _fused_reference(d, k, b, m, i, Ci, Co, stride, act)
        mu, inv = _stats_of_blocks(y, Co, eps)
        return y, mu, inv

    _, vjp = jax.vjp(ref, data, kernel, bias, mu_c, inv_c)
    return vjp(g)


sd_conv_blocks_fused_stats.defvjp(_sd_fused_stats_fwd, _sd_fused_stats_bwd)


sd_conv_blocks.defvjp(_sd_conv_blocks_fwd, _sd_conv_blocks_bwd)


def _tile_to_din(v_c, Ci: int, D_in: int):
    """Per-(batch, channel) [B, Ci] f32 -> per-feature [B, 1, D_in]
    (sample-major packing)."""
    return jnp.tile(v_c.astype(jnp.float32), (1, D_in // Ci))[:, None, :]


@functools.partial(jax.jit, static_argnames=('Ci', 'Co', 'stride', 'act'))
def _sd_conv_blocks_fused_impl(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, act):
    r = 128 // Co
    D_in = stride * r * Ci
    WA, WB, WC, bias_tiled = _embedded_operands(kernel, bias, r, stride, data.dtype)
    return _sd_core(
        _maybe_group(data, D_in),
        WA, WB, WC, bias_tiled,
        use_next=stride == 1,
        shift=_tile_to_din(mu_c, Ci, D_in),
        scale=_tile_to_din(inv_c, Ci, D_in),
        act_name=act,
    )


def _fused_reference(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, act):
    B, nb, _ = data.shape
    r = 128 // Co
    D_in = stride * r * Ci
    N = (nb * 128) // D_in
    xb2 = data.reshape(B, N, D_in)
    sh = _tile_to_din(mu_c, Ci, D_in).astype(data.dtype)
    sc = _tile_to_din(inv_c, Ci, D_in).astype(data.dtype)
    xb2 = _in_act(act)((xb2 - sh) * sc)
    WA, WB, WC = embed_sd_weights(kernel, r, stride)
    W3 = jnp.stack([WA, WB, WC]).astype(data.dtype)
    from jax import lax

    y = lax.conv_general_dilated(
        xb2, W3, (1,), ((1, 1),), dimension_numbers=('NHC', 'HIO', 'NHC')
    )
    return y + jnp.tile(bias, r).astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def sd_conv_blocks_fused(data, kernel, bias, mu_c, inv_c, Ci: int, Co: int,
                         stride: int, act: str | None):
    """Block-domain conv with the PREVIOUS layer's instance-norm apply and
    activation fused into the kernel's input read: computes
    ``conv(act((data - mu_c) * inv_c))`` without the norm/activation ever
    touching HBM. ``mu_c``/``inv_c`` are per-channel [Ci] f32 statistics
    (from ops.block_domain.block_stats).
 The conv's zero padding applies to the
    transformed input (the sequence-edge boundary rows are masked back to
    zero in the kernel), exactly matching the unfused norm -> act -> conv
    chain.
    """
    return _sd_conv_blocks_fused_impl(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, act)


def _sd_fused_fwd(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, act):
    out = _sd_conv_blocks_fused_impl(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, act)
    return out, (data, kernel, bias, mu_c, inv_c)


def _sd_fused_bwd(Ci, Co, stride, act, residuals, g):
    data, kernel, bias, mu_c, inv_c = residuals
    _, vjp = jax.vjp(
        lambda d, k, b, m, i: _fused_reference(d, k, b, m, i, Ci, Co, stride, act),
        data, kernel, bias, mu_c, inv_c,
    )
    return vjp(g)


sd_conv_blocks_fused.defvjp(_sd_fused_fwd, _sd_fused_bwd)


def embed_k1_s2_weights(kernel: jnp.ndarray, r: int) -> jnp.ndarray:
    """Embed a k=1 stride-2 conv kernel [1, Ci, Co] into a [2*r*Ci, r*Co]
    matmul weight over input blocks of 2r samples (the ConvBlock1D residual
    downsample, reference blocks.py:45-53)."""
    _, Ci, Co = kernel.shape
    W = jnp.zeros((2 * r * Ci, r * Co), kernel.dtype)
    for s in range(r):
        W = W.at[(2 * s) * Ci:(2 * s + 1) * Ci, s * Co:(s + 1) * Co].set(kernel[0])
    return W


def ds_1x1_s2_blocks(data, kernel, Ci: int, Co: int, bias=None):
    """Block-domain 1x1 stride-2 conv as a single XLA matmul (natively
    differentiable; the MXU shape [*, 2rCi] @ [2rCi, 128] is efficient).
    A k=d stride-d NHC conv formulation would avoid the D_in=256 row
    regroup, but measured SLOWER end-to-end in training (the strided conv's
    input-gradient lowering outweighs the relayout saving)."""
    B, nb, _ = data.shape
    r = 128 // Co
    D_in = 2 * r * Ci
    N = (nb * 128) // D_in
    W = embed_k1_s2_weights(kernel, r).astype(data.dtype)
    out = data.reshape(B, N, D_in) @ W
    if bias is not None:
        out = out + jnp.tile(bias, r).astype(out.dtype)
    return out


def supported(x_shape, kernel_shape, stride, padding, dilation=1, groups=1) -> bool:
    """Whether (shape, conv config) hits the Pallas fast path."""
    if dilation != 1 or groups != 1:
        return False
    k, Ci, Co = kernel_shape
    B, L, Ci2 = x_shape
    if k != 3 or Ci != Ci2 or padding != (1, 1) or stride not in (1, 2):
        return False
    if Co not in (16, 32, 64, 128) or Ci > 128 or Ci < 8:
        # Ci < 8 (the 1->C entry convs) stays on the VPU broadcast path —
        # the matmul contraction would be too thin even space-to-depth'd.
        return False
    r = 128 // Co
    rin = stride * r
    if rin * Ci > 512:  # keep D_in sane (VMEM/bandwidth)
        return False
    if L % rin != 0:
        return False
    nb = L // rin
    return _pick_tile(nb, rin * Ci) >= 8


def _reference_conv(x, kernel, bias, stride):
    """The mathematically-identical XLA conv (used only for its transpose
    rules in the backward pass — the forward runs the Pallas kernel)."""
    from jax import lax

    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=('NHC', 'HIO', 'NHC'),
    )
    return y + bias.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sd_conv(x, kernel, bias, stride: int = 1):
    """k=3, padding=(1,1) conv via the Pallas space-to-depth kernel.

    x: [B, L, Ci] (bf16/f32); kernel: [3, Ci, Co]; bias: [Co].
    Returns [B, L//stride, Co]. Caller must check ``supported`` first.
    """
    return _sd_conv_impl(x, kernel, bias, stride)


def _sd_conv_fwd(x, kernel, bias, stride):
    return _sd_conv_impl(x, kernel, bias, stride), (x, kernel, bias)


def _sd_conv_bwd(stride, residuals, g):
    """Backward via jax.vjp of the reference XLA conv: its transpose rules
    are guaranteed to match the forward math (the Pallas kernel is a
    bit-compatible-within-reassociation reformulation of it), so gradients
    are exactly the standard conv gradients."""
    x, kernel, bias = residuals
    _, vjp = jax.vjp(lambda xx, kk, bb: _reference_conv(xx, kk, bb, stride), x, kernel, bias)
    return vjp(g)


sd_conv.defvjp(_sd_conv_fwd, _sd_conv_bwd)
