"""Block-domain encoder fast path (ops/block_domain.py + the dispatch in
models/layers.py): the full SignalEncoder forward through the blocked
Pallas path must match the standard channels-last path on the SAME params.
Runs on CPU with the Pallas interpreter and a forced-on block path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2sleep_tpu.models.wav2sleep import SignalEncoder
from wav2sleep_tpu.ops import block_domain as bd
from wav2sleep_tpu.ops import pallas_conv

pallas_conv._INTERPRET = True


@pytest.fixture
def forced_block_path(monkeypatch):
    monkeypatch.setattr(bd, 'FORCE_BLOCK_PATH', True)
    monkeypatch.setattr(bd, 'MIN_PROMOTE_LENGTH', 256)
    # Exercise the in-kernel stats emission through the whole chain even
    # while it is env-opt-in for production (see bd.KERNEL_STATS).
    monkeypatch.setattr(bd, 'KERNEL_STATS', True)
    yield
    # monkeypatch restores


def _encoder(spe):
    return SignalEncoder(
        feature_dim=32,
        samples_per_epoch=spe,
        activation='gelu',
        norm='instance',
        initial_channels=16,
        max_channels=128,
        causal=False,
        chunk_causal=False,
        output_norm=False,
        use_residual=True,
    )


@pytest.mark.parametrize('spe,S', [(1024, 4), (256, 8)])
def test_encoder_block_path_matches_standard(forced_block_path, spe, S):
    enc = _encoder(spe)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, spe * S)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)

    y_fast = enc.apply(params, x)
    bd.FORCE_BLOCK_PATH = False
    try:
        y_ref = enc.apply(params, x)
    finally:
        bd.FORCE_BLOCK_PATH = True
    assert y_fast.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=2e-4, rtol=2e-3)


def test_encoder_block_path_grads_match(forced_block_path):
    enc = _encoder(256)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 256 * 4)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)

    def loss(p, xx):
        return jnp.sum(jnp.square(enc.apply(p, xx)))

    g_fast = jax.grad(loss)(params, x)
    bd.FORCE_BLOCK_PATH = False
    try:
        g_ref = jax.grad(loss)(params, x)
    finally:
        bd.FORCE_BLOCK_PATH = True
    flat_fast = jax.tree_util.tree_leaves(g_fast)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_fast) == len(flat_ref)
    for a, b in zip(flat_fast, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2, rtol=3e-3)


def test_param_tree_identical_between_paths(forced_block_path):
    """The block path must not change the parameter tree (checkpoint
    compatibility with the torch converter)."""
    enc = _encoder(256)
    x = jnp.zeros((1, 256 * 4), jnp.float32)
    p_fast = enc.init(jax.random.PRNGKey(0), x)
    bd.FORCE_BLOCK_PATH = False
    try:
        p_ref = enc.init(jax.random.PRNGKey(0), x)
    finally:
        bd.FORCE_BLOCK_PATH = True
    t1 = jax.tree_util.tree_structure(p_fast)
    t2 = jax.tree_util.tree_structure(p_ref)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(p_fast), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convblock_fused_no_promotion_matches_standard(monkeypatch):
    """Regression: with the block path on but the input too short to
    promote, the fused-chain fallback must not double-apply norm+act
    (ConvLayer1D returns PRE-norm output under fused_emit_prenorm even for
    plain arrays; ConvBlock1D finishes each plain stage exactly once)."""
    from wav2sleep_tpu.models.layers import ConvBlock1D

    monkeypatch.setattr(bd, 'FORCE_BLOCK_PATH', True)
    # Keep the default (large) MIN_PROMOTE_LENGTH: nothing promotes.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 1024, 16)), jnp.float32)
    blk = ConvBlock1D(features=16, activation='gelu', norm='instance',
                      norm_eps=1e-2, block_domain=True)
    blk_std = ConvBlock1D(features=16, activation='gelu', norm='instance',
                          norm_eps=1e-2, block_domain=False)
    params = blk_std.init(jax.random.PRNGKey(0), x)
    y_fast = blk.apply(params, x)
    monkeypatch.setattr(bd, 'FORCE_BLOCK_PATH', False)
    y_ref = blk_std.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=1e-5, rtol=1e-5)


def test_convblock_fused_mixed_promotion_matches_standard(monkeypatch):
    """Mid-chain demotion: promote with a tiny threshold but force conv3's
    block shape off the kernel by an awkward length, exercising the
    plain-stage handoff inside the fused chain."""
    from wav2sleep_tpu.models.layers import ConvBlock1D

    monkeypatch.setattr(bd, 'FORCE_BLOCK_PATH', True)
    monkeypatch.setattr(bd, 'MIN_PROMOTE_LENGTH', 256)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 2048, 16)), jnp.float32)
    blk = ConvBlock1D(features=16, activation='gelu', norm='instance',
                      norm_eps=1e-2, block_domain=True)
    params = blk.init(jax.random.PRNGKey(0), x)
    y_fast = blk.apply(params, x)
    if isinstance(y_fast, bd.BlockedArray):
        y_fast = bd.from_blocks(y_fast)
    monkeypatch.setattr(bd, 'FORCE_BLOCK_PATH', False)
    y_ref = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=2e-4, rtol=2e-3)


def test_encoder_block_path_multidevice_mesh(forced_block_path, monkeypatch):
    """The Pallas fast path must stay ON under a multi-device mesh and
    produce outputs identical to the single-device run: the sd kernels are
    registered batch-parallel via custom_partitioning, so a data-sharded
    batch runs per-shard (previously the path hard-disabled itself whenever
    device_count != 1, silently losing the measured perf wins)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wav2sleep_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip('needs the 8-device CPU mesh (conftest XLA_FLAGS)')
    # Spy on the per-shard lowering: under an 8-way data sharding the
    # partition lower_fn must be traced with the LOCAL batch (8 // 8 = 1),
    # proving the kernel was partitioned rather than replicated.
    shard_batches = []
    orig = pallas_conv._sd_core_local
    orig_stats = pallas_conv._sd_core_stats_local

    def spy(xb, *args, **kwargs):
        shard_batches.append(xb.shape[0])
        return orig(xb, *args, **kwargs)

    def spy_stats(xb, *args, **kwargs):
        shard_batches.append(xb.shape[0])
        return orig_stats(xb, *args, **kwargs)

    monkeypatch.setattr(pallas_conv, '_sd_core_local', spy)
    monkeypatch.setattr(pallas_conv, '_sd_core_stats_local', spy_stats)

    enc = _encoder(256)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(8, 256 * 4)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x[:1])
    y_single = np.asarray(jax.jit(enc.apply)(params, x))

    mesh = make_mesh()
    rep = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P('data'))
    xd = jax.device_put(x, dsh)
    pd = jax.device_put(params, rep)
    shard_batches.clear()
    y_mesh = jax.jit(enc.apply, in_shardings=(rep, dsh))(pd, xd)
    assert shard_batches, 'partition lowering never ran — kernel was not SPMD-partitioned'
    assert all(b == 1 for b in shard_batches), (
        f'per-shard batch should be 1 on the 8-way mesh, saw {set(shard_batches)}'
    )
    np.testing.assert_allclose(np.asarray(y_mesh), y_single, atol=2e-4, rtol=2e-3)


def test_multi_tile_grid_parity(monkeypatch):
    """nT > 1 kernel parity (the clamped prev/next-panel BlockSpec index
    maps and the t==0 / t==nT-1 edge masking only exercise real neighbors
    when the sequence spans multiple tiles): shrink the per-operand VMEM
    budget so a modest shape is forced onto a multi-tile grid."""
    monkeypatch.setattr(pallas_conv, '_MAX_TILE_ELEMS', 1 << 12)
    rng = np.random.default_rng(11)
    Ci = Co = 32
    nb = 256  # rows of 128 lanes; D_in = r*Ci = 128 -> tiles of 32 rows, nT = 8
    kernel = jnp.asarray(rng.normal(size=(3, Ci, Co)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Co,)), jnp.float32)
    data = jnp.asarray(rng.normal(size=(3, nb, 128)), jnp.float32)
    for stride in (1, 2):
        assert pallas_conv.blocks_supported(nb, Ci, Co, stride)
        y = pallas_conv.sd_conv_blocks(data, kernel, bias, Ci, Co, stride)
        y_ref = pallas_conv._blocks_reference(data, kernel, bias, Ci, Co, stride)
        N = (nb * 128) // (stride * (128 // Co) * Ci)
        assert N // pallas_conv._pick_tile(N, stride * (128 // Co) * Ci) >= 2, 'grid not multi-tile'
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4, rtol=1e-4)
    # Fused-input variant across tile boundaries — stride 1 hits the
    # pre-grouped (D_in=128) layout, stride 2 the raw in-kernel-regroup
    # layout (D_in=256, 8-raw-row boundary panels).
    mu_c = jnp.asarray(rng.normal(size=(3, Ci)), jnp.float32)
    inv_c = jnp.asarray(np.abs(rng.normal(size=(3, Ci))) + 0.5, jnp.float32)
    for stride in (1, 2):
        y = pallas_conv.sd_conv_blocks_fused(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, 'gelu')
        y_ref = pallas_conv._fused_reference(data, kernel, bias, mu_c, inv_c, Ci, Co, stride, 'gelu')
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4, rtol=1e-4)
    # Stats-emitting variants: the in-kernel Chan/Welford merge only runs
    # its cross-tile accumulation when nT > 1 — pin mu/inv against the
    # two-pass block_stats reference on the same multi-tile grid (offset
    # data so a mean-cancellation bug cannot hide).
    data_off = data + jnp.float32(1.5)
    for stride in (1, 2):
        y, mu, inv = pallas_conv.sd_conv_blocks_stats(
            data_off, kernel, bias, Ci, Co, stride, 1e-2)
        y_ref = pallas_conv._blocks_reference(data_off, kernel, bias, Ci, Co, stride)
        mu_ref, inv_ref = pallas_conv._stats_of_blocks(y_ref, Co, 1e-2)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(inv), np.asarray(inv_ref), atol=1e-4, rtol=1e-4)
        y, mu, inv = pallas_conv.sd_conv_blocks_fused_stats(
            data_off, kernel, bias, mu_c, inv_c, Ci, Co, stride, 'gelu', 1e-2)
        y_ref = pallas_conv._fused_reference(
            data_off, kernel, bias, mu_c, inv_c, Ci, Co, stride, 'gelu')
        mu_ref, inv_ref = pallas_conv._stats_of_blocks(y_ref, Co, 1e-2)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(inv), np.asarray(inv_ref), atol=1e-4, rtol=1e-4)


def test_non_power_of_two_din_stays_pregrouped(forced_block_path):
    """D_in=384 (Ci=96, Co=64, stride=2) passes blocks_supported but cannot
    take the raw in-kernel-regroup path (the 8-raw-row boundary panels don't
    hold a whole number of 384-wide rows) — it must fall back to the
    pre-grouped layout and still match the XLA reference."""
    rng = np.random.default_rng(5)
    Ci, Co, stride = 96, 64, 2
    nb = 24  # nb*128 = 3072 = 8 * 384
    assert pallas_conv.blocks_supported(nb, Ci, Co, stride)
    kernel = jnp.asarray(rng.normal(size=(3, Ci, Co)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Co,)), jnp.float32)
    data = jnp.asarray(rng.normal(size=(2, nb, 128)), jnp.float32)
    y = pallas_conv.sd_conv_blocks(data, kernel, bias, Ci, Co, stride)
    y_ref = pallas_conv._blocks_reference(data, kernel, bias, Ci, Co, stride)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4, rtol=1e-4)


def test_pack_roundtrip_and_norm():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4096, 32)), jnp.float32)
    xb = bd.to_blocks(x)
    assert xb.data.shape == (2, 1024, 128)
    np.testing.assert_array_equal(np.asarray(bd.from_blocks(xb)), np.asarray(x))
    # Blocked instance norm == per-(batch, channel) time-axis norm.
    yb = bd.instance_norm_blocks(xb, eps=1e-2)
    y = np.asarray(bd.from_blocks(yb))
    mu = x.mean(axis=1, keepdims=True)
    var = jnp.square(x - mu).mean(axis=1, keepdims=True)
    want = np.asarray((x - mu) / jnp.sqrt(var + 1e-2))
    np.testing.assert_allclose(y, want, atol=1e-5, rtol=1e-5)
