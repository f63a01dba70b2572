"""Pallas space-to-depth conv kernel (ops/pallas_conv.py): forward parity
vs the production im2col path and XLA's native conv, gradient parity vs the
reference conv, and the support predicate. Runs through the Pallas
interpreter on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from wav2sleep_tpu.ops import pallas_conv

pallas_conv._INTERPRET = True  # CPU: run the kernel interpreted


def ref_conv(x, kernel, bias, stride):
    y = lax.conv_general_dilated(
        x, kernel, (stride,), ((1, 1),), dimension_numbers=('NHC', 'HIO', 'NHC')
    )
    return y + bias


SHAPES = [
    # (Ci, Co, stride) — the encoder-front shapes the kernel exists for.
    (16, 16, 1),
    (16, 16, 2),
    (16, 32, 1),
    (32, 32, 2),
    (32, 64, 1),
    (64, 64, 2),
    (64, 128, 1),
    (128, 128, 2),
]


@pytest.mark.parametrize('ci,co,stride', SHAPES)
def test_forward_parity(ci, co, stride):
    rng = np.random.default_rng(0)
    B, L = 2, 2048 * stride
    x = jnp.asarray(rng.normal(size=(B, L, ci)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, ci, co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    assert pallas_conv.supported(x.shape, k.shape, stride, (1, 1))
    got = pallas_conv.sd_conv(x, k, b, stride)
    want = ref_conv(x, k, b, stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_grad_parity():
    rng = np.random.default_rng(1)
    B, L, ci, co, stride = 2, 1024, 16, 16, 1
    x = jnp.asarray(rng.normal(size=(B, L, ci)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, ci, co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)

    def loss_pallas(x, k, b):
        return jnp.sum(jnp.square(pallas_conv.sd_conv(x, k, b, stride)))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.square(ref_conv(x, k, b, stride)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, bexp in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bexp), atol=5e-3, rtol=5e-4)


def test_supported_predicate():
    ok = pallas_conv.supported
    assert not ok((2, 2048, 1), (3, 1, 16), 1, (1, 1))  # entry conv: VPU path
    assert not ok((2, 2048, 16), (3, 16, 16), 1, (2, 0))  # causal padding
    assert not ok((2, 2048, 16), (5, 16, 16), 1, (1, 1))  # k=5
    assert not ok((2, 2048, 16), (3, 16, 16), 1, (1, 1), dilation=2)
    assert not ok((2, 2047, 16), (3, 16, 16), 2, (1, 1))  # ragged length
    assert not ok((2, 2048, 16), (3, 16, 24), 1, (1, 1))  # Co not 2^k*16
    assert ok((2, 2048, 16), (3, 16, 16), 1, (1, 1))


def test_missing_inf_zeroing_contract():
    """The encoders zero -inf inputs BEFORE convs, so the kernel never sees
    non-finite values; still, document that finite inputs stay finite."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 1024, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 16, 16)) * 0.2, jnp.float32)
    y = pallas_conv.sd_conv(x, k, jnp.zeros((16,)), 1)
    assert bool(jnp.isfinite(y).all())


def test_pick_tile_scales_with_dtype_width():
    """The per-operand tile budget is BYTES, calibrated at bf16: an f32
    operand at the same shape gets half the rows (the r5 EOG drive's f32
    eval graph overflowed Mosaic's 16 MiB scoped-vmem stack at the bf16
    tile size). Predicates keep the 2-byte default, so path eligibility
    never depends on eval precision."""
    nb, d_in = 1 << 15, 256
    tb_bf16 = pallas_conv._pick_tile(nb, d_in)
    tb_f32 = pallas_conv._pick_tile(nb, d_in, elem_bytes=4)
    assert tb_f32 == tb_bf16 // 2
    assert tb_bf16 * d_in * 2 <= pallas_conv._MAX_TILE_ELEMS * 2
    assert tb_f32 * d_in * 4 <= pallas_conv._MAX_TILE_ELEMS * 2
