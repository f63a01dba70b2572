"""Causality property tests (reference tests/model/test_causality.py):
with causal=True, feeding a prefix of the input must reproduce the prefix of
the full-sequence output exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2sleep_tpu import models as jm


def build_model(causal: bool, chunk_causal: bool, feature_dim: int = 16):
    return jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG', 'THX': 'THX'}),
            feature_dim=feature_dim,
            activation='relu',
            norm='layer',
            causal=causal,
            chunk_causal=chunk_causal,
            initial_channels=4,
            max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=feature_dim, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(
            feature_dim=feature_dim, num_layers=1, kernel_size=5, num_dilations=3,
            norm='layer', causal=causal, dropout=0.0,
        ),
        num_classes=4,
    )


@pytest.mark.parametrize('chunk_causal', [True, False])
def test_causal_prefix_invariance(chunk_causal):
    model = build_model(causal=True, chunk_causal=chunk_causal)
    rng = np.random.default_rng(0)
    S = 16
    x = {
        'ECG': rng.normal(size=(1, 1024 * S)).astype(np.float32),
        'THX': rng.normal(size=(1, 256 * S)).astype(np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), x)
    y_full = model.apply(variables, x)
    half = {k: v[:, : v.shape[1] // 2] for k, v in x.items()}
    y_half = model.apply(variables, half)
    S_half = y_half.shape[1]
    np.testing.assert_allclose(
        np.asarray(y_full[:, :S_half]), np.asarray(y_half), atol=1e-5, rtol=1e-5
    )


def test_noncausal_is_not_prefix_invariant():
    """Sanity: without causal=True the property must NOT hold (the dilated
    convs see future epochs)."""
    model = build_model(causal=False, chunk_causal=False)
    rng = np.random.default_rng(1)
    S = 16
    x = {
        'ECG': rng.normal(size=(1, 1024 * S)).astype(np.float32),
        'THX': rng.normal(size=(1, 256 * S)).astype(np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), x)
    y_full = model.apply(variables, x)
    half = {k: v[:, : v.shape[1] // 2] for k, v in x.items()}
    y_half = model.apply(variables, half)
    assert not np.allclose(np.asarray(y_full[:, : y_half.shape[1]]), np.asarray(y_half), atol=1e-5)


def test_chunk_causal_parity_with_torch(ref_models):
    """chunk_causal=True path must match the torch reference numerically."""
    torch = pytest.importorskip('torch')

    from wav2sleep_tpu.convert import convert_state_dict

    torch.manual_seed(0)
    te = ref_models.SignalEncoder(
        feature_dim=16, samples_per_epoch=256, activation='gelu', norm='instance',
        causal=True, chunk_causal=True, initial_channels=4, max_channels=8,
    )
    te.eval()
    je = jm.SignalEncoder(
        feature_dim=16, samples_per_epoch=256, activation='gelu', norm='instance',
        causal=True, chunk_causal=True, initial_channels=4, max_channels=8,
    )
    x = np.random.default_rng(0).normal(size=(2, 256 * 5)).astype(np.float32)
    with torch.no_grad():
        y_t = te(torch.from_numpy(x)).numpy()
    variables = convert_state_dict({k: v.numpy() for k, v in te.state_dict().items()})
    y_j = je.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-4, rtol=2e-4)
