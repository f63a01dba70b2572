"""Differential tests: JAX models vs the reference PyTorch implementation.

Random-initialized torch modules are converted with
``wav2sleep_tpu.convert.convert_state_dict`` and must produce allclose
outputs — this validates both the model semantics (GELU form, norm epsilons,
padding arithmetic, attention masking) and the checkpoint converter that
released ``state_dict.pth`` files pass through.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wav2sleep_tpu import models as jm
from wav2sleep_tpu.convert import convert_state_dict

torch = pytest.importorskip('torch')

ATOL = 2e-4
RTOL = 2e-4


def torch_sd_to_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _to_np(t):
    return t.detach().cpu().numpy()


@pytest.mark.parametrize('norm', ['instance', 'layer', 'group', None])
@pytest.mark.parametrize('causal', [False, True])
def test_conv_block_parity(ref_blocks, norm, causal):
    torch.manual_seed(0)
    tb = ref_blocks.ConvBlock1D(4, 8, activation='gelu', norm=norm, causal=causal, norm_eps=1e-2 if norm == 'instance' else None)
    tb.eval()
    jb = jm.ConvBlock1D(features=8, activation='gelu', norm=norm, causal=causal, norm_eps=1e-2 if norm == 'instance' else None)
    x = np.random.default_rng(0).normal(size=(2, 4, 64)).astype(np.float32)  # [N, C, L]
    with torch.no_grad():
        y_t = _to_np(tb(torch.from_numpy(x)))  # [N, C_out, L/2]
    variables = convert_state_dict(torch_sd_to_numpy(tb))
    y_j = jb.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))  # [N, L, C]
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 2, 1)), y_t, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize('causal', [False, True])
def test_dilated_block_parity(ref_blocks, causal):
    torch.manual_seed(1)
    tb = ref_blocks.DilatedConvBlock(
        feature_dim=16, dropout=0.0, activation='gelu', norm='layer', causal=causal, num_dilations=4, kernel_size=7
    )
    tb.eval()
    jb = jm.DilatedConvBlock(
        feature_dim=16, dropout=0.0, activation='gelu', norm='layer', causal=causal, num_dilations=4, kernel_size=7
    )
    x = np.random.default_rng(1).normal(size=(2, 16, 100)).astype(np.float32)
    with torch.no_grad():
        y_t = _to_np(tb(torch.from_numpy(x)))
    variables = convert_state_dict(torch_sd_to_numpy(tb))
    y_j = jb.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 2, 1)), y_t, atol=ATOL, rtol=RTOL)


def test_signal_encoder_parity(ref_models):
    torch.manual_seed(2)
    te = ref_models.SignalEncoder(
        feature_dim=32, samples_per_epoch=256, activation='gelu', norm='instance', causal=False
    )
    te.eval()
    je = jm.SignalEncoder(
        feature_dim=32, samples_per_epoch=256, activation='gelu', norm='instance', causal=False
    )
    x = np.random.default_rng(2).normal(size=(2, 256 * 6)).astype(np.float32)
    with torch.no_grad():
        y_t = _to_np(te(torch.from_numpy(x)))
    variables = convert_state_dict(torch_sd_to_numpy(te))
    y_j = je.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=ATOL, rtol=RTOL)


def test_epoch_mixer_parity(ref_models):
    torch.manual_seed(3)
    tm = ref_models.MultiModalAttentionEmbedder(feature_dim=32, layers=2, dropout=0.0, dim_ff=64, nhead=4)
    tm.train(False)
    jmm = jm.MultiModalAttentionEmbedder(feature_dim=32, layers=2, dropout=0.0, dim_ff=64, nhead=4)
    rng = np.random.default_rng(3)
    B, S, F = 3, 5, 32
    za = rng.normal(size=(B, S, F)).astype(np.float32)
    zb = rng.normal(size=(B, S, F)).astype(np.float32)
    zb[1] = -np.inf  # One missing modality in one batch element.
    zt = {'A': torch.from_numpy(za), 'B': torch.from_numpy(zb)}
    with torch.no_grad():
        y_t = _to_np(tm(zt))
    variables = convert_state_dict(torch_sd_to_numpy(tm))
    y_j = jmm.apply(variables, {'A': jnp.asarray(za), 'B': jnp.asarray(zb)})
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=ATOL, rtol=RTOL)


def _make_ref_wav2sleep(ref_models, signal_map, feature_dim=32, num_classes=4, causal=False):
    encoders = ref_models.SignalEncoders(
        signal_map=signal_map,
        feature_dim=feature_dim,
        activation='gelu',
        norm='instance',
        causal=causal,
        chunk_causal=False,
    )
    return ref_models.Wav2Sleep(
        signal_encoders=encoders,
        epoch_mixer=ref_models.MultiModalAttentionEmbedder(
            feature_dim=feature_dim, layers=2, dropout=0.0, dim_ff=64, nhead=4
        ),
        sequence_mixer=ref_models.SequenceCNN(
            feature_dim=feature_dim, dropout=0.0, activation='gelu', norm='layer', causal=causal,
            num_layers=2, kernel_size=7, num_dilations=3,
        ),
        num_classes=num_classes,
    )


def _make_jax_wav2sleep(signal_map, feature_dim=32, num_classes=4, causal=False):
    return jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map(signal_map),
            feature_dim=feature_dim,
            activation='gelu',
            norm='instance',
            causal=causal,
            chunk_causal=False,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(
            feature_dim=feature_dim, layers=2, dropout=0.0, dim_ff=64, nhead=4
        ),
        sequence_mixer=jm.SequenceCNN(
            feature_dim=feature_dim, dropout=0.0, activation='gelu', norm='layer', causal=causal,
            num_layers=2, kernel_size=7, num_dilations=3,
        ),
        num_classes=num_classes,
    )


def test_full_model_parity(ref_models):
    """End-to-end logits parity, including a missing modality in the batch."""
    torch.manual_seed(4)
    signal_map = {'ECG': 'ECG', 'THX': 'THX'}
    tmodel = _make_ref_wav2sleep(ref_models, signal_map)
    tmodel.eval()
    jmodel = _make_jax_wav2sleep(signal_map)
    rng = np.random.default_rng(4)
    B, S = 2, 8
    ecg = rng.normal(size=(B, 1024 * S)).astype(np.float32)
    thx = rng.normal(size=(B, 256 * S)).astype(np.float32)
    thx[1] = -np.inf  # Missing THX for second night.
    with torch.no_grad():
        y_t = _to_np(tmodel({'ECG': torch.from_numpy(ecg), 'THX': torch.from_numpy(thx)}))
    variables = convert_state_dict(torch_sd_to_numpy(tmodel))
    y_j = jmodel.apply(variables, {'ECG': jnp.asarray(ecg), 'THX': jnp.asarray(thx)})
    assert y_j.shape == (B, S, 4)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=5e-4, rtol=5e-4)


def test_shared_encoder_parity(ref_models):
    """Two signals mapped to one shared encoder ('UNI') + signal embeddings."""
    torch.manual_seed(5)
    signal_map = {'ECG': 'UNI', 'PPG': 'UNI'}
    encoders_t = ref_models.SignalEncoders(
        signal_map=signal_map, feature_dim=32, activation='gelu', norm='instance',
        chunk_causal=False, embed_signals=True,
    )
    encoders_t.eval()
    encoders_j = jm.SignalEncoders(
        signal_map=jm.as_signal_map(signal_map), feature_dim=32, activation='gelu', norm='instance',
        chunk_causal=False, embed_signals=True,
    )
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 1024 * 4)).astype(np.float32)
    with torch.no_grad():
        z_t = encoders_t({'ECG': torch.from_numpy(x), 'PPG': torch.from_numpy(x)})
    variables = convert_state_dict(torch_sd_to_numpy(encoders_t))
    z_j = encoders_j.apply(variables, {'ECG': jnp.asarray(x), 'PPG': jnp.asarray(x)})
    for k in z_t:
        np.testing.assert_allclose(np.asarray(z_j[k]), _to_np(z_t[k]), atol=ATOL, rtol=RTOL)


def test_ppgnet_parity(ref_ppgnet):
    torch.manual_seed(6)
    tnet = ref_ppgnet.SleepPPGNet(n_classes=4, feature_dim=32, dropout=0.0, activation='leaky', norm='batch')
    tnet.eval()
    jnet = jm.SleepPPGNet(n_classes=4, feature_dim=32, dropout=0.0, activation='leaky', norm='batch')
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 1_228_800)).astype(np.float32)
    with torch.no_grad():
        y_t = _to_np(tnet(torch.from_numpy(x)))
    variables = convert_state_dict(torch_sd_to_numpy(tnet), family='ppgnet')
    y_j = jnet.apply(variables, jnp.asarray(x))
    assert y_j.shape == (1, 1200, 4)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-3, rtol=1e-3)


def test_register_tokens_parity(ref_models):
    """Epoch mixer with extra register tokens must match torch."""
    torch.manual_seed(7)
    tm = ref_models.MultiModalAttentionEmbedder(
        feature_dim=32, layers=1, dropout=0.0, dim_ff=64, nhead=4, register_tokens=3
    )
    tm.train(False)
    jmm = jm.MultiModalAttentionEmbedder(
        feature_dim=32, layers=1, dropout=0.0, dim_ff=64, nhead=4, register_tokens=3
    )
    rng = np.random.default_rng(7)
    za = rng.normal(size=(2, 4, 32)).astype(np.float32)
    zb = rng.normal(size=(2, 4, 32)).astype(np.float32)
    with torch.no_grad():
        y_t = _to_np(tm({'A': torch.from_numpy(za), 'B': torch.from_numpy(zb)}))
    variables = convert_state_dict(torch_sd_to_numpy(tm))
    y_j = jmm.apply(variables, {'A': jnp.asarray(za), 'B': jnp.asarray(zb)})
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=ATOL, rtol=RTOL)


def test_eog_encoder_parity(ref_models):
    """EOG-rate encoder (4096 samples/epoch -> 10 conv blocks) parity."""
    torch.manual_seed(8)
    te = ref_models.SignalEncoder(
        feature_dim=24, samples_per_epoch=4096, activation='gelu', norm='instance',
        initial_channels=4, max_channels=16,
    )
    te.eval()
    je = jm.SignalEncoder(
        feature_dim=24, samples_per_epoch=4096, activation='gelu', norm='instance',
        initial_channels=4, max_channels=16,
    )
    x = np.random.default_rng(8).normal(size=(1, 4096 * 3)).astype(np.float32)
    with torch.no_grad():
        y_t = _to_np(te(torch.from_numpy(x)))
    variables = convert_state_dict(torch_sd_to_numpy(te))
    y_j = je.apply(variables, jnp.asarray(x))
    assert y_j.shape == (1, 3, 24)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=5e-4, rtol=5e-4)


def test_five_class_full_model(ref_models):
    torch.manual_seed(9)
    signal_map = {'EOG-L': 'EOG-L', 'EOG-R': 'EOG-R'}
    enc_kwargs = dict(feature_dim=24, activation='gelu', norm='instance', chunk_causal=False,
                      initial_channels=4, max_channels=16)
    tmodel = ref_models.Wav2Sleep(
        signal_encoders=ref_models.SignalEncoders(signal_map=signal_map, **enc_kwargs),
        epoch_mixer=ref_models.MultiModalAttentionEmbedder(feature_dim=24, layers=1, dropout=0.0, dim_ff=48, nhead=4),
        sequence_mixer=ref_models.SequenceCNN(feature_dim=24, dropout=0.0, activation='gelu', norm='layer',
                                              num_layers=1, kernel_size=7, num_dilations=2),
        num_classes=5,
    )
    tmodel.eval()
    jmodel = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(signal_map=jm.as_signal_map(signal_map), **enc_kwargs),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=24, layers=1, dropout=0.0, dim_ff=48, nhead=4),
        sequence_mixer=jm.SequenceCNN(feature_dim=24, dropout=0.0, activation='gelu', norm='layer',
                                      num_layers=1, kernel_size=7, num_dilations=2),
        num_classes=5,
    )
    rng = np.random.default_rng(9)
    x = {'EOG-L': rng.normal(size=(1, 4096 * 3)).astype(np.float32),
         'EOG-R': rng.normal(size=(1, 4096 * 3)).astype(np.float32)}
    with torch.no_grad():
        y_t = _to_np(tmodel({k: torch.from_numpy(v) for k, v in x.items()}))
    variables = convert_state_dict(torch_sd_to_numpy(tmodel))
    y_j = jmodel.apply(variables, {k: jnp.asarray(v) for k, v in x.items()})
    assert y_j.shape == (1, 3, 5)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=5e-4, rtol=5e-4)


def test_group_norm_export_roundtrip(ref_blocks, tmp_path):
    """Group-norm export inverse: flax '<x>/norm/GroupNorm_0/scale' must come
    back as torch '<x>.norm.norm.weight' (ConvGroupNorm nests the real
    nn.GroupNorm one level deeper), byte-matching the reference module's
    own state_dict keys and loading strictly."""
    from wav2sleep_tpu.checkpoint import export_torch_state_dict

    torch.manual_seed(3)
    tb = ref_blocks.ConvBlock1D(4, 8, activation='gelu', norm='group')
    variables = convert_state_dict(torch_sd_to_numpy(tb))
    out = str(tmp_path / 'group.pth')
    export_torch_state_dict(out, variables)
    sd = torch.load(out, weights_only=True)
    orig = tb.state_dict()
    assert set(sd.keys()) == set(orig.keys())
    for k in orig:
        np.testing.assert_allclose(sd[k].numpy(), orig[k].numpy(), atol=1e-6, err_msg=k)
    tb.load_state_dict(sd, strict=True)
