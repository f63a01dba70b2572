"""End-to-end API tests: EDF folder -> hypnogram CSVs, reference-format
checkpoints, and torch round-trip export."""

import datetime
import os

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip('torch')
yaml = pytest.importorskip('yaml')

from wav2sleep_tpu import api
from wav2sleep_tpu.checkpoint import export_torch_state_dict, save_checkpoint_folder
from wav2sleep_tpu.convert import convert_state_dict
from wav2sleep_tpu.data.edf import write_edf

FEATURE_DIM = 32

MODEL_CFG = {
    '_target_': 'wav2sleep.models.wav2sleep.Wav2Sleep',
    'num_classes': 4,
    'signal_encoders': {
        '_target_': 'wav2sleep.models.wav2sleep.SignalEncoders',
        'signal_map': {'ECG': 'ECG', 'THX': 'THX'},
        'feature_dim': FEATURE_DIM,
        'activation': 'gelu',
        'norm': 'instance',
        'causal': False,
        'chunk_causal': False,
        'initial_channels': 8,
        'max_channels': 32,
        'output_norm': False,
        'use_residual': True,
    },
    'epoch_mixer': {
        '_target_': 'wav2sleep.models.wav2sleep.MultiModalAttentionEmbedder',
        'feature_dim': FEATURE_DIM,
        'dropout': 0.0,
        'activation': 'gelu',
        'layers': 2,
        'dim_ff': 64,
        'nhead': 4,
    },
    'sequence_mixer': {
        '_target_': 'wav2sleep.models.wav2sleep.SequenceCNN',
        'feature_dim': FEATURE_DIM,
        'dropout': 0.0,
        'activation': 'gelu',
        'norm': 'layer',
        'causal': False,
        'num_layers': 2,
        'kernel_size': 7,
        'num_dilations': 3,
    },
}


def build_ref_torch_model(ref_models):
    torch.manual_seed(0)
    enc_cfg = {k: v for k, v in MODEL_CFG['signal_encoders'].items() if k != '_target_'}
    mix_cfg = {k: v for k, v in MODEL_CFG['epoch_mixer'].items() if k != '_target_'}
    seq_cfg = {k: v for k, v in MODEL_CFG['sequence_mixer'].items() if k != '_target_'}
    model = ref_models.Wav2Sleep(
        signal_encoders=ref_models.SignalEncoders(**enc_cfg),
        epoch_mixer=ref_models.MultiModalAttentionEmbedder(**mix_cfg),
        sequence_mixer=ref_models.SequenceCNN(**seq_cfg),
        num_classes=MODEL_CFG['num_classes'],
    )
    model.eval()
    return model


@pytest.fixture(scope='module')
def checkpoint_folder(tmp_path_factory):
    """Reference-format checkpoint folder written from a torch state_dict."""
    import tests.conftest as c

    ref_models = c.load_reference_module('wav2sleep.models.wav2sleep')
    model = build_ref_torch_model(ref_models)
    folder = tmp_path_factory.mktemp('ckpt')
    torch.save(model.state_dict(), folder / 'state_dict.pth')
    with open(folder / 'config.yaml', 'w') as f:
        yaml.safe_dump(MODEL_CFG, f)
    return str(folder), model


@pytest.fixture(scope='module')
def edf_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp('edfs')
    rng = np.random.default_rng(0)
    for i in range(2):
        n_sec = 45 * 60  # 45 minutes
        ecg = np.sin(np.arange(125 * n_sec) / 40) + rng.normal(size=125 * n_sec) * 0.1
        thx = np.sin(np.arange(10 * n_sec) / 100) * 0.5
        write_edf(
            str(folder / f'night{i}.edf'),
            signals={'EKG': ecg * 800, 'THOR RES': thx},
            sampling_freqs={'EKG': 125.0, 'THOR RES': 10.0},
            units={'EKG': 'uV', 'THOR RES': ''},
            physical_ranges={'EKG': (-2000, 2000), 'THOR RES': (-1, 1)},
            start=datetime.datetime(2002, 3, 1, 23, 0, 0),
        )
    return str(folder)


def test_load_model(checkpoint_folder):
    folder, _ = checkpoint_folder
    model = api.load_model(folder)
    assert model.valid_signals == ['ECG', 'THX']
    assert model.num_classes == 4
    assert not model.causal


def test_predict_on_folder_e2e(checkpoint_folder, edf_folder, tmp_path):
    folder, torch_model = checkpoint_folder
    out_folder = str(tmp_path / 'preds')
    cache_root = str(tmp_path / 'cache')
    preds, labels = api.predict_on_folder(
        input_folder=edf_folder,
        output_folder=out_folder,
        model_folder=folder,
        max_length_hours=1,
        batch_size=2,
        return_tensors=True,
        tmp_root_folder=cache_root,
    )
    assert labels is None  # EDFs carry no labels.
    assert len(preds) == 2
    csvs = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(out_folder) for f in fs if f.endswith('.preds.csv')
    )
    assert len(csvs) == 2
    df = pd.read_csv(csvs[0], index_col=0)
    assert 'Pred' in df.columns
    assert len(df) == len(preds[0])
    assert set(np.unique(df['Pred'])) <= {0, 1, 2, 3}

    # Differential: torch reference on the same preprocessed parquet.
    parquet_folder = api.prepare(edf_folder, ['ECG', 'THX'], max_length_hours=1, tmp_root_folder=cache_root)
    ds = api.load_dataset(parquet_folder, ['ECG', 'THX'], num_classes=4, max_length_hours=1)
    for idx in range(len(ds)):
        signals, _ = ds[idx]
        xt = {k: torch.from_numpy(v[None]) for k, v in signals.items()}
        with torch.no_grad():
            ref_logits = torch_model(xt).numpy()[0]
        np.testing.assert_array_equal(preds[idx], ref_logits.argmax(-1))


def test_signal_subset_validation(checkpoint_folder, edf_folder, tmp_path):
    folder, _ = checkpoint_folder
    with pytest.raises(ValueError, match='Invalid signal subset'):
        api.predict_on_folder(
            input_folder=edf_folder,
            output_folder=str(tmp_path / 'x'),
            model_folder=folder,
            signals=['PPG'],
        )


def test_predict_with_subset(checkpoint_folder, edf_folder, tmp_path):
    folder, torch_model = checkpoint_folder
    out_folder = str(tmp_path / 'preds_ecg')
    preds, _ = api.predict_on_folder(
        input_folder=edf_folder,
        output_folder=out_folder,
        model_folder=folder,
        signals=['ECG'],
        max_length_hours=1,
        return_tensors=True,
        tmp_root_folder=str(tmp_path / 'cache_ecg'),
    )
    assert len(preds) == 2 and all(len(p) == 120 for p in preds)


def test_torch_export_roundtrip(checkpoint_folder, tmp_path):
    """flax variables -> state_dict.pth must byte-match the original keys."""
    folder, torch_model = checkpoint_folder
    variables = convert_state_dict({k: v.numpy() for k, v in torch_model.state_dict().items()})
    out = str(tmp_path / 'rt.pth')
    export_torch_state_dict(out, variables, MODEL_CFG)
    sd = torch.load(out, weights_only=True)
    orig = torch_model.state_dict()
    assert set(sd.keys()) == set(orig.keys())
    for k in orig:
        np.testing.assert_allclose(sd[k].numpy(), orig[k].numpy(), atol=1e-6, err_msg=k)
    # And torch must load it strictly.
    torch_model.load_state_dict(sd)


def test_save_checkpoint_folder_native(checkpoint_folder, tmp_path):
    """Native save path loads back through api.load_model."""
    folder, torch_model = checkpoint_folder
    variables = convert_state_dict({k: v.numpy() for k, v in torch_model.state_dict().items()})
    out_folder = str(tmp_path / 'ckpt2')
    save_checkpoint_folder(out_folder, MODEL_CFG, variables, torch_compat=True)
    model = api.load_model(out_folder)
    assert model.valid_signals == ['ECG', 'THX']


def test_serve_cli_streaming(checkpoint_folder, edf_folder, tmp_path):
    """scripts/serve.py end-to-end: q16 streaming transport over the EDF
    folder, CSV outputs with datetime timestamps, matching predict_on_folder
    hypnogram values."""
    import importlib.util

    repo = os.path.join(os.path.dirname(__file__), '..')
    spec = importlib.util.spec_from_file_location('serve_cli', os.path.join(repo, 'scripts', 'serve.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    folder, _ = checkpoint_folder
    out = str(tmp_path / 'preds')
    mod.main([
        '--input-folder', edf_folder,
        '--output-folder', out,
        '--model-folder', folder,
        '--transport', 'q16',
        '--precision', 'float32',
        '--batch-size', '2',
        '--max-length-hours', '0.75',
    ])
    csvs = sorted(os.listdir(out))
    assert csvs == ['night0.preds.csv', 'night1.preds.csv']
    df = pd.read_csv(os.path.join(out, csvs[0]), index_col=0)
    assert len(df) == 90  # 45 min = 90 epochs
    assert set(df['Pred'].unique()) <= {0, 1, 2, 3}
    assert df.index[0].startswith('2002-03-01 23:00:30')

    # A grid longer than the recording trims to the real length (parity with
    # api.predict), and existing outputs are skipped without --overwrite.
    out2 = str(tmp_path / 'preds2')
    mod.main([
        '--input-folder', edf_folder,
        '--output-folder', out2,
        '--model-folder', folder,
        '--transport', 'q8',
        '--precision', 'float32',
        '--batch-size', '2',
        '--max-length-hours', '1.0',
    ])
    df2 = pd.read_csv(os.path.join(out2, 'night0.preds.csv'), index_col=0)
    assert len(df2) == 90  # trimmed from the 120-epoch grid
    mod.main([
        '--input-folder', edf_folder,
        '--output-folder', out2,
        '--model-folder', folder,
        '--max-length-hours', '1.0',
    ])  # all outputs exist -> 'Nothing to do' path, no crash
