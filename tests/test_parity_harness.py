"""In-suite drive of the released-checkpoint parity harness
(scripts/parity_vs_released.py): a golden-architecture checkpoint folder +
a synthetic parquet corpus stand in for the unfetchable released weights /
NSRR data, so the harness path (load -> per-(dataset x subset) kappa table
-> optional torch logit diff) is exercised without egress."""

import importlib.util
import json
import os
import sys

import numpy as np
import pandas as pd
import pytest

from tests.conftest import reference_available

FEATURE_DIM = 16
EPOCHS = 6

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
        'initial_channels': 4,
        'max_channels': 8,
        'output_norm': False,
        'use_residual': True,
    },
    'epoch_mixer': {
        '_target_': 'wav2sleep.models.wav2sleep.MultiModalAttentionEmbedder',
        'feature_dim': FEATURE_DIM,
        'dropout': 0.0,
        'activation': 'gelu',
        'layers': 1,
        'dim_ff': 32,
        'nhead': 4,
    },
    'sequence_mixer': {
        '_target_': 'wav2sleep.models.wav2sleep.SequenceCNN',
        'feature_dim': FEATURE_DIM,
        'dropout': 0.0,
        'activation': 'gelu',
        'norm': 'layer',
        'causal': False,
        'num_layers': 1,
        'kernel_size': 3,
        'num_dilations': 2,
    },
}


def _harness():
    spec = importlib.util.spec_from_file_location(
        'parity_vs_released',
        os.path.join(os.path.dirname(__file__), '..', 'scripts', 'parity_vs_released.py'),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def checkpoint_folder(tmp_path_factory):
    import jax

    from wav2sleep_tpu.checkpoint import save_checkpoint_folder
    from wav2sleep_tpu.instantiate import instantiate

    folder = tmp_path_factory.mktemp('ckpt')
    model = instantiate(MODEL_CFG)
    x = {
        'ECG': np.zeros((1, 1024 * 2), np.float32),
        'THX': np.zeros((1, 256 * 2), np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), x)
    save_checkpoint_folder(
        str(folder), MODEL_CFG, jax.device_get(variables), torch_compat=True
    )
    return str(folder)


@pytest.fixture(scope='module')
def parquet_folder(tmp_path_factory):
    rng = np.random.default_rng(0)
    folder = tmp_path_factory.mktemp('nights')
    for ds, n in (('mesa', 2), ('shhs', 1)):
        for i in range(n):
            labels = rng.integers(0, 4, size=EPOCHS)
            ecg = np.concatenate(
                [(lab + 1.0) * np.sin(np.arange(1024) / 3.0) for lab in labels]
            ).astype(np.float32)
            thx_col = np.full(1024 * EPOCHS, np.nan, np.float32)
            thx_col[: 256 * EPOCHS] = np.repeat(labels, 256).astype(np.float32)
            stage = np.full(1024 * EPOCHS, np.nan, np.float32)
            stage[:EPOCHS] = labels
            pd.DataFrame({'ECG': ecg, 'THX': thx_col, 'Stage': stage}).to_parquet(
                folder / f'{ds}-night{i}.parquet'
            )
    return str(folder)


def test_harness_kappa_table(checkpoint_folder, parquet_folder, capsys):
    mod = _harness()
    args = mod.build_parser().parse_args(
        [checkpoint_folder, parquet_folder, '--batch', '2', '--max-length-hours', '1']
    )
    report = mod.run(args)
    rows = {(r['dataset'], r['signals']): r for r in report['rows']}
    # Full set + each single signal, per dataset found in the folder.
    assert set(rows) == {
        ('mesa', 'ECG+THX'), ('mesa', 'ECG'), ('mesa', 'THX'),
        ('shhs', 'ECG+THX'), ('shhs', 'ECG'), ('shhs', 'THX'),
    }
    for r in rows.values():
        assert r['epochs_scored'] == EPOCHS * r['nights']
        assert -1.0 <= r['kappa'] <= 1.0
        assert 0.0 <= r['acc'] <= 1.0
    # stdout is one JSON line per row (machine-readable contract).
    out_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(out_lines) == len(report['rows'])
    for ln in out_lines:
        json.loads(ln)


@pytest.mark.skipif(not reference_available(), reason='reference checkout unavailable')
def test_harness_torch_diff(checkpoint_folder, parquet_folder):
    pytest.importorskip('torch')
    mod = _harness()
    args = mod.build_parser().parse_args(
        [
            checkpoint_folder, parquet_folder,
            '--batch', '2', '--max-length-hours', '1',
            '--subsets', 'ECG,THX', '--torch',
        ]
    )
    report = mod.run(args)
    for r in report['rows']:
        # Converted JAX stack vs reference torch on the same weights: logits
        # agree to float tolerance and hypnograms match.
        assert r['torch_max_abs_logit_diff'] < 5e-4
        assert r['torch_hypnogram_agreement'] == 1.0
