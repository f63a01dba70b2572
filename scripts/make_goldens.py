#!/usr/bin/env python
"""Generate vendored golden-parity artifacts (dev tool, needs torch + the
reference checkout).

For each released-architecture variant this records, into
``tests/goldens/<name>.npz``: a pinned-seed reference-torch state_dict, a
fixed input batch (including a missing-modality row), and the reference
logits. ``tests/model/test_goldens.py`` then replays the converter + JAX
forward against the recorded logits WITHOUT needing torch or the reference
checkout — converter/semantics regressions are caught even where the live
differential suite can't run, and drift in either stack shows up against the
frozen values. (The actual released checkpoints are not fetchable in this
environment — no egress — so pinned-seed module goldens stand in; see
reference src/wav2sleep/hub.py:10-23 for the released variants mirrored
here.)

Channel widths are reduced (initial 8 / max 32) to keep artifacts ~1 MB
while exercising every converted module type: per-signal + shared (UNI)
encoders with signal embeddings, instance/layer norms, packed-qkv
transformer layers with CLS + register tokens, dilated sequence mixers, and
both 4- and 5-class heads.
"""

from __future__ import annotations

import importlib
import io
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_SRC = os.environ.get('W2S_REFERENCE_SRC', '/root/reference/src')
OUT_DIR = os.path.join(REPO, 'tests', 'goldens')


def load_reference_module(modname: str):
    """Import a reference submodule without executing the reference package
    __init__ (its deps aren't installed here) — same trick as tests/conftest."""
    if 'wav2sleep' not in sys.modules or not hasattr(sys.modules['wav2sleep'], '__w2s_stub__'):
        pkg = types.ModuleType('wav2sleep')
        pkg.__path__ = [os.path.join(REFERENCE_SRC, 'wav2sleep')]
        pkg.__w2s_stub__ = True
        sys.modules['wav2sleep'] = pkg
    return importlib.import_module(modname)


CARDIO_CFG = {
    'num_classes': 4,
    'signal_map': {'ABD': 'ABD', 'THX': 'THX', 'ECG': 'ECG', 'PPG': 'PPG'},
    'encoders': {
        'feature_dim': 32,
        'activation': 'gelu',
        'norm': 'instance',
        'chunk_causal': False,
        'initial_channels': 8,
        'max_channels': 32,
    },
    'epoch_mixer': {'feature_dim': 32, 'layers': 2, 'dropout': 0.0, 'dim_ff': 64, 'nhead': 4},
    'sequence_mixer': {
        'feature_dim': 32,
        'dropout': 0.0,
        'activation': 'gelu',
        'norm': 'layer',
        'num_layers': 2,
        'kernel_size': 7,
        'num_dilations': 3,
    },
    'S': 8,
    'B': 2,
}

EOG_CFG = {
    'num_classes': 5,
    'signal_map': {'EOG-L': 'UNI', 'EOG-R': 'UNI'},
    'encoders': {
        'feature_dim': 24,
        'activation': 'gelu',
        'norm': 'instance',
        'chunk_causal': False,
        'initial_channels': 4,
        'max_channels': 16,
        'embed_signals': True,
    },
    'epoch_mixer': {
        'feature_dim': 24,
        'layers': 1,
        'dropout': 0.0,
        'dim_ff': 48,
        'nhead': 4,
        'register_tokens': 2,
    },
    'sequence_mixer': {
        'feature_dim': 24,
        'dropout': 0.0,
        'activation': 'gelu',
        'norm': 'layer',
        'num_layers': 1,
        'kernel_size': 7,
        'num_dilations': 2,
    },
    'S': 3,
    'B': 2,
}


def build_torch(ref_models, cfg, torch):
    return ref_models.Wav2Sleep(
        signal_encoders=ref_models.SignalEncoders(signal_map=cfg['signal_map'], **cfg['encoders']),
        epoch_mixer=ref_models.MultiModalAttentionEmbedder(**cfg['epoch_mixer']),
        sequence_mixer=ref_models.SequenceCNN(**cfg['sequence_mixer']),
        num_classes=cfg['num_classes'],
    )


def make_golden(name: str, cfg: dict, seed: int) -> None:
    import torch

    from wav2sleep_tpu.settings import COLS_TO_SAMPLES_PER_EPOCH

    ref_models = load_reference_module('wav2sleep.models.wav2sleep')
    torch.manual_seed(seed)
    tmodel = build_torch(ref_models, cfg, torch)
    tmodel.eval()

    rng = np.random.default_rng(seed)
    B, S = cfg['B'], cfg['S']
    x = {
        col: rng.normal(size=(B, COLS_TO_SAMPLES_PER_EPOCH[col] * S)).astype(np.float32)
        for col in cfg['signal_map']
    }
    # One missing modality in one batch row (the -inf sentinel path).
    first = sorted(cfg['signal_map'])[0]
    x[first][1] = -np.inf

    with torch.no_grad():
        logits = tmodel({k: torch.from_numpy(v) for k, v in x.items()}).numpy()

    payload = {f'sd/{k}': v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    payload.update({f'in/{k}': v for k, v in x.items()})
    payload['logits'] = logits
    payload['config_json'] = np.frombuffer(
        json.dumps(cfg).encode(), dtype=np.uint8
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, f'{name}.npz')
    buf = io.BytesIO()
    np.savez_compressed(buf, **payload)
    with open(out, 'wb') as f:
        f.write(buf.getvalue())
    print(f'{out}: {os.path.getsize(out) / 1e6:.2f} MB, logits {logits.shape}')


if __name__ == '__main__':
    make_golden('wav2sleep_cardio', CARDIO_CFG, seed=1234)
    make_golden('wav2sleep_eog', EOG_CFG, seed=5678)
