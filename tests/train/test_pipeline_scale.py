"""Unit coverage for scripts/pipeline_scale_bench.py's evidence distiller.
The measurement itself runs on hardware over the 1,000-night corpus
(docs/measurements/pipeline_scale_r5.json); the logic turning a run's
metrics.jsonl into sustained ms/step + loader-stall fraction must hold
without a TPU."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    'pipeline_scale_bench', os.path.join(REPO, 'scripts', 'pipeline_scale_bench.py')
)
psb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(psb)


def test_distil_sustained_excludes_cold_epoch(tmp_path):
    fp = tmp_path / 'metrics.jsonl'
    rows = [
        # epoch 0: compile-diluted loader frac, slow cold steps
        {'step': 0, 'train_loss': 1.0, 'train_steps_per_sec': 0.5, 'host_loader_frac': 0.1},
        {'step': 0, 'val_loss': 0.9},
        {'step': 1, 'train_loss': 0.9, 'train_steps_per_sec': 2.0, 'host_loader_frac': 0.4},
        {'step': 2, 'train_loss': 0.8, 'train_steps_per_sec': 2.5, 'host_loader_frac': 0.5},
    ]
    with open(fp, 'w') as f:
        for r in rows:
            f.write(json.dumps(r) + '\n')
    out = psb.distil(str(fp), {'steps_per_epoch': 100})
    assert [r['epoch'] for r in out['epochs']] == [0, 1, 2]
    assert out['cold_epoch0_ms_per_step'] == 2000.0
    # sustained = epochs >= 1 only
    assert out['sustained_ms_per_step'] == pytest.approx((500.0 + 400.0) / 2)
    assert out['sustained_host_loader_frac'] == pytest.approx(0.45)
    assert out['epochs'][1]['epoch_seconds'] == pytest.approx(50.0)


def test_distil_requires_train_rows(tmp_path):
    fp = tmp_path / 'metrics.jsonl'
    fp.write_text(json.dumps({'step': 0, 'val_loss': 1.0}) + '\n')
    with pytest.raises(RuntimeError, match='no train rows'):
        psb.distil(str(fp), {})
