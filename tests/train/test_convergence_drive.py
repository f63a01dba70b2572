"""Unit coverage for scripts/convergence_drive.py's evidence distiller and
the 5-class (EOG) annotation path. The full drive itself runs on hardware
(docs/measurements/convergence_drive_r5/), but the logic that turns a run's
metrics.jsonl into the three selection claims — early-stopped, LR-reduced,
best != last — must hold without a TPU.
"""

import importlib.util
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    'convergence_drive', os.path.join(REPO, 'scripts', 'convergence_drive.py')
)
cd = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cd)


def _write_metrics(fp, rows):
    with open(fp, 'w') as f:
        for r in rows:
            f.write(json.dumps(r) + '\n')


def test_selection_evidence_all_three_claims(tmp_path):
    fp = tmp_path / 'metrics.jsonl'
    # 8 epochs of a 60-cap run: best at epoch 3, LR reduced at epoch 6,
    # train + eval rows interleaved (same step) like the real logger.
    val = [1.0, 0.8, 0.7, 0.65, 0.66, 0.67, 0.68, 0.69]
    lr = [1e-3] * 6 + [1e-4] * 2
    rows = []
    for e in range(8):
        rows.append({'step': e, 'train_loss': 1.0, 'lr': lr[e], 'lr_step': e})
        rows.append({'step': e, 'val_loss': val[e]})
    _write_metrics(fp, rows)
    ev = cd.selection_evidence(str(fp), epoch_cap=60)
    assert ev['early_stopped'] is True
    assert ev['epochs_run'] == 8
    assert ev['best_epoch'] == 3 and ev['last_epoch'] == 7
    assert ev['best_is_last'] is False
    assert ev['plateau_lr_reduced'] is True
    assert ev['lr_reduction_epochs'] == [6]
    assert ev['distinct_lr_values'] == [1e-3, 1e-4]
    assert ev['eval_transport_ab'] is None  # no shadow series logged


def test_selection_evidence_eval_transport_ab(tmp_path):
    """The shadow val_loss_q16 series yields the lossless-vs-q16 best-epoch
    A/B (VERDICT r4 item 8): agreement flag + max per-epoch delta."""
    fp = tmp_path / 'metrics.jsonl'
    val = [1.0, 0.8, 0.70, 0.75, 0.9]
    q16 = [1.0001, 0.8002, 0.7501, 0.7499, 0.9001]  # best flips 2 -> 3
    rows = []
    for e in range(5):
        rows.append({'step': e, 'val_loss': val[e], 'lr': 1e-3})
        rows.append({'step': e, 'val_loss_q16': q16[e]})
    _write_metrics(fp, rows)
    ab = cd.selection_evidence(str(fp), epoch_cap=60)['eval_transport_ab']
    assert ab['shadow_transport'] == 'q16'
    assert ab['epochs_compared'] == 5
    assert ab['best_epoch_lossless'] == 2 and ab['best_epoch_q16'] == 3
    assert ab['selection_agrees'] is False
    assert ab['max_abs_val_loss_delta'] == round(max(abs(a - b) for a, b in zip(val, q16)), 8)


def test_selection_evidence_detects_cap_run(tmp_path):
    fp = tmp_path / 'metrics.jsonl'
    rows = []
    for e in range(5):
        rows.append({'step': e, 'val_loss': 1.0 - 0.1 * e, 'lr': 1e-3})
    _write_metrics(fp, rows)
    ev = cd.selection_evidence(str(fp), epoch_cap=5)
    assert ev['early_stopped'] is False
    assert ev['best_is_last'] is True
    assert ev['plateau_lr_reduced'] is False


def test_write_nsrr_xml_five_class_roundtrip(tmp_path):
    from wav2sleep_tpu.data.xml import parse_xml_annotations

    stages = np.array([0, 1, 1, 2, 3, 4, 4, 0], np.int32)
    fp = tmp_path / 'night-nsrr.xml'
    cd.write_nsrr_xml(str(fp), stages, cd.SYNTH_TO_NSRR_5)
    # parse_xml_annotations applies convert_int_stage itself (REM raw 5 -> 4).
    decoded = parse_xml_annotations(str(fp)).to_numpy()
    assert np.array_equal(decoded, stages)
