#!/usr/bin/env python
"""Convergence-scale training drive: the full production loop, run to
early-stopping completion on real hardware (VERDICT r3 item 2, r4 item 3/4).

Everything prior rounds only exercised for 1-2 epochs fires for real here:
early stopping (patience 5) must actually trigger BEFORE the epoch cap, the
plateau LR controller must step (and the logged ``lr`` values must show it),
the EMA eval-swap and best-vs-last checkpoint selection must run over tens
of epochs with best != last, the full eval matrix runs every epoch, and the
best checkpoint is exported and reloaded through the public API at the end.
Reference role: a full ``scripts/train.py`` fit of the upstream repo
(/root/reference/scripts/train.py:88-105) driven by its hydra config with
Lightning EarlyStopping/ModelCheckpoint callbacks + LearningRateMonitor.

The default corpus uses the difficulty knobs (``--label-noise`` /
``--overlap``, data/synth.py): label flips put an irreducible floor under
val_loss so it genuinely plateaus — on the easy corpus (r4) val_loss fell
monotonically all 60 epochs and none of the selection machinery ever fired.

Two phases:

``--prepare`` (CPU): N distinct realistic-morphology nights
(wav2sleep_tpu/data/synth.py) written as EDF + NSRR annotation XML pairs,
then ingested through the REAL offline pipeline (``process_night``: EDF
reader -> alias matching -> unit QC -> grid resample -> parquet with label
join) into ``<root>/data/mesa/{train,val,test}``.

default (TPU): drive ``scripts/train.py``'s ``main()`` on that corpus with
the production knobs (plateau scheduler, EMA with eval-swap, early stopping
patience 5, test pass, best-checkpoint restore + export), then reload the
exported checkpoint via the public API and re-score the test nights.
Artifacts (metrics.jsonl, summary + final kappa table + selection evidence)
are copied to ``--out`` — ``runs/`` is gitignored, the evidence must live
somewhere inspectable.

``--signals eog`` switches everything to the second released-variant
topology (reference src/wav2sleep/hub.py:17-23): EOG-L/EOG-R at 4,096
samples/epoch, 5-class labels, ``inputs=neural/eog``.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

logger = logging.getLogger('convergence_drive')

# Synthetic 4-class stages (Wake/Light/Deep/REM, data/synth.py) -> raw NSRR
# stage codes as scored in annotation XMLs: Light is scored N2 (2), Deep N3
# (3), REM carries raw code 5 (data/utils.py convert_int_stage maps 5 -> 4).
SYNTH_TO_NSRR = {0: 0, 1: 2, 2: 3, 3: 5}
# 5-class EOG stages (Wake/N1/N2/N3/REM) -> raw NSRR codes (REM scored 5).
SYNTH_TO_NSRR_5 = {0: 0, 1: 1, 2: 2, 3: 3, 4: 5}


def write_nsrr_xml(fp: str, stages, stage_map=None) -> None:
    """NSRR-format annotation XML for one night (30 s epochs, run-length
    encoded like real NSRR exports; format pinned by data/xml.py's parser)."""
    stage_map = SYNTH_TO_NSRR if stage_map is None else stage_map
    parts = [
        '<Events>',
        '<ScoredEvent>',
        '<EventConcept>Recording Start Time</EventConcept>\n<Start>0</Start>',
        '</ScoredEvent>',
    ]
    t = 0.0
    run_stage, run_len = int(stages[0]), 0
    runs = []
    for s in stages:
        if int(s) == run_stage:
            run_len += 1
        else:
            runs.append((run_stage, run_len))
            run_stage, run_len = int(s), 1
    runs.append((run_stage, run_len))
    for stage, n in runs:
        dur = 30.0 * n
        parts.append(
            '<ScoredEvent>\n'
            '<EventType>Stages.Stages</EventType>\n'
            f'<EventConcept>Stage|{stage_map[stage]}</EventConcept>\n'
            f'<Start>{t:g}</Start>\n'
            f'<Duration>{dur:g}</Duration>\n'
            '</ScoredEvent>'
        )
        t += dur
    parts.append('</Events>')
    with open(fp, 'w') as f:
        f.write('\n'.join(parts))


def prepare(root: str, nights: int, hours: float, seed: int, args) -> None:
    """Synth EDF+XML pairs -> real ingest -> split-partitioned parquet.

    Nights are seeded per-index (seed, i) so the corpus is resume-safe: an
    interrupted --prepare that resumes (skipping existing parquets) produces
    bit-identical nights to a fresh uninterrupted run of the same seed.
    """
    import numpy as np

    from wav2sleep_tpu.data.synth import synth_night, synth_night_eog, write_night_edf
    from wav2sleep_tpu.ingest import process_night
    from wav2sleep_tpu.settings import ABD, ECG, EOG_L, EOG_R, PPG, THX

    if args.signals == 'eog':
        gen, columns, stage_map = synth_night_eog, [EOG_L, EOG_R], SYNTH_TO_NSRR_5
    else:
        gen, columns, stage_map = synth_night, [ECG, PPG, ABD, THX], SYNTH_TO_NSRR

    n_val = n_test = max(2, nights // 8)
    n_train = nights - n_val - n_test
    splits = ['train'] * n_train + ['val'] * n_val + ['test'] * n_test
    edf_dir = os.path.join(root, 'edfs')
    os.makedirs(edf_dir, exist_ok=True)
    t0 = time.time()
    written = 0
    for i, split in enumerate(splits):
        out_fp = os.path.join(root, 'data', 'mesa', split, f'night{i:04d}.parquet')
        if os.path.exists(out_fp):
            continue
        signals, stages = gen(
            np.random.default_rng((seed, i)),
            hours,
            overlap=args.overlap,
            label_noise=args.label_noise,
        )
        edf_fp = os.path.join(edf_dir, f'night{i:04d}.edf')
        xml_fp = os.path.join(edf_dir, f'night{i:04d}-nsrr.xml')
        write_night_edf(edf_fp, signals)
        write_nsrr_xml(xml_fp, stages, stage_map)
        ok = process_night(edf_fp, xml_fp, out_fp, columns=columns)
        if not ok:
            raise RuntimeError(f'ingest failed for night {i} ({split})')
        # EDFs are only scaffolding for the ingest; keep the disk bounded.
        os.remove(edf_fp)
        os.remove(xml_fp)
        written += 1
        if written % 8 == 0:
            rate = written / (time.time() - t0)
            print(
                f'[prepare] {written} ingested ({i + 1}/{nights} scanned, '
                f'{rate:.2f} nights/s)',
                flush=True,
            )
    print(f'[prepare] done: {nights} nights under {root}/data in {time.time() - t0:.0f}s', flush=True)


def drive(root: str, args, extra: list[str]) -> dict:
    """Run the fit SUPERVISED (train/supervise.py): scripts/train.py in a
    subprocess pinned to one run_dir, stall-watchdogged, restarted from the
    last epoch checkpoint on a transport wedge (docs/design.md "Transport
    fault tolerance" — the relay's D2H reply path can die mid-run, and only
    a fresh process recovers the channel)."""
    import json as _json

    from wav2sleep_tpu.train.supervise import run_supervised

    inputs = 'neural/eog' if args.signals == 'eog' else 'cardiorespiratory/all'
    os.environ['WAV2SLEEP_DATA'] = os.path.join(root, 'data')
    os.environ['WAV2SLEEP_STORAGE'] = os.path.join(root, 'storage')
    t0 = time.time()
    overrides = [
        f'name={args.name}',
        'datasets=mesa',
        f'inputs={inputs}',
        f'seed={args.seed}',
        f'epochs={args.epochs}',
        f'batch_size={args.batch_size}',
        f'target_batch_size={args.batch_size}',
        'training/scheduler=decay',  # ReduceLROnPlateau role (name: plateau)
        'training.ema.enabled=true',
        'training.ema.decay=0.999',
        'training.ema.start_step=50',
        'training.val_batch_size=8',
        'training.test_batch_size=8',
        'test=true',
        'restore_best=true',
        # Shadow q16 eval each epoch: one run answers whether best-epoch
        # selection would differ under the cheaper eval transport
        # (VERDICT r4 item 8); selection itself stays lossless.
        'shadow_eval_transport=q16',
        'precision=bfloat16',
        'input_transport=q8',
        'num_cpus=1',
    ]
    if args.signals == 'eog':
        overrides.append('num_classes=5')
        # The EOG topology ships ~20 MB PER-SIGNAL H2D transfers (4,096 spe
        # x 1,200 epochs x batch 4, q8) — 4x cardio's largest — and under
        # that traffic the relay's reply path dies far more often, so also
        # minimize the fetch count: defer the metric drain past the 24-step
        # epoch (HBM cost <= steps/epoch staged batches, ~1 GB).
        overrides += ['training.metric_fetch_every=64']
    run_dir = os.path.join(root, 'storage', 'logs', args.name, 'supervised', 'run')
    run_supervised(overrides + extra, run_dir)
    with open(os.path.join(run_dir, 'final_metrics.json')) as f:
        final = _json.load(f)
    final['drive_wall_seconds'] = round(time.time() - t0, 1)
    return final


def selection_evidence(metrics_fp: str, epoch_cap: int) -> dict:
    """Distil the per-epoch log into the three claims this harness exists to
    prove (VERDICT r4 item 3): early stopping fired before the cap, the
    plateau controller reduced the LR (visible in the logged ``lr`` values,
    the LRMonitor role), and the best epoch is not the last one."""
    epochs = {}
    with open(metrics_fp) as f:
        for line in f:
            row = json.loads(line)
            epochs.setdefault(row['step'], {}).update(row)
    val = {e: r['val_loss'] for e, r in sorted(epochs.items()) if 'val_loss' in r}
    lr = {e: r['lr'] for e, r in sorted(epochs.items()) if 'lr' in r}
    if not val:
        raise RuntimeError(f'no val_loss rows in {metrics_fp}')
    last_epoch = max(val)
    best_epoch = min(val, key=val.get)
    lr_values = sorted(set(lr.values()), reverse=True)
    reductions = [e for e in sorted(lr)[1:] if lr[e] < lr[e - 1] * 0.999]
    # Eval-transport A/B (VERDICT r4 item 8): the shadow q16 series logged
    # alongside the lossless one — would best-epoch selection have differed?
    shadow = {
        e: r['val_loss_q16'] for e, r in sorted(epochs.items()) if 'val_loss_q16' in r
    }
    ab = None
    if shadow:
        common = sorted(set(val) & set(shadow))
        best_q16 = min(common, key=lambda e: shadow[e])
        ab = {
            'shadow_transport': 'q16',
            'epochs_compared': len(common),
            'best_epoch_lossless': min(common, key=lambda e: val[e]),
            'best_epoch_q16': best_q16,
            'selection_agrees': min(common, key=lambda e: val[e]) == best_q16,
            'max_abs_val_loss_delta': round(
                max(abs(val[e] - shadow[e]) for e in common), 8
            ),
        }
    return {
        'eval_transport_ab': ab,
        'epochs_run': last_epoch + 1,
        'epoch_cap': epoch_cap,
        'early_stopped': last_epoch + 1 < epoch_cap,
        'best_epoch': best_epoch,
        'last_epoch': last_epoch,
        'best_is_last': best_epoch == last_epoch,
        'best_val_loss': round(val[best_epoch], 6),
        'last_val_loss': round(val[last_epoch], 6),
        'distinct_lr_values': [round(v, 8) for v in lr_values],
        'lr_reduction_epochs': reductions,
        'plateau_lr_reduced': len(lr_values) > 1,
    }


def collect(root: str, final: dict, args) -> dict:
    """Copy the run's evidence into the repo (runs/ itself is gitignored)."""
    import glob

    import numpy as np

    out_dir = args.out
    os.makedirs(out_dir, exist_ok=True)
    run_dirs = sorted(glob.glob(os.path.join(root, 'storage', 'logs', args.name, '*', '*')))
    run_dir = run_dirs[-1]
    for name in ('metrics.jsonl', 'config.yaml'):
        src = os.path.join(run_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, name))

    evidence = selection_evidence(os.path.join(run_dir, 'metrics.jsonl'), args.epochs)

    # Re-score the exported best checkpoint through the PUBLIC api on the
    # held-out test nights: the deployment artifact, not the in-process
    # state, is what the kappa table certifies.
    from wav2sleep_tpu.api import load_model, predict_on_folder
    from wav2sleep_tpu.settings import IGNORE_LABEL
    from wav2sleep_tpu.stats import cohens_kappa

    model = load_model(os.path.join(run_dir, 'model'))
    test_folder = os.path.join(root, 'data', 'mesa', 'test')
    test_fps = sorted(glob.glob(os.path.join(test_folder, '*.parquet')))
    preds, labels = predict_on_folder(
        test_folder,
        os.path.join(root, 'storage', 'drive_preds'),
        model=model,
        preprocess=False,  # the corpus is already grid-resampled parquet
        return_tensors=True,
        overwrite=True,
    )
    n_classes = model.num_classes
    cmat = np.zeros((n_classes, n_classes), np.int64)
    p = np.asarray(preds).reshape(-1).astype(int)
    t = np.asarray(labels).reshape(-1).astype(int)
    keep = t != IGNORE_LABEL
    np.add.at(cmat, (t[keep], p[keep]), 1)
    acc = float(np.trace(cmat) / max(cmat.sum(), 1))
    kappa = float(cohens_kappa(cmat, n_classes))
    summary = {
        'signals': args.signals,
        'num_classes': n_classes,
        'corpus': {
            'nights': args.nights,
            'hours': args.hours,
            'label_noise': args.label_noise,
            'overlap': args.overlap,
        },
        'selection': evidence,
        'final_metrics': final,
        'exported_checkpoint_test': {
            'nights': len(test_fps),
            'scored_epochs': int(keep.sum()),
            'accuracy': round(acc, 5),
            'kappa': round(kappa, 5),
            'confusion_matrix': cmat.tolist(),
        },
        'run_dir': run_dir,
    }
    with open(os.path.join(out_dir, 'summary.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({'selection': evidence, **summary['exported_checkpoint_test']}), flush=True)
    return summary


def main(argv=None) -> dict | None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--root', default=os.path.join(REPO, '.cache', 'convergence_drive_r5'))
    ap.add_argument('--name', default='r5_convergence_drive', help='run name (storage/logs subdir)')
    ap.add_argument('--nights', type=int, default=128)
    ap.add_argument('--hours', type=float, default=10.0)
    ap.add_argument('--epochs', type=int, default=60)
    ap.add_argument('--batch-size', type=int, default=4)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--signals', default='cardio', choices=['cardio', 'eog'])
    ap.add_argument(
        '--label-noise',
        type=float,
        default=0.12,
        help='fraction of epochs whose LABEL is re-scored to a random other '
        'stage (signals stay true): puts an irreducible floor under val_loss',
    )
    ap.add_argument(
        '--overlap',
        type=float,
        default=0.0,
        help='0..1 blend of per-stage physiology toward the mean (lowers the '
        'accuracy ceiling; see data/synth.py)',
    )
    ap.add_argument('--prepare', action='store_true', help='corpus phase only (CPU)')
    ap.add_argument(
        '--out',
        default=os.path.join(REPO, 'docs', 'measurements', 'convergence_drive_r5'),
        help='where the committed evidence lands',
    )
    args, extra = ap.parse_known_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.prepare:
        prepare(args.root, args.nights, args.hours, args.seed, args)
        return None
    final = drive(args.root, args, extra)
    print('FINAL', json.dumps(final), flush=True)
    return collect(args.root, final, args)


if __name__ == '__main__':
    main()
