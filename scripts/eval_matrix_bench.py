#!/usr/bin/env python
"""A/B the eval-matrix pipeline: per-batch fetch vs deferred drain.

VERDICT r3 weak-item 5: the eval matrix re-forwards the full val set once
per subset and (until round 4) bounded itself to ONE batch in flight with a
per-batch metric fetch — the treatment that fixed the train loop in round 3
was never applied to eval. Round 4 added the same deferred drain
(``Trainer.eval_fetch_every``); this script measures what that is worth on
real hardware, same session, same corpus: a full ``evaluate('val')`` matrix
pass (combined + per-dataset + signal subsets) timed with
``eval_fetch_every=1`` (the round-3 behavior) vs the default 16.

Run on the prepared convergence-drive corpus (or any WAV2SLEEP_DATA layout):

    timeout 1500 python scripts/eval_matrix_bench.py \
        --data .cache/convergence_drive/data --reps 3

Prints one JSON line. Reference role: the per-subset val loops the upstream
re-runs per dataloader (/root/reference/src/wav2sleep/trainer/main.py:188-224).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--data', default=os.path.join(REPO, '.cache', 'convergence_drive', 'data'))
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--val-batch-size', type=int, default=8)
    ap.add_argument('--precision', default='bfloat16', choices=['float32', 'bfloat16'])
    args = ap.parse_args()

    import jax

    jax.config.update('jax_compilation_cache_dir', os.path.join(REPO, '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from wav2sleep_tpu.settings import ABD, ECG, PPG, THX
    from wav2sleep_tpu.train.datamodule import SleepDataModule
    from wav2sleep_tpu.train.loop import Trainer

    from __graft_entry__ import _flagship_model

    model, _ = _flagship_model()
    dm = SleepDataModule(
        columns=[ECG, PPG, ABD, THX],
        data_location=args.data,
        train_datasets=['mesa'],
        val_datasets=['mesa'],
        test_datasets=['mesa'],
        batch_size=4,
        val_batch_size=args.val_batch_size,
        num_workers=1,
        max_length_hours=10,
    )
    trainer = Trainer(
        model=model,
        datamodule=dm,
        num_classes=4,
        epochs=1,
        lr=1e-3,
        masker=None,
        log_dir=os.path.join(REPO, 'runs', 'eval_matrix_bench'),
        precision=args.precision,
        seed=0,
    )
    # Eval timing is architecture/transfer-bound, not weights-bound: random
    # init is fine. Initialize state from one train batch.
    example = next(iter(dm.train_loader(0)))
    trainer._ensure_state(example)

    # Warm-up pass: compiles the eval graph for every presence-mask variant
    # and page-warms the loader path (untimed).
    trainer.eval_fetch_every = 16
    trainer.evaluate('val', epoch=0)

    def timed(fetch_every: int, transport: str | None = None) -> float:
        trainer.eval_fetch_every = fetch_every
        trainer.eval_transport = transport
        t0 = time.time()
        trainer.evaluate('val', epoch=0)
        trainer.eval_transport = None
        return time.time() - t0

    import numpy as np

    # Transport-arm warmups (compile the decode graphs untimed) + metric
    # deltas vs the lossless pass (same params, same batches: the delta IS
    # the transport's quantization, nothing else).
    def metrics(transport):
        trainer.eval_transport = transport
        out = trainer.evaluate('val', epoch=0)
        trainer.eval_transport = None
        return out

    base = metrics(None)
    deltas = {
        t: max(abs(m[k] - base[k]) for k in base)
        for t, m in (('q16', metrics('q16')), ('q8', metrics('q8')))
    }

    arms: dict[str, list[float]] = {k: [] for k in ('per_batch', 'deferred', 'q16', 'q8')}
    for _ in range(args.reps):
        # Alternate orders so link drift cancels.
        arms['per_batch'].append(timed(1))
        arms['deferred'].append(timed(16))
        arms['q16'].append(timed(16, 'q16'))
        arms['q8'].append(timed(16, 'q8'))
    n_val = len(dm._val_fps_combined)
    med = {k: float(np.median(v)) for k, v in arms.items()}
    out = {
        'metric': 'full val eval-matrix wall seconds (combined + per-dataset + subsets)',
        'val_nights': n_val,
        'val_batch_size': args.val_batch_size,
        'precision': args.precision,
        'per_batch_fetch_s': round(med['per_batch'], 2),
        'deferred_drain_s': round(med['deferred'], 2),
        'q16_transport_s': round(med['q16'], 2),
        'q8_transport_s': round(med['q8'], 2),
        'speedup_drain': round(med['per_batch'] / med['deferred'], 3),
        'speedup_q16': round(med['deferred'] / med['q16'], 3),
        'speedup_q8': round(med['deferred'] / med['q8'], 3),
        'max_abs_loss_delta_q16': float(f'{deltas["q16"]:.3g}'),
        'max_abs_loss_delta_q8': float(f'{deltas["q8"]:.3g}'),
        **{f'{k}_all_s': [round(v, 2) for v in vs] for k, vs in arms.items()},
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
