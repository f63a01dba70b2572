#!/usr/bin/env python
"""Released-checkpoint parity harness: per-(dataset x signal-subset) kappa.

The framework's north star is Cohen's kappa parity with the reference's
released checkpoints (BASELINE.md; reference hub variants
src/wav2sleep/hub.py:10-23). The released weights and NSRR data are not
fetchable in the build sandbox (no egress), so this script is the runnable
harness for when they ARE available:

    python scripts/parity_vs_released.py hf://joncarter/wav2sleep \\
        /path/to/parquet --subsets "ECG;ECG,THX;PPG;PPG,THX"

For every dataset found in the parquet folder (inferred from filenames via
the NSRR registry, data/nsrr.py) and every requested signal subset it runs
the JAX model end-to-end and prints a kappa/accuracy table — the same
metrics the reference's predict CLI reports (scripts/predict.py:115-122
there) and the numbers to place next to the paper's.

With ``--torch`` it ALSO loads the very same checkpoint folder into the
reference PyTorch implementation (stub-imported from --reference-src,
default /root/reference/src) and reports max-abs-logit-diff + hypnogram
agreement between the two stacks on every night — the direct converter
parity check on real weights.

One JSON line per (dataset, subset) row lands on stdout (plus a readable
table on stderr); ``--json OUT`` writes the full report to a file.

In-suite coverage: tests/test_parity_harness.py drives this module against
a golden-architecture checkpoint folder and a synthetic parquet corpus, so
the path is exercised without egress.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('model_folder', help='checkpoint folder or hf://user/repo')
    p.add_argument('parquet_folder', help='folder of ingested parquet nights')
    p.add_argument(
        '--subsets',
        default=None,
        help="semicolon-separated signal subsets, e.g. 'ECG;ECG,THX;PPG' "
        '(default: the full modality set plus each single signal)',
    )
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--max-length-hours', type=int, default=10)
    p.add_argument('--num-classes', type=int, default=None, help='default: from the model')
    p.add_argument('--torch', action='store_true', help='also diff logits vs the reference torch stack')
    p.add_argument('--reference-src', default=os.environ.get('W2S_REFERENCE_SRC', '/root/reference/src'))
    p.add_argument('--json', default=None, help='write the full report to this file')
    return p


def _confusion(preds: list[np.ndarray], labels: list[np.ndarray], C: int) -> np.ndarray:
    cmat = np.zeros((C, C), np.int64)
    for p, y in zip(preds, labels):
        m = y >= 0
        if m.any():
            np.add.at(cmat, (y[m].astype(int), p[m].astype(int)), 1)
    return cmat


def _load_reference_torch(model_folder: str, reference_src: str):
    """Reference torch model from the SAME checkpoint folder (stub import:
    the reference package __init__ needs deps absent here)."""
    import torch
    import yaml

    if 'wav2sleep' not in sys.modules or not hasattr(sys.modules['wav2sleep'], '__w2s_stub__'):
        pkg = types.ModuleType('wav2sleep')
        pkg.__path__ = [os.path.join(reference_src, 'wav2sleep')]
        pkg.__w2s_stub__ = True
        sys.modules['wav2sleep'] = pkg

    def instantiate_t(cfg):
        if isinstance(cfg, dict) and '_target_' in cfg:
            target = cfg['_target_']
            modname, clsname = target.rsplit('.', 1)
            modname = modname.replace('wav2sleep_tpu.models', 'wav2sleep.models')
            cls = getattr(importlib.import_module(modname), clsname)
            kw = {k: instantiate_t(v) for k, v in cfg.items() if k != '_target_'}
            return cls(**kw)
        return cfg

    with open(os.path.join(model_folder, 'config.yaml')) as f:
        cfg = yaml.safe_load(f)
    model = instantiate_t(cfg)
    sd = torch.load(os.path.join(model_folder, 'state_dict.pth'), weights_only=True)
    model.load_state_dict(sd)
    return model.eval()


def _torch_logits(tmodel, x: dict[str, np.ndarray]) -> np.ndarray:
    import torch

    with torch.inference_mode():
        xt = {k: torch.from_numpy(np.ascontiguousarray(v)).float() for k, v in x.items()}
        if len(xt) == 1 and not hasattr(tmodel, 'signal_encoders'):
            out = tmodel(next(iter(xt.values())))
        else:
            out = tmodel(xt)
    return out.numpy()


def run(args) -> dict:
    from wav2sleep_tpu import api
    from wav2sleep_tpu.data.nsrr import get_dataset
    from wav2sleep_tpu.stats import cohens_kappa, confusion_accuracy

    # Resolve hf:// to the local snapshot up front so the torch loader below
    # sees the same on-disk folder load_model reads (load_model resolves
    # internally but does not expose the path).
    from wav2sleep_tpu.hub import download_from_hub, is_hf_repo_id

    folder = args.model_folder
    if is_hf_repo_id(folder):
        folder = download_from_hub(folder)
    model = api.load_model(folder)
    C = args.num_classes or model.num_classes
    valid = list(model.valid_signals)
    if args.subsets:
        subsets = [tuple(s.strip().split(',')) for s in args.subsets.split(';') if s.strip()]
    else:
        subsets = [tuple(valid)] + [(s,) for s in valid if len(valid) > 1]
    for sub in subsets:
        unknown = set(sub) - set(valid)
        if unknown:
            raise ValueError(f'subset {sub} not in model.valid_signals={valid}')

    from wav2sleep_tpu.api import _get_parquet_files

    by_dataset: dict[str, list[str]] = {}
    for fp in sorted(_get_parquet_files(args.parquet_folder)):
        try:
            ds = get_dataset(fp)
        except ValueError:
            ds = 'unknown'
        by_dataset.setdefault(ds, []).append(fp)

    tmodel = None
    if args.torch:
        tmodel = _load_reference_torch(folder, args.reference_src)

    from wav2sleep_tpu.data.dataset import ParquetDataset

    rows = []
    for ds_name, fps in sorted(by_dataset.items()):
        for sub in subsets:
            dataset = ParquetDataset(
                parquet_fps=fps,
                num_classes=C,
                columns=list(sub),
                require_labels=False,
                max_length_hours=args.max_length_hours,
                causal=model.causal,
            )
            preds, labels = api.predict(model, dataset, batch_size=args.batch)
            row = {
                'dataset': ds_name,
                'signals': '+'.join(sub),
                'nights': len(fps),
            }
            if labels is not None:
                cmat = _confusion(preds, labels, C)
                row['epochs_scored'] = int(cmat.sum())
                row['acc'] = round(confusion_accuracy(cmat), 4)
                row['kappa'] = round(cohens_kappa(cmat, n_classes=C), 4)
            else:
                row['epochs_scored'] = 0
            if tmodel is not None:
                from wav2sleep_tpu.api import EPOCH_BUCKET
                from wav2sleep_tpu.data.dataset import pad_or_truncate_item
                from wav2sleep_tpu.settings import MEDIUM_FREQ_SAMPLES_PER_EPOCH

                max_diff, agree_n, total = 0.0, 0, 0
                for i in range(len(dataset)):
                    x, y = dataset[i]
                    n = len(y)
                    # Pad to the same epoch buckets api.predict uses: raw
                    # per-night lengths would compile one fresh XLA graph
                    # per distinct night length (minutes each on TPU).
                    if model.family == 'ppgnet':
                        bucket = model.module.INPUT_LENGTH // MEDIUM_FREQ_SAMPLES_PER_EPOCH
                    else:
                        bucket = int(np.ceil(n / EPOCH_BUCKET) * EPOCH_BUCKET)
                    x, _ = pad_or_truncate_item((x, y), bucket)
                    xb = {k: np.asarray(v)[None] for k, v in x.items()}
                    n = min(n, bucket)
                    lj = model.logits(xb)[0][:n]
                    lt = _torch_logits(tmodel, xb)[0][:n]
                    max_diff = max(max_diff, float(np.abs(lj - lt).max()))
                    agree_n += int((lj.argmax(-1) == lt.argmax(-1)).sum())
                    total += lj.shape[0]
                row['torch_max_abs_logit_diff'] = round(max_diff, 6)
                row['torch_hypnogram_agreement'] = round(agree_n / max(total, 1), 6)
            rows.append(row)
            print(json.dumps(row), flush=True)

    report = {'model': args.model_folder, 'num_classes': C, 'rows': rows}
    hdr = f'{"dataset":10s} {"signals":14s} {"nights":>6s} {"acc":>7s} {"kappa":>7s}'
    print('\n' + hdr, file=sys.stderr)
    print('-' * len(hdr), file=sys.stderr)
    for r in rows:
        print(
            f'{r["dataset"]:10s} {r["signals"]:14s} {r["nights"]:6d} '
            f'{r.get("acc", float("nan")):7.4f} {r.get("kappa", float("nan")):7.4f}'
            + (f'  torch_diff={r["torch_max_abs_logit_diff"]:g}' if 'torch_max_abs_logit_diff' in r else ''),
            file=sys.stderr,
        )
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(report, f, indent=2)
    return report


def main(argv=None) -> None:
    run(build_parser().parse_args(argv))


if __name__ == '__main__':
    main()
