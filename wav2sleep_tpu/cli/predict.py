"""Inference CLI (reference parity: scripts/predict.py there).

Lives inside the package so the installed wheel's entry point works
without a repo checkout; ``scripts/predict.py`` delegates here.
Runs preprocessing + batched TPU inference over a folder of
EDF/CSV/parquet files, writes per-night ``.preds.csv`` hypnograms, and
reports Cohen's kappa and accuracy when labels are present.
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger('predict')


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description='Run wav2sleep-tpu inference on a folder of recordings.')
    parser.add_argument('--input-folder', required=True, help='Folder of EDF/CSV/parquet recordings.')
    parser.add_argument('--output-folder', required=True, help='Where .preds.csv files are written.')
    parser.add_argument(
        '--model-folder',
        default='hf://joncarter/wav2sleep',
        help='Checkpoint folder or hf:// repo (default: released cardio-respiratory model).',
    )
    parser.add_argument('--signals', default=None, help='Comma-separated subset of the model signals, e.g. ECG,THX.')
    parser.add_argument('--no-preprocess', action='store_true', help='Input folder is already model-ready parquet.')
    parser.add_argument('--max-length-hours', type=int, default=10)
    parser.add_argument('--overwrite', action='store_true')
    parser.add_argument('--compile', action='store_true', help='Kept for parity; forwards are always jitted.')
    parser.add_argument('--precision', default='float32', choices=['float32', 'bfloat16'])
    parser.add_argument('--batch-size', type=int, default=4)
    parser.add_argument('--num-workers', type=int, default=4)
    parser.add_argument('--device', default='auto')
    return parser


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    import numpy as np

    from .. import api
    from ..stats import cohens_kappa, confusion_accuracy
    from ..train.metrics import confusion_matrix

    signals = args.signals.split(',') if args.signals else None
    preds, labels = api.predict_on_folder(
        input_folder=args.input_folder,
        output_folder=args.output_folder,
        model_folder=args.model_folder,
        signals=signals,
        device=args.device,
        batch_size=args.batch_size,
        num_workers=args.num_workers,
        preprocess=not args.no_preprocess,
        max_length_hours=args.max_length_hours,
        overwrite=args.overwrite,
        compile=args.compile,
        precision=args.precision,
        return_tensors=True,
    )
    logger.info(f'Wrote predictions for {len(preds)} nights to {args.output_folder}')
    if labels is not None:
        import jax.numpy as jnp

        # num_classes must cover the LABELS too, not just the argmax
        # predictions: a class the model never predicted would otherwise
        # shrink the matrix and its labeled epochs would be silently
        # dropped by the scatter (out-of-bounds .at[].add), skewing kappa.
        num_classes = 1 + max(
            max(int(np.max(p)) for p in preds),
            max(int(np.max(y)) for y in labels),
        )
        num_classes = max(num_classes, 4)
        cmat = np.zeros((num_classes, num_classes), np.int64)
        for p, y in zip(preds, labels):
            onehotish = np.eye(num_classes)[p]  # logits stand-in for argmax
            cmat += np.asarray(confusion_matrix(jnp.asarray(onehotish[None]), jnp.asarray(y[None]), num_classes))
        kappa = cohens_kappa(cmat, n_classes=num_classes)
        acc = confusion_accuracy(cmat)
        print(f"Cohen's kappa: {kappa:.4f}")
        print(f'Accuracy: {acc:.4f}')


if __name__ == '__main__':
    main()
