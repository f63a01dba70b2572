#!/usr/bin/env python
"""High-throughput serving CLI: EDF folder -> hypnogram CSVs, no parquet cache.

The batch path (``scripts/predict.py`` / ``api.predict_on_folder``) mirrors
the reference exactly (resample -> parquet cache -> batched inference). This
CLI drives the streaming engines from ``wav2sleep_tpu.pipeline`` instead:
pooled-buffer EDF extraction on the host overlapping the jitted device
forward, with a selectable transport:

  q8   mu-law int8 codes (fastest; ~1.3% rms reconstruction error, the same
       order as bf16 compute noise)
  q16  lossless int16 digital codes (<= 0.5 LSB, the EDF's own quantization)
  raw  untouched int16 channels, resampled on device
  f32  host-side float32 decode/resample

Writes the same ``<name>.preds.csv`` format as predict.py (30 s timestamps).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

logger = logging.getLogger('serve')


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description='Stream EDFs through the TPU at maximum throughput.')
    parser.add_argument('--input-folder', required=True, help='Folder of EDF recordings.')
    parser.add_argument('--output-folder', required=True, help='Where .preds.csv files are written.')
    parser.add_argument(
        '--model-folder',
        default='hf://joncarter/wav2sleep',
        help='Checkpoint folder or hf:// repo (default: released cardio-respiratory model).',
    )
    parser.add_argument('--signals', default=None, help='Comma-separated subset of the model signals.')
    parser.add_argument(
        '--transport',
        default='q16',
        choices=['q8', 'q16', 'q4', 'raw', 'f32'],
        help='Host->device input encoding. q16 (default) is visually lossless '
        '(<=0.5 LSB of the EDF\'s own quantization); q8 (mu-law int8) halves '
        'the bytes again with a small measured accuracy tax; q4 (packed 4-bit '
        'block-DPCM) is for severely link-bound deployments ONLY - its '
        'hypnogram flips are NOT confined to near-tie epochs (see the '
        'transport ladder + quality table in docs/design.md and '
        'docs/measurements/q8_quality_r5.json before choosing it).',
    )
    parser.add_argument('--precision', default='bfloat16', choices=['float32', 'bfloat16'])
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--max-length-hours', type=float, default=10.0)
    parser.add_argument('--overwrite', action='store_true')
    parser.add_argument(
        '--data-parallel',
        type=int,
        default=0,
        help='Shard each batch over this many devices (0 = single device).',
    )
    return parser


def make_pipeline(model, transport: str, signals: list[str], args, mesh=None):
    from wav2sleep_tpu.pipeline import (
        StreamingPipeline,
        StreamingPipelineQ4,
        StreamingPipelineQ8,
        StreamingPipelineQ16,
        StreamingPipelineRaw,
    )

    common = dict(
        batch_size=args.batch_size,
        max_length_hours=args.max_length_hours,
        precision=args.precision,
    )
    if transport == 'q8':
        return StreamingPipelineQ8(model.module, model.variables, signals, mesh=mesh, **common)
    if transport == 'q16':
        return StreamingPipelineQ16(model.module, model.variables, signals, mesh=mesh, **common)
    if transport == 'q4':
        return StreamingPipelineQ4(model.module, model.variables, signals, mesh=mesh, **common)
    if mesh is not None:
        raise SystemExit('--data-parallel requires --transport q8, q16 or q4')
    if transport == 'raw':
        return StreamingPipelineRaw(model.module, model.variables, signals, **common)
    return StreamingPipeline(model.module, model.variables, signals, **common)


def main(argv=None) -> None:
    import time

    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    import numpy as np
    import pandas as pd

    from wav2sleep_tpu import api
    from wav2sleep_tpu.data.edf import get_edf_start
    from wav2sleep_tpu.settings import PRED, TIMESTAMP

    # precision must reach load_model: the streaming forwards cast only
    # ACTIVATIONS — f32 weights would promote every matmul back to f32 and
    # the benched bf16 fast path would silently never engage.
    model = api.load_model(args.model_folder, precision=args.precision)
    if model.family == 'ppgnet':
        raise SystemExit(
            'The streaming transports drive the multi-modal wav2sleep family; '
            'use scripts/predict.py for SleepPPG-Net checkpoints.'
        )
    signals = args.signals.split(',') if args.signals else model.valid_signals
    invalid = set(signals) - set(model.valid_signals)
    if invalid:
        raise SystemExit(f'Signals {sorted(invalid)} not supported by this model ({model.valid_signals}).')

    mesh = None
    if args.data_parallel:
        import jax

        from wav2sleep_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[: args.data_parallel], data=args.data_parallel, model=1)

    def out_path(fp: str) -> str:
        rel = os.path.relpath(fp, args.input_folder)
        return os.path.join(args.output_folder, os.path.splitext(rel)[0] + '.preds.csv')

    fps = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(args.input_folder)
        for f in files
        if f.lower().endswith('.edf')
    )
    if not fps:
        raise SystemExit(f'No EDF files under {args.input_folder}')
    if not args.overwrite:
        # Resume cheaply: skip nights whose output already exists BEFORE
        # spending chip time on them.
        skipped = [fp for fp in fps if os.path.exists(out_path(fp))]
        for fp in skipped:
            logger.warning(f'File {out_path(fp)} exists. Skipping.')
        fps = [fp for fp in fps if not os.path.exists(out_path(fp))]
        if not fps:
            logger.info('Nothing to do.')
            return
    logger.info(f'Serving {len(fps)} recordings with transport={args.transport} signals={signals}')

    pipe = make_pipeline(model, args.transport, list(signals), args, mesh=mesh)
    os.makedirs(args.output_folder, exist_ok=True)
    t0 = time.time()
    n = 0
    for fp, hyp in pipe.run(fps):
        # Hypnograms arrive trimmed to the night's real epochs
        # (pipeline run(); parity with api.predict's preds[:night_epochs]).
        out_fp = out_path(fp)
        os.makedirs(os.path.dirname(out_fp), exist_ok=True)
        index = pd.Index(np.arange(len(hyp)) * 30.0 + 30.0, name=TIMESTAMP)
        try:
            start = get_edf_start(fp)
            index = start + pd.to_timedelta(index, unit='s')
            index.name = TIMESTAMP
        except (OSError, ValueError):
            pass
        pd.DataFrame({PRED: np.asarray(hyp)}, index=index).to_csv(out_fp)
        n += 1
    elapsed = time.time() - t0
    logger.info(f'{n} recordings in {elapsed:.1f} s ({n / max(elapsed, 1e-9) * 3600:.0f}/hour)')


if __name__ == '__main__':
    main()
