"""Metric/artifact logging helpers (API parity with reference src/wav2sleep/log.py).

``log_aux_metrics`` renders a confusion-matrix PNG and records
``{prefix}_acc`` / ``{prefix}_kappa`` to a local artifacts directory
(metrics.jsonl + PNG) and, when a tracking URI is configured, to MLflow as
well. It is the ONE implementation of confusion-metric logging — the
Trainer's ``MetricsLogger.log_confusion`` (train/loop.py) delegates here.
Rank-zero only (one writer per TPU-VM pod).
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from .stats import cohens_kappa, confusion_accuracy
from .utils import rank_zero_only

logger = logging.getLogger(__name__)

DEFAULT_ARTIFACT_DIR = os.environ.get('WAV2SLEEP_ARTIFACTS', 'artifacts')


def _mlflow():
    if not os.environ.get('MLFLOW_TRACKING_URI'):
        return None
    try:
        import mlflow

        return mlflow
    except ImportError:
        return None


@rank_zero_only
def log_aux_metrics(
    cmat, epoch: int, prefix: str, artifact_dir: str | None = None, plot: bool = True
) -> dict[str, float]:
    """Log kappa/accuracy + confusion PNG for one (prefix, epoch)."""
    cmat = np.asarray(cmat, dtype=float)
    acc = float(confusion_accuracy(cmat))
    kappa = float(cohens_kappa(cmat, n_classes=len(cmat)))
    metrics = {f'{prefix}_acc': acc, f'{prefix}_kappa': kappa}

    out = artifact_dir or DEFAULT_ARTIFACT_DIR
    os.makedirs(out, exist_ok=True)
    mlflow = _mlflow()
    png_path = None
    if plot:
        try:
            from .plotting import save_confusion_png

            png_dir = os.path.join(out, f'{prefix}_conf_mats')
            os.makedirs(png_dir, exist_ok=True)
            png_path = os.path.join(png_dir, f'{epoch:04d}.png')
            save_confusion_png(cmat, png_path, num_classes=len(cmat))
        except Exception as e:  # plotting is best-effort observability
            logger.debug(f'confusion figure failed: {e}')
            png_path = None
    with open(os.path.join(out, 'metrics.jsonl'), 'a') as f:
        f.write(json.dumps({'step': epoch, 'time': time.time(), **metrics}) + '\n')

    if mlflow is not None:
        mlflow.log_metrics(metrics, step=epoch)
        if png_path is not None:
            try:
                # Figures must reach the tracking server too: the local
                # TPU-VM artifact dir is ephemeral (reference log.py logs
                # confusion figures as MLflow run artifacts).
                mlflow.log_artifact(png_path, artifact_path=f'{prefix}_conf_mats')
            except Exception as e:
                logger.debug(f'mlflow figure upload failed: {e}')
    return metrics
