"""Metric/artifact logging helpers (API parity with reference src/wav2sleep/log.py).

``log_aux_metrics`` renders a confusion-matrix PNG and records
``{prefix}_acc`` / ``{prefix}_kappa`` — to MLflow when a tracking URI is
configured, else to a local artifacts directory. Rank-zero only (one writer
per TPU-VM pod).
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
def log_aux_metrics(cmat, epoch: int, prefix: str, artifact_dir: str | None = None) -> dict[str, float]:
    """Log kappa/accuracy + confusion PNG for one (prefix, epoch)."""
    cmat = np.asarray(cmat, dtype=float)
    acc = float(confusion_accuracy(cmat))
    kappa = float(cohens_kappa(cmat, n_classes=len(cmat)))
    metrics = {f'{prefix}_acc': acc, f'{prefix}_kappa': kappa}

    mlflow = _mlflow()
    if mlflow is not None:
        try:
            import matplotlib.pyplot as plt

            from .plotting import plot_confusion_matrix
            from .settings import SLEEP_STAGE_CATEGORIES

            fig, ax = plt.subplots(1, 1)
            plot_confusion_matrix(
                SLEEP_STAGE_CATEGORIES.get(len(cmat), [str(i) for i in range(len(cmat))]),
                cmat,
                ax=ax,
                heatmap_cmap='Purples',
            )
            fig.tight_layout()
            mlflow.log_figure(fig, f'{prefix}_conf_mats/{epoch:04d}.png')
            plt.close(fig)
        except Exception as e:  # plotting best-effort
            logger.debug(f'confusion figure failed: {e}')
        mlflow.log_metrics(metrics, step=epoch)
        return metrics

    out = artifact_dir or DEFAULT_ARTIFACT_DIR
    os.makedirs(out, exist_ok=True)
    try:
        from .plotting import save_confusion_png

        png_dir = os.path.join(out, f'{prefix}_conf_mats')
        os.makedirs(png_dir, exist_ok=True)
        save_confusion_png(cmat, os.path.join(png_dir, f'{epoch:04d}.png'), num_classes=len(cmat))
    except Exception as e:
        logger.debug(f'confusion figure failed: {e}')
    with open(os.path.join(out, 'metrics.jsonl'), 'a') as f:
        f.write(json.dumps({'step': epoch, 'time': time.time(), **metrics}) + '\n')
    return metrics
