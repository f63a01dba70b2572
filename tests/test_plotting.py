"""Confusion-matrix plotting (plotting.py — reference src/wav2sleep/plotting.py):
PNG rendering, title metrics consistent with stats.py, and degenerate-cmat
safety (empty rows/cols must render '-' margins, not crash)."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip('matplotlib')
matplotlib.use('Agg', force=True)

from wav2sleep_tpu.plotting import plot_confusion_matrix, save_confusion_png  # noqa: E402
from wav2sleep_tpu.stats import cohens_kappa, confusion_accuracy  # noqa: E402

CMAT = np.array(
    [
        [50, 2, 1, 0],
        [3, 40, 5, 2],
        [1, 6, 30, 3],
        [0, 2, 4, 44],
    ],
    dtype=float,
)


def test_save_confusion_png_writes_file(tmp_path):
    path = str(tmp_path / 'cmat.png')
    save_confusion_png(CMAT, path)
    assert os.path.exists(path)
    with open(path, 'rb') as f:
        header = f.read(8)
    assert header == b'\x89PNG\r\n\x1a\n'
    assert os.path.getsize(path) > 1000


def test_title_matches_stats():
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    plot_confusion_matrix(['W', 'L', 'D', 'R'], CMAT, ax=ax, description='val/mesa')
    title = ax.get_title()
    acc = confusion_accuracy(CMAT)
    kappa = cohens_kappa(CMAT, n_classes=4)
    assert 'val/mesa' in title
    assert f'acc={acc:.3f}' in title
    assert f'κ={kappa:.3f}' in title
    plt.close(fig)


def _all_tick_texts(fig, ax):
    # Secondary precision/recall axes live in ax.child_axes, not fig.axes.
    axes = list(fig.axes) + list(ax.child_axes)
    return {t.get_text() for axis in axes for t in axis.get_xticklabels() + axis.get_yticklabels()}


def test_margin_tick_values_are_precision_recall():
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    plot_confusion_matrix(['W', 'L', 'D', 'R'], CMAT, ax=ax)
    recall = np.diag(CMAT) / CMAT.sum(axis=1)
    precision = np.diag(CMAT) / CMAT.sum(axis=0)
    texts = _all_tick_texts(fig, ax)
    for p in precision:
        assert f'{p:.2f}' in texts
    for r in recall:
        assert f'{r:.2f}' in texts
    plt.close(fig)


def test_empty_class_rows_render_dash_margins(tmp_path):
    import matplotlib.pyplot as plt

    cmat = np.zeros((4, 4))
    cmat[0, 0] = 10.0  # only one class ever seen
    fig, ax = plt.subplots()
    plot_confusion_matrix(['W', 'L', 'D', 'R'], cmat, ax=ax)
    texts = _all_tick_texts(fig, ax)
    assert '-' in texts  # absent classes show '-' instead of NaN
    plt.close(fig)
    # And the PNG writer survives an all-zero matrix outright.
    path = str(tmp_path / 'zero.png')
    save_confusion_png(np.zeros((4, 4)), path)
    assert os.path.getsize(path) > 0
