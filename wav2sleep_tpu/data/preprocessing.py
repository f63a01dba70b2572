"""Waveform resampling onto the model's uniform per-signal grids.

Equivalent of reference src/wav2sleep/data/preprocessing.py:16-52: each signal
is linearly interpolated onto a right-aligned uniform grid of
``samples_per_epoch / 30`` Hz spanning ``max_length_hours``; samples outside
the recorded range become 0.0 (interior-only interpolation). Labels live on a
1,200-slot 30 s grid.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from ..settings import (
    ABD,
    COLS_TO_SAMPLES_PER_EPOCH,
    ECG,
    EOG_L,
    EOG_R,
    PPG,
    THX,
    TRAINING_LENGTH_HOURS,
)
from .utils import interp_to_grid

logger = logging.getLogger(__name__)

CARDIO_RESP_COLS = [ECG, PPG, ABD, THX]
NEURAL_COLS = [EOG_L, EOG_R]
EDF_COLS = CARDIO_RESP_COLS + NEURAL_COLS

# 30 s label grid over the training length: (30, 60, ..., 36000].
TARGET_LABEL_INDEX = pd.Index(np.arange(0, TRAINING_LENGTH_HOURS * 60 * 60 + 1, 30.0)[1:])


def signal_target_grid(col: str, max_length_hours: float = TRAINING_LENGTH_HOURS) -> np.ndarray:
    """Right-aligned uniform timestamp grid (seconds) for one signal."""
    samples_per_epoch = COLS_TO_SAMPLES_PER_EPOCH[col]
    step = 30.0 / samples_per_epoch
    return np.arange(0, max_length_hours * 60 * 60 + 1e-9, step)[1:]


def resample_signal(
    t_seconds: np.ndarray,
    values: np.ndarray,
    col: str,
    max_length_hours: float = TRAINING_LENGTH_HOURS,
) -> np.ndarray:
    """Resample one signal's (timestamps, values) onto its model grid.

    Interior-only linear interpolation; out-of-range samples are zero-filled
    (reference preprocessing.py:35-37). Returns float32.
    """
    grid = signal_target_grid(col, max_length_hours)
    out = interp_to_grid(t_seconds, values, grid, interior_only=True, fill_value=0.0)
    return out.astype(np.float32)


def process_waveform_dataframe(
    df: pd.DataFrame, columns: list[str], max_length_hours: float = TRAINING_LENGTH_HOURS
) -> pd.DataFrame:
    """Process a dataframe of waveform data onto uniform per-signal grids.

    API-compatible with the reference (preprocessing.py:19-52): accepts a
    seconds- or datetime-indexed frame, returns a float32 frame whose index
    is the union of the per-signal grids (datetime restored if given).
    """
    df_start = df.index[0]
    if isinstance(df.index, pd.DatetimeIndex):
        timestamp = True
        t_seconds = (df.index - df.index[0]).view('int64').astype(np.float64) / 1e9
    else:
        timestamp = False
        t_seconds = np.asarray(df.index, dtype=np.float64)

    signals = []
    for col in columns:
        if col not in df:
            continue
        vals = df[col].to_numpy(dtype=np.float64)
        mask = ~np.isnan(vals)
        grid = signal_target_grid(col, max_length_hours)
        resampled = interp_to_grid(t_seconds[mask], vals[mask], grid, interior_only=True, fill_value=0.0)
        signals.append(pd.Series(resampled.astype(np.float32), index=pd.Index(grid), name=col))
    if not signals:
        raise ValueError(f'None of {columns} present in dataframe with columns {list(df.columns)}')
    out = pd.concat(signals, axis=1).astype(np.float32)
    if timestamp:
        out.index = df_start + pd.to_timedelta(out.index, unit='s')
    return out
