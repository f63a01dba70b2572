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


from collections import OrderedDict

_RESAMPLE_PLAN_CACHE: OrderedDict = OrderedDict()
# The key includes the per-recording sample count n, which differs for
# nearly every night in a variable-length corpus — an unbounded cache
# would grow by ~26 MB of plan arrays (ECG/PPG at 10 h) per distinct
# length until the host OOMs. A small LRU keeps the fixed-rate training
# corpora fully amortized while bounding a variable-length sweep to a few
# plans (this path only runs when the native decode kernel is absent).
_RESAMPLE_PLAN_MAX = 8


def _resample_plan(fs: float, n: int, col: str, max_length_hours: float):
    """Cached gather indices + lerp weights for a (rate, length) pair."""
    key = (round(fs, 9), n, col, max_length_hours)
    plan = _RESAMPLE_PLAN_CACHE.get(key)
    if plan is None:
        grid = signal_target_grid(col, max_length_hours)
        pos = grid * fs
        idx = np.floor(pos).astype(np.int64)
        frac = (pos - idx).astype(np.float32)
        invalid = (pos < 0) | (pos > n - 1)
        idx0 = np.clip(idx, 0, n - 1)
        idx1 = np.clip(idx + 1, 0, n - 1)
        plan = (idx0, idx1, frac, invalid if invalid.any() else None)
        _RESAMPLE_PLAN_CACHE[key] = plan
        if len(_RESAMPLE_PLAN_CACHE) > _RESAMPLE_PLAN_MAX:
            _RESAMPLE_PLAN_CACHE.popitem(last=False)
    else:
        _RESAMPLE_PLAN_CACHE.move_to_end(key)
    return plan


def resample_uniform(
    values: np.ndarray,
    fs: float,
    col: str,
    max_length_hours: float = TRAINING_LENGTH_HOURS,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Fast path: resample a *uniformly sampled* signal (rate ``fs``, first
    sample at t=0) onto the model grid with closed-form linear interpolation.

    Equivalent to ``resample_signal(arange(n)/fs, values, col)`` but without
    searchsorted or float64 promotion — a single fused gather+lerp pass into
    an optional caller-owned ``out`` buffer.
    """
    n = len(values)
    idx0, idx1, frac, invalid = _resample_plan(fs, n, col, max_length_hours)
    v = values.astype(np.float32, copy=False)
    m = len(idx0)
    if out is None:
        out = np.empty(m, dtype=np.float32)
    tmp = _take_scratch(m)
    # out = v0 + frac * (v1 - v0), staged through pooled scratch only.
    np.take(v, idx0, out=tmp)
    np.take(v, idx1, out=out)
    out -= tmp
    out *= frac
    out += tmp
    if invalid is not None:
        out[invalid] = 0.0
    return out


_TAKE_SCRATCH: dict[int, np.ndarray] = {}


def _take_scratch(n: int) -> np.ndarray:
    """Pooled scratch (not thread-safe across concurrent resamples of the
    same length; the streaming pipeline is single-producer)."""
    buf = _TAKE_SCRATCH.get(n)
    if buf is None:
        buf = np.empty(n, dtype=np.float32)
        _TAKE_SCRATCH[n] = buf
    return buf


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


def process_waveform_arrays(
    arrays: dict[str, tuple[np.ndarray, float]],
    columns: list[str],
    max_length_hours: float = TRAINING_LENGTH_HOURS,
) -> pd.DataFrame:
    """Array-native twin of ``process_waveform_dataframe`` for the offline
    ingest hot path: consumes ``load_edf_arrays`` output directly and skips
    the union-index DataFrame round-trip entirely. ``load_edf_data`` concats
    every raw channel onto the union of their float second-grids (~14M rows
    for a 10 h cardio night) only for the resampler to immediately un-merge
    it per column via the NaN mask — measured at ~16 of 21 s/night on the
    1-core ingest host. Output is bit-identical to the DataFrame path
    (pinned by tests/data/test_ingest.py::test_array_path_matches_dataframe_path):
    each channel's (t, v) pairs survive the union round-trip unchanged, so
    the interpolation sees the same inputs either way.
    """
    signals = []
    for col in columns:
        if col not in arrays:
            continue
        sig, fs = arrays[col]
        t = np.arange(len(sig), dtype=np.float64)
        t /= fs
        grid = signal_target_grid(col, max_length_hours)
        resampled = interp_to_grid(
            t, sig.astype(np.float64, copy=False), grid, interior_only=True, fill_value=0.0
        )
        signals.append(pd.Series(resampled.astype(np.float32), index=pd.Index(grid), name=col))
    if not signals:
        raise ValueError(f'None of {columns} present in arrays with keys {list(arrays)}')
    return pd.concat(signals, axis=1).astype(np.float32)
