"""Parquet/label/resampling utilities.

Functional equivalents of the reference helpers (src/wav2sleep/data/utils.py),
with the hot interpolation path re-implemented on vectorized ``np.interp``
instead of pandas outer-join + ``interpolate`` — identical values on strictly
increasing indices, an order of magnitude faster on million-sample waveforms.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def get_parquet_cols(fp: str) -> list[str]:
    """Column names of a parquet file without reading data."""
    cols = pq.read_schema(fp, memory_map=True).names
    return [c for c in cols if c != '__index_level_0__']


def get_parquet_fps(folder: str, recursive: bool = False) -> list[str]:
    """Parquet files in a folder (reference data/utils.py:17-24)."""
    if not os.path.exists(folder):
        raise FileNotFoundError(folder)
    if recursive:
        return glob(f'{folder}/**/*.parquet', recursive=True)
    return glob(f'{folder}/*.parquet')


def convert_int_stage(stage: int | str):
    """Map raw NSRR integer stages onto the 5-class convention.

    N4 -> N3 (3), REM(5) -> 4; movement(6,7)/unscored(9) -> NaN
    (reference data/utils.py:27-38).
    """
    stage = int(stage)
    if stage not in [0, 1, 2, 3, 4, 5, 6, 7, 9]:
        raise ValueError(f'{stage} not a valid sleep stage.')
    if stage == 4:
        return 3
    if stage == 5:
        return 4
    if stage in [6, 7, 9]:
        return np.nan
    return stage


def convert_str_stage(stage: str):
    """Map textual stage annotations ('STAGE - N2', ...) onto integers
    (reference data/utils.py:41-59)."""
    if 'STAGE' not in stage:
        return None
    if 'NO STAGE' in stage:
        return None
    elif 'W' in stage:
        return 0
    elif 'N1' in stage:
        return 1
    elif 'N2' in stage:
        return 2
    elif 'N3' in stage:
        return 3
    elif 'R' in stage:
        return 4
    elif 'MVT' in stage:
        return None
    else:
        raise ValueError(f'Encountered unseen value: {stage=}')


def interp_to_grid(
    t_src: np.ndarray,
    values: np.ndarray,
    t_target: np.ndarray,
    interior_only: bool = True,
    fill_value: float = np.nan,
) -> np.ndarray:
    """Linear interpolation of (t_src, values) onto t_target.

    ``interior_only=True`` matches pandas ``limit_area='inside'``: points
    outside [t_src[0], t_src[-1]] get ``fill_value`` instead of clamped
    extrapolation.
    """
    t_src = np.asarray(t_src, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    t_target = np.asarray(t_target, dtype=np.float64)
    out = np.interp(t_target, t_src, values)
    if interior_only and len(t_src):
        outside = (t_target < t_src[0]) | (t_target > t_src[-1])
        if outside.any():
            out = out.copy()
            out[outside] = fill_value
    return out


def interpolate_index(
    source_df: pd.Series | pd.DataFrame,
    target_index: pd.Index,
    method: str | None = None,
    squeeze: bool = True,
    limit_area: str | None = None,
    **kwargs,
) -> pd.Series | pd.DataFrame:
    """Resample pandas data onto a target index (API-compatible with
    reference data/utils.py:62-98, numpy-vectorized underneath)."""
    src_index = source_df.index
    if isinstance(src_index, pd.DatetimeIndex):
        if not isinstance(target_index, pd.DatetimeIndex):
            raise ValueError('target_index must be the same type as the source_index.')
        t_src = src_index.view('int64').astype(np.float64)
        t_tgt = target_index.view('int64').astype(np.float64)
    else:
        t_src = np.asarray(src_index, dtype=np.float64)
        t_tgt = np.asarray(target_index, dtype=np.float64)
    interior_only = limit_area == 'inside'
    if isinstance(source_df, pd.Series):
        frame = source_df.to_frame()
    else:
        frame = source_df
    data = {}
    for col in frame.columns:
        vals = frame[col].to_numpy(dtype=np.float64)
        mask = ~np.isnan(vals)
        data[col] = interp_to_grid(t_src[mask], vals[mask], t_tgt, interior_only=interior_only)
    out = pd.DataFrame(data, index=target_index)
    if squeeze:
        return out.squeeze(axis='columns')
    return out
