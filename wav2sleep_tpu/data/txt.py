"""Wisconsin Sleep Cohort (WSC) sleep-stage annotation parsing.

Equivalent of reference src/wav2sleep/data/txt.py: two annotation formats:

- ``.stg.txt``: epoch-indexed integer stages; the recording start is
  cross-checked against the paired ``.log.txt`` ("Recording Started" line
  closest to midnight wins when there are restarts) and the EDF header.
- ``.allscore.txt``: sparse stage-change events with hh:mm:ss timestamps;
  wall-clock wraparound is reconstructed assuming evening starts, recordings
  with power failures are rejected, and stages are forward-filled onto a 30 s
  grid.

Both reject recordings shorter than 4 h or longer than 14 h, and recordings
scored with only Wake/N2 (no N1/N3/REM — typically sleep/wake-only scoring).
"""

from __future__ import annotations

import datetime
import logging
import os

import numpy as np
import pandas as pd

from ..settings import LABEL, TIMESTAMP
from .edf import get_edf_end, get_edf_start
from .utils import convert_int_stage, convert_str_stage

logger = logging.getLogger(__name__)

MIN_RECORDING_LENGTH = 60 * 60 * 4  # 4 hours
MAX_RECORDING_LENGTH = 60 * 60 * 14  # 14 hours

_STG_COL = 'User-Defined Stage'


def _swap_suffix(fp: str, old: str, new: str) -> str:
    """Suffix-anchored sibling-file pairing. A bare ``fp.replace(old, new)``
    also rewrites directory names that happen to contain the token (e.g.
    ``/data/stg_files/x.stg.txt``), breaking the log/EDF lookup."""
    if not fp.endswith(old):
        raise ValueError(f'{fp=} does not end with {old!r}')
    return fp[: -len(old)] + new


def convert_index(hour_minute_index, start_ts: datetime.datetime) -> pd.DatetimeIndex:
    """Convert an 'hh:mm:ss.f' string index into datetimes around start_ts.

    Assumes recordings start between ~5pm and 3am and last <24 h: timestamps
    whose hour precedes the start hour belong to the following day.
    """
    hours = hour_minute_index.str.slice(start=0, stop=2).astype(int)
    end_hour = hours[-1]
    multiday = start_ts.hour >= end_hour
    same_day = start_ts.hour <= hours
    if not multiday and (~same_day).any():
        raise ValueError(f'{multiday=}, but {start_ts=} and found timestamps on a possibly different day.')
    start_day = start_ts.date()
    day_strings = np.where(
        same_day,
        start_day.strftime('%Y/%m/%d'),
        (start_day + datetime.timedelta(days=1)).strftime('%Y/%m/%d'),
    )
    return pd.DatetimeIndex(day_strings + (' ' + hour_minute_index))


def _has_deep_sleep_stages(series: pd.Series) -> bool:
    """True if any of N1/N3/REM are present; sleep-wake-only scoring fails."""
    counts = series.value_counts(dropna=False)
    return any(counts.get(s) is not None for s in (1.0, 3.0, 4.0))


def parse_all_score(fp: str, convert_time: bool = False) -> pd.Series | None:
    """Parse a WSC ``.allscore.txt`` (stage-change events) file."""
    txt = (
        pd.read_csv(fp, encoding='unicode_escape', delimiter='\t', index_col=0, header=None)
        .squeeze(axis='columns')
        .dropna()
        .rename(LABEL)
    )
    txt.index = txt.index.rename(TIMESTAMP)
    if txt.str.contains('POWER FAILURE RECOVERY').any():
        logger.info(f'Recording contains power failure for {fp=}')
        return None
    df = txt[txt.str.contains('STAGE|START')]
    if not df.str.contains('START RECORDING').any():
        logger.info(f"Didn't find START RECORDING annotation for {fp=}.")
        return None
    # Drop annotations predating START RECORDING (some records carry stray
    # late-afternoon annotations from earlier sessions).
    positions = np.flatnonzero((df == 'START RECORDING').to_numpy())
    df = df.iloc[positions[0] :]
    if int((df == 'START RECORDING').sum()) != 1:
        logger.info(f'Found multiple START RECORDING annotations for {fp=}.')
        return None
    start_stamp = df.index[df == 'START RECORDING'][0]
    hour, minute, second = int(start_stamp[:2]), int(start_stamp[3:5]), int(start_stamp[6:8])
    edf_fp = _swap_suffix(fp, 'allscore.txt', 'edf')
    edf_start = get_edf_start(edf_fp)
    if (edf_start.hour, edf_start.minute, edf_start.second) != (hour, minute, second):
        logger.warning(f'{edf_start=} did not match allscore file start: {start_stamp} for {fp=}. Skipping...')
        raise ValueError(f'EDF/annotation start mismatch for {fp}')
    start_ts = datetime.datetime.strptime(f'01/01/2000 {start_stamp}', '%d/%m/%Y %H:%M:%S.%f')
    try:
        df.index = convert_index(df.index, start_ts=start_ts)
    except Exception:
        logger.warning(f'Failed to convert timestamps for {fp=}')
        return None
    df = df.loc[~df.index.duplicated()]
    df.index = df.index - df.index[0]
    df = df.resample('30s').ffill()
    df.index = df.index.total_seconds()
    df = df.map(convert_str_stage)
    df.index += 30.0  # Labels describe the preceding 30 s.
    if not (df.sort_index().index == df.index).all():
        logger.warning(f"Timestamps in {fp=} weren't already sorted.")
        return None
    if df.index[-1] < MIN_RECORDING_LENGTH:
        logger.warning(f'Recording less than {MIN_RECORDING_LENGTH=} for {fp=}')
        return None
    if df.index[-1] > MAX_RECORDING_LENGTH:
        logger.warning(f'Recording greater than {MAX_RECORDING_LENGTH=} for {fp=}')
        return None
    if not _has_deep_sleep_stages(df):
        raise ValueError(f'Only Wake/N2 scoring found in {fp} - rejecting sleep/wake-only recording.')
    if convert_time:
        df.index = edf_start + pd.TimedeltaIndex(df.index, unit='s')
    return df


def midnight_dist(start_entry) -> float:
    """Distance (hours, mod 24) of an hh:mm[:ss] timestamp past midnight."""
    hh_mm = start_entry[0]
    return (float(hh_mm[:2]) + float(hh_mm[3:5]) / 60 - 24) % 24


def get_start_from_log(fp: str):
    """Recording start (time string, epoch number) from a WSC ``.log.txt``.

    When restarts produced multiple 'Recording Started' lines, the one
    closest to midnight is assumed to be the true start.
    """
    with open(fp, 'r') as f:
        lines = f.readlines()
    starts = []
    for line in lines:
        contents = line.strip().split('\t')
        if len(contents) < 2:
            continue
        time_epoch, annotation = contents[0], contents[1]
        if annotation == 'Recording Started':
            time, _, epoch_no = time_epoch.partition(' ')
            starts.append((time.strip(), epoch_no.strip()))
    if not starts:
        logger.warning(f"Couldn't find 'Recording Start' annotation in {fp=}")
        return None, None
    if len(starts) > 1:
        logger.warning(f'Found multiple starts in {fp=}. Using closest to midnight...')
        starts = sorted(starts, key=midnight_dist)
    return starts[-1]


def parse_stg_file(fp: str, convert_time: bool = False) -> pd.Series | None:
    """Parse a WSC ``.stg.txt`` (epoch-indexed integer stages) file."""
    df = pd.read_csv(fp, index_col=0, delimiter='\t')
    if _STG_COL in df.columns:
        series = df[_STG_COL]
    else:  # Some files lack the header row.
        series = pd.read_csv(fp, index_col=0, delimiter='\t', names=[_STG_COL, 'X'])[_STG_COL]
    series = series.rename(LABEL)
    log_fp = _swap_suffix(fp, 'stg.txt', 'log.txt')
    if not os.path.exists(log_fp):
        raise FileNotFoundError(f"Couldn't find corresponding log file for {fp=}")
    start_time, _epoch = get_start_from_log(log_fp)
    if start_time is None:
        return None
    hour, minute, second = map(int, start_time.split(':'))
    edf_fp = _swap_suffix(fp, 'stg.txt', 'edf')
    edf_start, edf_end = get_edf_start(edf_fp), get_edf_end(edf_fp)
    if (edf_start.hour, edf_start.minute, edf_start.second) != (hour, minute, second):
        logger.warning(f'{edf_start=} did not match log file start: {start_time} for {fp=}. Skipping...')
        return None
    edf_duration = (edf_end - edf_start).total_seconds()
    if edf_duration < MIN_RECORDING_LENGTH:
        logger.warning(f'EDF less than {MIN_RECORDING_LENGTH=} for {fp=}')
        return None
    if edf_duration > MAX_RECORDING_LENGTH:
        logger.warning(f'EDF greater than {MAX_RECORDING_LENGTH=} for {fp=}')
        return None
    # Epoch index -> seconds; epoch 1 ends at t=30 so labels already sit on
    # the right bin edge.
    series.index = series.index * 30.0
    series = series.map(convert_int_stage)
    if not _has_deep_sleep_stages(series):
        raise ValueError(f'Only Wake/N2 scoring found in {fp} - rejecting sleep/wake-only recording.')
    if convert_time:
        series.index = edf_start + pd.TimedeltaIndex(series.index, unit='s')
    return series


def parse_txt_annotations(fp: str) -> pd.Series | None:
    """Parse annotations from a WSC .txt file (either format)."""
    if fp.endswith('.stg.txt'):
        return parse_stg_file(fp)
    if fp.endswith('.allscore.txt'):
        return parse_all_score(fp)
    raise ValueError(f'File extension {fp=} unsupported. Expected .stg.txt or .allscore.txt')
