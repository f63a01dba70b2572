"""Offline ingestion: per-night EDF + annotations -> training parquet.

Library core behind ``preprocessing/1_ingest.py`` (reference
preprocessing/1_ingest.py:105-231): parse labels (XML or WSC txt), reindex
onto the 1,200-slot 30 s grid with unscored -> -1, apply QC (recordings
without N1/N3/REM or with invalid voltage units are quarantined as
``.issues.parquet``; flat PPG dropped), resample signals onto the model
grids, and write parquet with the per-signal metadata dict embedded in the
schema (``b'signal_metadata'``) for real-time normalization reconstruction.
"""

from __future__ import annotations

import json
import logging
import os
from glob import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .data.edf import INV_ALT_UNIT_NAMES, VOLTAGE_SIGNALS, load_edf_arrays
from .data.preprocessing import EDF_COLS, TARGET_LABEL_INDEX, process_waveform_arrays
from .data.txt import parse_txt_annotations
from .data.xml import parse_xml_annotations
from .settings import CCSHS, CFS, CHAT, INGEST, MESA, MROS, PPG, SHHS, WSC

logger = logging.getLogger(__name__)

VALID_VOLTAGE_UNITS = set(INV_ALT_UNIT_NAMES.keys())
MIN_SIGNAL_STD = 0.001  # Below this a channel is considered flat/dead.


def check_voltage_signal_units(signal_metadata: dict[str, dict]) -> list[str]:
    """Voltage signals (ECG/EOG) whose header unit isn't a known voltage unit."""
    invalid = []
    for sig_name, meta in signal_metadata.items():
        if sig_name in VOLTAGE_SIGNALS:
            unit = meta.get('unit', '').strip()
            if unit not in VALID_VOLTAGE_UNITS:
                invalid.append(f"{sig_name} (unit='{unit}')")
    return invalid


def check_and_drop_flat_signals(
    edf: pd.DataFrame,
    signal_metadata: dict[str, dict],
    signals_to_check: list[str] | None = None,
) -> tuple[pd.DataFrame, dict[str, dict], list[str]]:
    """Drop flat/dead channels (PPG by default; some CFS/CCSHS nights record
    a disconnected pleth sensor)."""
    if signals_to_check is None:
        signals_to_check = [PPG]
    dropped = []
    for sig_name in signals_to_check:
        if sig_name in edf.columns:
            std = edf[sig_name].std()
            if std < MIN_SIGNAL_STD:
                logger.warning(f'Dropping flat signal {sig_name} (std={std:.6f})')
                edf = edf.drop(columns=[sig_name])
                signal_metadata.pop(sig_name, None)
                dropped.append(sig_name)
    return edf, signal_metadata, dropped


def check_and_drop_flat_arrays(
    arrays: dict[str, tuple],
    signal_metadata: dict[str, dict],
    signals_to_check: list[str] | None = None,
) -> tuple[dict[str, tuple], dict[str, dict], list[str]]:
    """Array-native twin of ``check_and_drop_flat_signals`` (same PPG-flat
    QC, same ddof=1 std as pandas) for the ``load_edf_arrays`` ingest path."""
    if signals_to_check is None:
        signals_to_check = [PPG]
    dropped = []
    for sig_name in signals_to_check:
        if sig_name in arrays:
            sig = arrays[sig_name][0]
            std = float(np.std(sig, ddof=1)) if len(sig) > 1 else 0.0
            if std < MIN_SIGNAL_STD:
                logger.warning(f'Dropping flat signal {sig_name} (std={std:.6f})')
                arrays = {k: v for k, v in arrays.items() if k != sig_name}
                signal_metadata.pop(sig_name, None)
                dropped.append(sig_name)
    return arrays, signal_metadata, dropped


def process_night(
    edf_fp: str,
    label_fp: str | None,
    output_fp: str,
    columns: list[str],
    overwrite: bool = False,
) -> bool:
    """One night: EDF (+ annotations) -> parquet. Returns True if written."""
    quarantine_fp = output_fp.replace('.parquet', '.issues.parquet')
    if not overwrite and (os.path.exists(output_fp) or os.path.exists(quarantine_fp)):
        # A previously QUARANTINED night is also done work — re-parsing it
        # on every rerun would redo the full EDF+label ingest just to
        # rewrite the same .issues file.
        logger.debug(f'Skipping {edf_fp=}, {output_fp=}, already exists')
        return False
    os.makedirs(os.path.dirname(output_fp), exist_ok=True)

    if label_fp is not None:
        if label_fp.endswith('.xml'):
            try:
                labels = parse_xml_annotations(label_fp)
            except Exception as e:  # noqa: BLE001 - per-file tolerance
                logger.error(f'Failed to parse: {label_fp}. {e}')
                return False
        else:
            try:
                labels = parse_txt_annotations(fp=label_fp)
            except Exception as e:  # noqa: BLE001
                logger.error(f'Failed to parse: {label_fp}. {e}')
                return False
            if labels is None:
                logger.error(f'Failed to parse: {label_fp}.')
                return False
        labels = labels.reindex(TARGET_LABEL_INDEX).fillna(-1)
        # Sleep/wake-only scoring (no N1/N3/REM) is quarantined, not trained on.
        stage_counts = labels.value_counts()
        if all(stage_counts.get(s) is None for s in (1.0, 3.0, 4.0)):
            logger.error(f'No N1, N3 or REM in {label_fp}.')
            output_fp = quarantine_fp
    else:
        labels = None

    # Array-native load + resample (process_waveform_arrays): same QC and
    # bit-identical parquet as the load_edf_data -> process_waveform_dataframe
    # contract path, minus its ~16 s/night union-index round-trip.
    arrays, signal_metadata, _start = load_edf_arrays(edf_fp, columns=columns, raise_on_missing=False)
    invalid_voltage = check_voltage_signal_units(signal_metadata)
    if invalid_voltage:
        logger.warning(f'{edf_fp}: Invalid units for voltage signals: {invalid_voltage}')
        # Idempotent: a night failing BOTH QC checks must not become
        # '.issues.issues.parquet'.
        output_fp = quarantine_fp
    arrays, signal_metadata, _dropped = check_and_drop_flat_arrays(arrays, signal_metadata)

    waveform_df = process_waveform_arrays(arrays, columns=columns)
    output_df = waveform_df if labels is None else pd.concat([waveform_df, labels], axis=1)

    table = pa.Table.from_pandas(output_df)
    metadata = dict(table.schema.metadata or {})
    metadata[b'signal_metadata'] = json.dumps(signal_metadata).encode('utf-8')
    pq.write_table(table.replace_schema_metadata(metadata), output_fp)
    return True


def read_signal_metadata(parquet_fp: str) -> dict[str, dict]:
    """Read back the embedded per-signal metadata dict."""
    meta = pq.read_schema(parquet_fp, memory_map=True).metadata or {}
    raw = meta.get(b'signal_metadata')
    return json.loads(raw.decode('utf-8')) if raw else {}


def get_edf_path(session_id: str, dataset: str, folder: str) -> str:
    """Dataset-specific EDF layout (reference 1_ingest.py:169-188)."""
    if dataset == SHHS:
        partition, _ = session_id.split('-')  # shhs1 / shhs2 visit partitions
        return os.path.join(folder, 'polysomnography/edfs', partition, f'{session_id}.edf')
    if dataset == MROS:
        _, partition, *_ = session_id.split('-')  # mros visit1/visit2
        return os.path.join(folder, 'polysomnography/edfs', partition, f'{session_id}.edf')
    if dataset == CHAT:
        if 'nonrandomized' in session_id:
            partition = 'nonrandomized'
        else:
            partition = session_id.split('-')[1]
        edf_fp = os.path.join(folder, 'polysomnography/edfs', partition, f'{session_id}.edf')
        fixed = edf_fp.replace('.edf', '_fixed.edf')
        # Prefer repaired headers (physical_max==0.0 files, see 0_fix_edfs).
        return fixed if os.path.exists(fixed) else edf_fp
    return os.path.join(folder, 'polysomnography/edfs', f'{session_id}.edf')


def prepare_dataset(folder: str, output_folder: str, dataset: str) -> dict[str, dict[str, str | None]]:
    """Build {session_id: {edf_fp, label_fp, output_fp}} for a dataset
    (reference 1_ingest.py:191-231): WSC pairs txt annotations, NSRR
    datasets use standardized XML, unknown datasets go EDF-only."""
    fp_dict: dict[str, dict[str, str | None]] = {}
    if dataset == WSC:
        for edf_fp in glob(f'{folder}/**/*.edf', recursive=True):
            stg_fp = edf_fp.replace('.edf', '.stg.txt')
            all_score_fp = edf_fp.replace('.edf', '.allscore.txt')
            if os.path.exists(stg_fp):
                label_fp = stg_fp
            elif os.path.exists(all_score_fp):
                label_fp = all_score_fp
            else:
                continue
            session_id = os.path.basename(edf_fp).replace('.edf', '')
            output_fp = os.path.join(output_folder, dataset, INGEST, f'{session_id}.parquet')
            fp_dict[session_id] = {'edf_fp': edf_fp, 'label_fp': label_fp, 'output_fp': output_fp}
    elif dataset in (SHHS, MROS, CHAT, MESA, CCSHS, CFS):
        for label_fp in glob(f'{folder}/polysomnography/annotations-events-nsrr/**/**.xml', recursive=True):
            session_id = os.path.basename(label_fp).replace('-nsrr.xml', '')
            edf_fp = get_edf_path(session_id, dataset, folder)
            if not os.path.exists(edf_fp):
                logger.warning(f"{edf_fp=} doesn't exist. Skipping...")
                continue
            output_fp = os.path.join(output_folder, dataset, INGEST, f'{session_id}.parquet')
            fp_dict[session_id] = {'edf_fp': edf_fp, 'label_fp': label_fp, 'output_fp': output_fp}
    else:
        logger.warning(f'Unknown dataset: {dataset}. Only processing EDF files.')
        for edf_fp in glob(f'{folder}/**/*.edf', recursive=True):
            if os.path.exists(edf_fp.replace('.edf', '_fixed.edf')):
                continue  # Prefer the repaired copy (picked up separately).
            output_fp = edf_fp.replace(folder, output_folder).replace('.edf', '.parquet')
            fp_dict[os.path.basename(edf_fp)] = {'edf_fp': edf_fp, 'label_fp': None, 'output_fp': output_fp}
    return fp_dict


def process_files(
    fp_dict: dict[str, dict],
    max_parallel: int = 1,
    overwrite: bool = False,
    columns: list[str] | None = None,
    shard_hosts: bool = False,
) -> int:
    """Fan the work list out over processes (and optionally TPU-VM hosts)."""
    import functools

    from .parallel.map import parallelise, shard_across_hosts

    columns = columns or EDF_COLS
    # Deterministic order BEFORE sharding: fp_dict is glob-populated and
    # os.scandir order is not guaranteed identical across hosts, so an
    # unsorted round-robin could assign one night to two hosts (concurrent
    # writes to the same parquet) and another to none.
    work = [fp_dict[k] for k in sorted(fp_dict)]
    if shard_hosts:
        work = shard_across_hosts(work)
    logger.info(f'Preparing to process {len(work)} files.')

    proc = functools.partial(_safe_process_night, columns=columns, overwrite=overwrite)
    if max_parallel > 1:
        converted = sum(parallelise(proc, work, use_tqdm=True, max_parallel=max_parallel))
    else:
        converted = sum(proc(arg) for arg in work)
    logger.info(f'Converted {converted} files.')
    return converted


def _safe_process_night(arg_dict: dict, columns: list[str], overwrite: bool) -> bool:
    try:
        return process_night(columns=columns, overwrite=overwrite, **arg_dict)
    except Exception as e:  # noqa: BLE001 - per-file tolerance by design
        logger.error(f'Failed on {arg_dict} - {e}')
        return False
