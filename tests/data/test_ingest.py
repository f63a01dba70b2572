"""Ingestion pipeline integration tests: EDF+XML -> parquet -> dataset."""

import importlib.util
import json
import os
import sys

import numpy as np
import pandas as pd
import pytest

from wav2sleep_tpu.data.dataset import ParquetDataset
from wav2sleep_tpu.data.edf import write_edf
from wav2sleep_tpu.ingest import (
    prepare_dataset,
    process_files,
    process_night,
    read_signal_metadata,
)
from wav2sleep_tpu.parallel.map import parallelise, shard_across_hosts

REPO = os.path.join(os.path.dirname(__file__), '..', '..')


def make_xml(fp, stages, epochs_each=2):
    """Minimal NSRR-format annotations XML."""
    parts = [
        '<Events>',
        '<ScoredEvent>',
        '<EventConcept>Recording Start Time</EventConcept>\n<Start>0</Start>',
        '</ScoredEvent>',
    ]
    t = 0.0
    for s in stages:
        dur = 30.0 * epochs_each
        parts.append(
            '<ScoredEvent>\n'
            '<EventType>Stages.Stages</EventType>\n'
            f'<EventConcept>Stage|{s}</EventConcept>\n'
            f'<Start>{t:g}</Start>\n'
            f'<Duration>{dur:g}</Duration>\n'
            '</ScoredEvent>'
        )
        t += dur
    parts.append('</Events>')
    with open(fp, 'w') as f:
        f.write('\n'.join(parts))


def make_mesa_like(root, n_nights=2, stages=(0, 1, 2, 3, 5, 0)):
    """NSRR-style folder: polysomnography/{edfs,annotations-events-nsrr}."""
    edf_dir = root / 'mesa' / 'polysomnography' / 'edfs'
    ann_dir = root / 'mesa' / 'polysomnography' / 'annotations-events-nsrr'
    edf_dir.mkdir(parents=True, exist_ok=True)
    ann_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    n_epochs = len(stages) * 2
    n_sec = n_epochs * 30
    for i in range(n_nights):
        sid = f'mesa-sleep-{i:04d}'
        ecg = np.sin(np.arange(int(125 * n_sec)) / 11) * 600 + rng.normal(size=int(125 * n_sec)) * 20
        thx = np.sin(np.arange(int(10 * n_sec)) / 50) * 0.4
        write_edf(
            str(edf_dir / f'{sid}.edf'),
            {'EKG': ecg, 'THOR RES': thx},
            {'EKG': 125.0, 'THOR RES': 10.0},
            units={'EKG': 'uV'},
            physical_ranges={'EKG': (-1500, 1500), 'THOR RES': (-1, 1)},
        )
        make_xml(str(ann_dir / f'{sid}-nsrr.xml'), stages)
    return root / 'mesa'


def test_ingest_end_to_end(tmp_path):
    ds_folder = make_mesa_like(tmp_path / 'raw')
    out = tmp_path / 'processed'
    fp_dict = prepare_dataset(str(ds_folder), str(out), 'mesa')
    assert len(fp_dict) == 2
    n = process_files(fp_dict, max_parallel=1, columns=['ECG', 'THX'])
    assert n == 2
    parquets = sorted((out / 'mesa' / 'ingest').glob('*.parquet'))
    assert len(parquets) == 2
    # Embedded signal metadata survives.
    meta = read_signal_metadata(str(parquets[0]))
    assert meta['ECG']['norm_method'] == 'voltage_to_mV'
    assert meta['THX']['norm_method'] == 'physical_range'
    # Labels land on the 1,200-slot grid with unscored -1 beyond the night.
    df = pd.read_parquet(parquets[0])
    labels = df['Stage'].dropna()
    assert len(labels) == 1200
    assert (labels.iloc[12:] == -1).all()
    # 5 (REM raw) -> 4; stages map through convert_int_stage.
    np.testing.assert_array_equal(labels.iloc[:12].values, np.repeat([0, 1, 2, 3, 4, 0], 2))
    # The parquet is trainable via ParquetDataset.
    ds = ParquetDataset([str(p) for p in parquets], columns=['ECG', 'THX'], num_classes=4)
    signals, y = ds[0]
    assert signals['ECG'].shape == (1024 * 1200,)
    assert y.shape == (1200,)


def test_array_path_matches_dataframe_path(tmp_path):
    """process_night's array-native hot path (load_edf_arrays ->
    process_waveform_arrays) must be bit-identical to the reference-contract
    DataFrame path (load_edf_data -> process_waveform_dataframe), which it
    replaced for the ~16 s/night union-index cost."""
    from wav2sleep_tpu.data.edf import load_edf_arrays, load_edf_data
    from wav2sleep_tpu.data.preprocessing import (
        process_waveform_arrays,
        process_waveform_dataframe,
    )
    from wav2sleep_tpu.data.synth import synth_night, write_night_edf

    fp = str(tmp_path / 'night.edf')
    signals, _ = synth_night(np.random.default_rng(5), 0.5)
    write_night_edf(fp, signals)
    cols = ['ECG', 'PPG', 'ABD', 'THX']

    df, meta_df = load_edf_data(fp, columns=cols, raise_on_missing=False)
    ref = process_waveform_dataframe(df, columns=cols)
    arrays, meta_arr, _ = load_edf_arrays(fp, columns=cols, raise_on_missing=False)
    fast = process_waveform_arrays(arrays, columns=cols)

    assert meta_df == meta_arr
    pd.testing.assert_frame_equal(ref, fast)
    # Flat-PPG QC agrees between the twins (pandas ddof=1 std semantics).
    from wav2sleep_tpu.ingest import check_and_drop_flat_arrays, check_and_drop_flat_signals

    flat = {**arrays, 'PPG': (np.zeros_like(arrays['PPG'][0]), arrays['PPG'][1])}
    flat_df = df.copy()
    flat_df['PPG'] = np.where(np.isnan(flat_df['PPG']), np.nan, 0.0)
    _, _, dropped_a = check_and_drop_flat_arrays(flat, dict(meta_arr))
    _, _, dropped_d = check_and_drop_flat_signals(flat_df, dict(meta_df))
    assert dropped_a == dropped_d == ['PPG']


def test_sleep_wake_only_quarantined(tmp_path):
    ds_folder = make_mesa_like(tmp_path / 'raw', n_nights=1, stages=(0, 2, 0, 2, 0, 2))
    out = tmp_path / 'processed'
    fp_dict = prepare_dataset(str(ds_folder), str(out), 'mesa')
    process_files(fp_dict, columns=['ECG', 'THX'])
    files = sorted(os.path.basename(p) for p in (out / 'mesa' / 'ingest').glob('*.parquet'))
    assert files == ['mesa-sleep-0000.issues.parquet']


def test_overwrite_skip(tmp_path):
    ds_folder = make_mesa_like(tmp_path / 'raw', n_nights=1)
    out = tmp_path / 'processed'
    fp_dict = prepare_dataset(str(ds_folder), str(out), 'mesa')
    assert process_files(fp_dict, columns=['ECG', 'THX']) == 1
    assert process_files(fp_dict, columns=['ECG', 'THX']) == 0  # skip existing
    assert process_files(fp_dict, columns=['ECG', 'THX'], overwrite=True) == 1


def test_splits_script(tmp_path, monkeypatch):
    ds_folder = make_mesa_like(tmp_path / 'raw', n_nights=2)
    out = tmp_path / 'processed'
    fp_dict = prepare_dataset(str(ds_folder), str(out), 'mesa')
    process_files(fp_dict, columns=['ECG', 'THX'])
    # Vendor a split list: night 0 -> train, night 1 -> val.
    splits = tmp_path / 'splits' / 'mesa'
    splits.mkdir(parents=True)
    (splits / 'train.txt').write_text('mesa-sleep-0000\n')
    (splits / 'val.txt').write_text('mesa-sleep-0001\n')
    monkeypatch.setenv('WAV2SLEEP_SPLITS', str(tmp_path / 'splits'))
    spec = importlib.util.spec_from_file_location(
        'splits_2a', os.path.join(REPO, 'preprocessing', '2a_create_splits_paper.py')
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        sys, 'argv', ['2a', '--folder', str(out / 'mesa')]
    )
    mod.main()
    assert (out / 'mesa' / 'train' / 'mesa-sleep-0000.parquet').exists()
    assert (out / 'mesa' / 'val' / 'mesa-sleep-0001.parquet').exists()


def test_fix_edfs_script(tmp_path):
    # EDF with physical_max == 0.0 on one channel.
    fp = str(tmp_path / 'broken.edf')
    x = np.zeros(10 * 30)
    write_edf(
        fp,
        {'CHIN': x, 'ECG': np.sin(np.arange(10 * 30))},
        {'CHIN': 10.0, 'ECG': 10.0},
        physical_ranges={'CHIN': (0.0, 0.0), 'ECG': (-1, 1)},
    )
    spec = importlib.util.spec_from_file_location(
        'fix_edfs', os.path.join(REPO, 'preprocessing', '0_fix_edfs.py')
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.triage_edf_fp(fp) is True
    fixed = fp.replace('.edf', '_fixed.edf')
    assert os.path.exists(fixed)
    from wav2sleep_tpu.data.edf import read_edf_header

    h = read_edf_header(fixed)
    chin = [c for c in h.channels if c.label == 'CHIN'][0]
    assert chin.unit == 'BROKEN'
    assert chin.physical_max == pytest.approx(3.28)
    assert chin.physical_min == pytest.approx(-3.28)
    # Idempotent: second call skips.
    assert mod.triage_edf_fp(fp) is False


def _square(x):
    return x * x


def test_parallelise_processes():
    out = parallelise(_square, range(20), max_parallel=3)
    assert out == [i * i for i in range(20)]
    d = parallelise(_square, [1, 2, 3], max_parallel=2, return_dict=True)
    assert d == {1: 1, 2: 4, 3: 9}


def test_shard_across_hosts():
    items = list(range(10))
    shards = [shard_across_hosts(items, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert all(len(s) >= 3 for s in shards)
