"""Vendored split-ID lists + the 2a/2b split scripts.

The paper's train/val/test membership (16,368 session IDs — reference
``src/wav2sleep/data/splits/**``) must be available out of the box, with no
env var and no reference checkout (reference ``data/nsrr.py:9-17``).
"""

import os
import subprocess
import sys

import pandas as pd
import pytest

from wav2sleep_tpu.data.nsrr import get_split, splits_roots
from wav2sleep_tpu.settings import CENSUS, KNOWN_DATASETS, TEST, TRAIN, VAL

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture
def self_contained(monkeypatch):
    """Hide the env-var and reference fallbacks so only vendored lists count."""
    monkeypatch.delenv('WAV2SLEEP_SPLITS', raising=False)
    monkeypatch.setenv('W2S_REFERENCE_SRC', '/nonexistent')


def test_vendored_splits_out_of_the_box(self_contained):
    assert get_split('shhs', TRAIN) and len(get_split('shhs', TRAIN)) == 6441
    assert len(get_split('shhs', VAL)) == 500
    assert len(get_split('shhs', TEST)) == 1000
    assert len(get_split(CENSUS, VAL)) == 500
    assert len(get_split(CENSUS, TEST)) == 500
    total = 0
    assert CENSUS in KNOWN_DATASETS
    for ds in KNOWN_DATASETS:
        for split in (TRAIN, VAL, TEST):
            ids = get_split(ds, split)
            assert len(ids) == len(set(ids)), f'duplicate IDs in {ds}/{split}'
            total += len(ids)
    assert total == 16368


def test_env_var_overrides_vendored(self_contained, monkeypatch, tmp_path):
    ds_dir = tmp_path / 'shhs'
    ds_dir.mkdir()
    (ds_dir / 'train.txt').write_text('custom-1\ncustom-2\n')
    monkeypatch.setenv('WAV2SLEEP_SPLITS', str(tmp_path))
    assert get_split('shhs', TRAIN) == ['custom-1', 'custom-2']
    assert str(tmp_path) == splits_roots()[0]


def _write_toy_parquet(fp):
    os.makedirs(os.path.dirname(fp), exist_ok=True)
    pd.DataFrame({'Stage': [0.0, 1.0]}).to_parquet(fp)


def _run_script(name, *args):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = REPO
    return subprocess.run(
        [sys.executable, os.path.join(REPO, 'preprocessing', name), *args],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )


def test_2a_splits_toy_ingest_folder(self_contained, tmp_path):
    train_ids = get_split('shhs', TRAIN)[:2]
    val_ids = get_split('shhs', VAL)[:1]
    test_ids = get_split('shhs', TEST)[:1]
    folder = tmp_path / 'shhs'
    for sid in train_ids + val_ids + test_ids + ['shhs1-999999']:
        _write_toy_parquet(str(folder / 'ingest' / f'{sid}.parquet'))
    proc = _run_script('2a_create_splits_paper.py', '--folder', str(folder))
    assert proc.returncode == 0, proc.stderr
    assert 'Created 2 train, 1 val, 1 test files' in proc.stdout
    for split, ids in ((TRAIN, train_ids), (VAL, val_ids), (TEST, test_ids)):
        linked = sorted(os.listdir(folder / split))
        assert linked == sorted(f'{sid}.parquet' for sid in ids)
        assert all(os.path.islink(folder / split / fn) for fn in linked)
    # The unknown session lands in no split.
    assert not any('999999' in fn for s in (TRAIN, VAL, TEST) for fn in os.listdir(folder / s))


def test_2b_census_assembly_and_missing_id_failure(self_contained, tmp_path, monkeypatch):
    # Full census membership is 1,000 nights; point get_split at a 3-ID toy
    # census list (env override) while datasets still resolve normally.
    val_ids = get_split(CENSUS, VAL)[:2]
    test_ids = get_split(CENSUS, TEST)[:1]
    custom = tmp_path / 'custom_splits' / CENSUS
    custom.mkdir(parents=True)
    (custom / 'val.txt').write_text('\n'.join(val_ids) + '\n')
    (custom / 'test.txt').write_text('\n'.join(test_ids) + '\n')

    root = tmp_path / 'data'
    for sid in val_ids:
        _write_toy_parquet(str(root / 'ccshs' / 'ingest' / f'{sid}.parquet'))
    # .issues files participate and are renamed clean on link (2b contract).
    _write_toy_parquet(str(root / 'ccshs' / 'ingest' / f'{test_ids[0]}.issues.parquet'))

    monkeypatch.setenv('WAV2SLEEP_SPLITS', str(tmp_path / 'custom_splits'))
    proc = _run_script('2b_create_census_split.py', '--folder', str(root))
    assert proc.returncode == 0, proc.stderr
    assert sorted(os.listdir(root / CENSUS / VAL)) == sorted(f'{s}.parquet' for s in val_ids)
    assert os.listdir(root / CENSUS / TEST) == [f'{test_ids[0]}.parquet']  # .issues stripped

    # Missing any census ID must fail loudly (reference 2b:34-37).
    os.remove(root / 'ccshs' / 'ingest' / f'{val_ids[0]}.parquet')
    os.remove(root / CENSUS / VAL / f'{val_ids[0]}.parquet')
    proc = _run_script('2b_create_census_split.py', '--folder', str(root))
    assert proc.returncode != 0
    assert 'expected' in proc.stderr
