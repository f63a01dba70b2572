"""Direct unit + mutation-fuzz tests for the annotation parsers.

Covers wav2sleep_tpu/data/xml.py (NSRR XML stage events; reference
src/wav2sleep/data/xml.py) and wav2sleep_tpu/data/txt.py (WSC .allscore.txt /
.stg.txt; reference src/wav2sleep/data/txt.py). The ingest pipeline wraps
these in per-file tolerance (`ingest.py`), so the fuzz contract is: a parse
either returns a structurally sane series (or None for soft rejects) or
raises a clean Python exception — never returns garbage.
"""

import datetime
import os

import numpy as np
import pandas as pd
import pytest

from wav2sleep_tpu.data.edf import write_edf
from wav2sleep_tpu.data.txt import (
    MAX_RECORDING_LENGTH,
    MIN_RECORDING_LENGTH,
    get_start_from_log,
    parse_all_score,
    parse_stg_file,
    parse_txt_annotations,
)
from wav2sleep_tpu.data.xml import parse_xml_annotations

VALID_STAGES = {0.0, 1.0, 2.0, 3.0, 4.0}
EDF_START = datetime.datetime(2000, 1, 1, 21, 58, 0)


def _assert_sane_stage_series(s: pd.Series):
    """Structural invariants every successful parse must satisfy."""
    assert isinstance(s, pd.Series)
    idx = np.asarray(s.index, dtype=np.float64)
    assert (idx > 0).all()
    assert (np.diff(idx) == 30.0).all(), 'labels must sit on a 30 s grid'
    vals = s.to_numpy(dtype=np.float64, na_value=np.nan)
    finite = vals[np.isfinite(vals)]
    assert set(finite.tolist()) <= VALID_STAGES


# ---------------------------------------------------------------------------
# XML (NSRR) fixtures
# ---------------------------------------------------------------------------


def _stage_event(concept: str, start: float, dur: float) -> str:
    return (
        '<ScoredEvent>\n<EventType>Stages.Stages</EventType>\n'
        f'<EventConcept>{concept}</EventConcept>\n<Start>{start}</Start>\n'
        f'<Duration>{dur}</Duration>\n</ScoredEvent>\n'
    )


def _xml_doc(events: str, n_start_blocks: int = 1) -> str:
    start_block = (
        '<ScoredEvent>\n<EventType></EventType>\n'
        '<EventConcept>Recording Start Time</EventConcept>\n'
        '<Start>0</Start>\n<Duration>41400</Duration>\n</ScoredEvent>\n'
    )
    return (
        '<PSGAnnotation>\n<ScoredEvents>\n'
        + start_block * n_start_blocks
        + events
        + '</ScoredEvents>\n</PSGAnnotation>\n'
    )


@pytest.fixture()
def xml_file(tmp_path):
    events = (
        _stage_event('Wake|0', 0, 60)
        + _stage_event('Stage 2 sleep|2', 60, 90)
        + _stage_event('REM sleep|5', 150, 30)
        + _stage_event('Unscored|9', 180, 30)
    )
    fp = str(tmp_path / 'rec-nsrr.xml')
    with open(fp, 'w') as f:
        f.write(_xml_doc(events))
    return fp


def test_xml_parse_expands_epochs_and_maps_stages(xml_file):
    s = parse_xml_annotations(xml_file)
    # 60s Wake + 90s N2 + 30s REM + 30s unscored = 7 epochs, +30 s shift.
    assert list(s.index) == [30.0, 60.0, 90.0, 120.0, 150.0, 180.0, 210.0]
    assert list(s.values[:6]) == [0, 0, 2, 2, 2, 4]  # REM(5) -> 4
    assert np.isnan(s.values[6])  # unscored(9) -> NaN
    _assert_sane_stage_series(s)


def test_xml_missing_start_time_raises(tmp_path):
    fp = str(tmp_path / 'x.xml')
    with open(fp, 'w') as f:
        f.write(_xml_doc(_stage_event('Wake|0', 0, 30), n_start_blocks=0))
    with pytest.raises(ValueError, match='no start time'):
        parse_xml_annotations(fp)


def test_xml_multiple_start_times_raise(tmp_path):
    fp = str(tmp_path / 'x.xml')
    with open(fp, 'w') as f:
        f.write(_xml_doc(_stage_event('Wake|0', 0, 30), n_start_blocks=2))
    with pytest.raises(ValueError, match='multiple start times'):
        parse_xml_annotations(fp)


def test_xml_first_stage_not_at_zero_raises(tmp_path):
    fp = str(tmp_path / 'x.xml')
    with open(fp, 'w') as f:
        f.write(_xml_doc(_stage_event('Wake|0', 30, 30)))
    with pytest.raises(ValueError, match='did not start at 0.0'):
        parse_xml_annotations(fp)


def test_xml_non_30s_duration_raises(tmp_path):
    fp = str(tmp_path / 'x.xml')
    with open(fp, 'w') as f:
        f.write(_xml_doc(_stage_event('Wake|0', 0, 45)))
    with pytest.raises(ValueError, match='Non-30s epoch duration'):
        parse_xml_annotations(fp)


def test_xml_invalid_stage_code_raises(tmp_path):
    fp = str(tmp_path / 'x.xml')
    with open(fp, 'w') as f:
        f.write(_xml_doc(_stage_event('Mystery|8', 0, 30)))
    with pytest.raises(ValueError, match='not a valid sleep stage'):
        parse_xml_annotations(fp)


def test_xml_mutation_fuzz(xml_file):
    """Character-mutation fuzz: every mutated document must either parse to a
    sane series or raise ValueError — the only exception type the parser is
    specified to raise (regex misses simply drop events)."""
    original = open(xml_file).read()
    rng = np.random.default_rng(7)
    printable = np.frombuffer(bytes(range(32, 127)) + b'\n', dtype=np.uint8)
    mut_fp = xml_file + '.fuzz'
    for _ in range(200):
        chars = np.frombuffer(original.encode(), dtype=np.uint8).copy()
        for _ in range(int(rng.integers(1, 6))):
            chars[int(rng.integers(0, len(chars)))] = printable[int(rng.integers(0, len(printable)))]
        with open(mut_fp, 'wb') as f:
            f.write(chars.tobytes())
        try:
            s = parse_xml_annotations(mut_fp)
        except ValueError:
            continue
        if len(s):
            _assert_sane_stage_series(s)


# ---------------------------------------------------------------------------
# WSC .allscore.txt fixtures
# ---------------------------------------------------------------------------

ALLSCORE_ROWS = [
    '21:58:00.00\tSTART RECORDING',
    '22:00:00.00\tSTAGE - W',
    '23:00:00.00\tSTAGE - N1',
    '00:30:00.00\tSTAGE - N3',
    '02:30:00.00\tSTAGE - R',
]


def _write_night_edf(fp: str, hours: float = 5.0, start: datetime.datetime = EDF_START):
    n = int(hours * 3600)
    write_edf(fp, {'ECG': np.zeros(n)}, {'ECG': 1.0}, start=start)


@pytest.fixture()
def allscore_file(tmp_path):
    fp = str(tmp_path / 'subj1.allscore.txt')
    _write_night_edf(str(tmp_path / 'subj1.edf'))
    with open(fp, 'w') as f:
        f.write('\n'.join(ALLSCORE_ROWS) + '\n')
    return fp


def test_allscore_parse_grid_and_stages(allscore_file):
    s = parse_all_score(allscore_file)
    _assert_sane_stage_series(s)
    assert s.index[0] == 30.0
    # Last event at 02:30 next day = 4h32m after the 21:58 start.
    assert MIN_RECORDING_LENGTH <= s.index[-1] <= MAX_RECORDING_LENGTH
    assert {1.0, 3.0, 4.0} <= set(s.dropna().unique().tolist())
    # Dispatch through the extension router too.
    s2 = parse_txt_annotations(allscore_file)
    pd.testing.assert_series_equal(s, s2)


def test_allscore_power_failure_returns_none(tmp_path, allscore_file):
    with open(allscore_file, 'a') as f:
        f.write('03:00:00.00\tPOWER FAILURE RECOVERY\n')
    assert parse_all_score(allscore_file) is None


def test_allscore_missing_start_returns_none(tmp_path):
    fp = str(tmp_path / 'subj1.allscore.txt')
    _write_night_edf(str(tmp_path / 'subj1.edf'))
    with open(fp, 'w') as f:
        f.write('\n'.join(ALLSCORE_ROWS[1:]) + '\n')
    assert parse_all_score(fp) is None


def test_allscore_edf_start_mismatch_raises(tmp_path):
    fp = str(tmp_path / 'subj1.allscore.txt')
    _write_night_edf(str(tmp_path / 'subj1.edf'), start=datetime.datetime(2000, 1, 1, 20, 0, 0))
    with open(fp, 'w') as f:
        f.write('\n'.join(ALLSCORE_ROWS) + '\n')
    with pytest.raises(ValueError, match='start mismatch'):
        parse_all_score(fp)


def test_allscore_wake_n2_only_raises(tmp_path):
    fp = str(tmp_path / 'subj1.allscore.txt')
    _write_night_edf(str(tmp_path / 'subj1.edf'))
    rows = [
        '21:58:00.00\tSTART RECORDING',
        '22:00:00.00\tSTAGE - W',
        '23:00:00.00\tSTAGE - N2',
        '02:30:00.00\tSTAGE - W',
    ]
    with open(fp, 'w') as f:
        f.write('\n'.join(rows) + '\n')
    with pytest.raises(ValueError, match='Only Wake/N2'):
        parse_all_score(fp)


def test_allscore_too_short_returns_none(tmp_path):
    fp = str(tmp_path / 'subj1.allscore.txt')
    _write_night_edf(str(tmp_path / 'subj1.edf'))
    rows = [
        '21:58:00.00\tSTART RECORDING',
        '22:00:00.00\tSTAGE - N3',
        '22:30:00.00\tSTAGE - R',
    ]
    with open(fp, 'w') as f:
        f.write('\n'.join(rows) + '\n')
    assert parse_all_score(fp) is None


def test_allscore_pre_start_annotations_dropped(tmp_path):
    # Stray annotations from an earlier session precede START RECORDING.
    fp = str(tmp_path / 'subj1.allscore.txt')
    _write_night_edf(str(tmp_path / 'subj1.edf'))
    rows = ['17:00:00.00\tSTAGE - W'] + ALLSCORE_ROWS
    with open(fp, 'w') as f:
        f.write('\n'.join(rows) + '\n')
    s = parse_all_score(fp)
    _assert_sane_stage_series(s)
    assert s.index[-1] <= MAX_RECORDING_LENGTH


def test_allscore_mutation_fuzz(allscore_file):
    """Mutation fuzz over the annotation text (the paired EDF stays valid):
    each trial must return None, a sane series, or raise a clean exception
    (ingest's per-file tolerance catches Exception by design)."""
    original = open(allscore_file, 'rb').read()
    rng = np.random.default_rng(11)
    mut_fp = allscore_file  # keep the '.allscore.txt' suffix -> same EDF pairing
    for _ in range(150):
        data = bytearray(original)
        for _ in range(int(rng.integers(1, 5))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        with open(mut_fp, 'wb') as f:
            f.write(data)
        try:
            s = parse_all_score(mut_fp)
        except Exception:
            continue
        if s is not None and len(s):
            _assert_sane_stage_series(s)


# ---------------------------------------------------------------------------
# WSC .stg.txt fixtures
# ---------------------------------------------------------------------------


@pytest.fixture()
def stg_file(tmp_path):
    fp = str(tmp_path / 'subj2.stg.txt')
    _write_night_edf(str(tmp_path / 'subj2.edf'))
    body = 'Epoch\tUser-Defined Stage\n'
    body += ''.join(f'{i}\t{v}\n' for i, v in enumerate([0, 1, 2, 3, 4, 5, 0] * 100, start=1))
    with open(fp, 'w') as f:
        f.write(body)
    with open(str(tmp_path / 'subj2.log.txt'), 'w') as f:
        f.write('21:58:00 1\tRecording Started\n10:00:00 2\tLights Out\n')
    return fp


def test_stg_parse_maps_and_grids(stg_file):
    s = parse_stg_file(stg_file)
    _assert_sane_stage_series(s)
    assert s.index[0] == 30.0
    # N4(4) -> 3 and REM(5) -> 4 both present in the cycle.
    assert {0.0, 1.0, 2.0, 3.0, 4.0} == set(s.dropna().unique().tolist())
    s2 = parse_txt_annotations(stg_file)
    pd.testing.assert_series_equal(s, s2)


def test_stg_headerless_variant(tmp_path):
    fp = str(tmp_path / 'subj3.stg.txt')
    _write_night_edf(str(tmp_path / 'subj3.edf'))
    with open(fp, 'w') as f:
        f.write(''.join(f'{i}\t{v}\t0\n' for i, v in enumerate([0, 1, 2, 3, 4, 5] * 120, start=1)))
    with open(str(tmp_path / 'subj3.log.txt'), 'w') as f:
        f.write('21:58:00 1\tRecording Started\n')
    s = parse_stg_file(fp)
    _assert_sane_stage_series(s)


def test_stg_pairing_survives_stg_in_directory_name(tmp_path):
    # Regression: the log/EDF lookup must be suffix-anchored — a directory
    # named 'stg_files' used to get rewritten to 'log_files' by the pairing.
    d = tmp_path / 'stg_files'
    d.mkdir()
    fp = str(d / 'subj6.stg.txt')
    _write_night_edf(str(d / 'subj6.edf'))
    body = 'Epoch\tUser-Defined Stage\n'
    body += ''.join(f'{i}\t{v}\n' for i, v in enumerate([0, 1, 2, 3, 4, 5, 0] * 100, start=1))
    with open(fp, 'w') as f:
        f.write(body)
    with open(str(d / 'subj6.log.txt'), 'w') as f:
        f.write('21:58:00 1\tRecording Started\n')
    s = parse_stg_file(fp)
    _assert_sane_stage_series(s)


def test_stg_missing_log_raises(tmp_path):
    fp = str(tmp_path / 'subj4.stg.txt')
    _write_night_edf(str(tmp_path / 'subj4.edf'))
    with open(fp, 'w') as f:
        f.write('Epoch\tUser-Defined Stage\n1\t0\n')
    with pytest.raises(FileNotFoundError):
        parse_stg_file(fp)


def test_stg_start_mismatch_returns_none(stg_file, tmp_path):
    _write_night_edf(str(tmp_path / 'subj2.edf'), start=datetime.datetime(2000, 1, 1, 20, 0, 0))
    assert parse_stg_file(stg_file) is None


def test_stg_short_edf_returns_none(stg_file, tmp_path):
    _write_night_edf(str(tmp_path / 'subj2.edf'), hours=1.0)
    assert parse_stg_file(stg_file) is None


def test_stg_wake_n2_only_raises(tmp_path):
    fp = str(tmp_path / 'subj5.stg.txt')
    _write_night_edf(str(tmp_path / 'subj5.edf'))
    body = 'Epoch\tUser-Defined Stage\n'
    body += ''.join(f'{i}\t{v}\n' for i, v in enumerate([0, 2] * 300, start=1))
    with open(fp, 'w') as f:
        f.write(body)
    with open(str(tmp_path / 'subj5.log.txt'), 'w') as f:
        f.write('21:58:00 1\tRecording Started\n')
    with pytest.raises(ValueError, match='Only Wake/N2'):
        parse_stg_file(fp)


def test_log_multiple_starts_picks_closest_to_midnight(tmp_path):
    fp = str(tmp_path / 'multi.log.txt')
    with open(fp, 'w') as f:
        f.write('20:00:00 1\tRecording Started\n')
        f.write('some malformed line\n')
        f.write('21:58:00 5\tRecording Started\n')
    time, epoch = get_start_from_log(fp)
    assert time == '21:58:00'
    assert epoch == '5'


def test_log_no_start_returns_none_pair(tmp_path):
    fp = str(tmp_path / 'empty.log.txt')
    with open(fp, 'w') as f:
        f.write('10:00:00 1\tLights Out\n')
    assert get_start_from_log(fp) == (None, None)


def test_unsupported_extension_raises(tmp_path):
    fp = str(tmp_path / 'subj.something.txt')
    with open(fp, 'w') as f:
        f.write('x')
    with pytest.raises(ValueError, match='unsupported'):
        parse_txt_annotations(fp)


def test_stg_mutation_fuzz(stg_file):
    """Mutation fuzz over the stg text: None, sane series, or clean raise."""
    original = open(stg_file, 'rb').read()
    rng = np.random.default_rng(13)
    for _ in range(150):
        data = bytearray(original)
        for _ in range(int(rng.integers(1, 5))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        with open(stg_file, 'wb') as f:
            f.write(data)
        try:
            s = parse_stg_file(stg_file)
        except Exception:
            continue
        if s is not None and len(s):
            _assert_sane_stage_series(s)
