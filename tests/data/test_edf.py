"""EDF reader tests: round-trip through our minimal writer + semantics checks."""

import datetime

import numpy as np
import pytest

from wav2sleep_tpu.data.edf import (
    get_column_match,
    get_edf_end,
    get_edf_signals,
    get_edf_start,
    get_unit_scaling,
    load_edf_data,
    read_edf_header,
    write_edf,
)


@pytest.fixture
def edf_file(tmp_path):
    rng = np.random.default_rng(0)
    n_sec = 120
    ecg = (np.sin(np.arange(128 * n_sec) / 10) * 500).astype(np.float64)  # uV scale
    abd = rng.uniform(-0.9, 0.9, size=32 * n_sec)  # stay inside the (-1, 1) physical range
    fp = str(tmp_path / 'night.edf')
    write_edf(
        fp,
        signals={'EKG': ecg, 'ABDO RES': abd, 'SpO2': rng.normal(size=1 * n_sec)},
        sampling_freqs={'EKG': 128.0, 'ABDO RES': 32.0, 'SpO2': 1.0},
        units={'EKG': 'uV', 'ABDO RES': ''},
        physical_ranges={'EKG': (-1000.0, 1000.0), 'ABDO RES': (-1.0, 1.0)},
        start=datetime.datetime(2001, 6, 15, 22, 30, 5),
        record_duration=1.0,
    )
    return fp, ecg, abd


def test_header_roundtrip(edf_file):
    fp, *_ = edf_file
    h = read_edf_header(fp)
    assert h.n_records == 120
    assert [c.label for c in h.channels] == ['EKG', 'ABDO RES', 'SpO2']
    assert h.channels[0].samples_per_record == 128
    assert get_edf_start(fp) == datetime.datetime(2001, 6, 15, 22, 30, 5)
    assert get_edf_end(fp) == datetime.datetime(2001, 6, 15, 22, 32, 5)


def test_load_with_alias_and_scaling(edf_file):
    fp, ecg, abd = edf_file
    df, metadata = load_edf_data(fp, columns=['ECG', 'ABD'])
    # EKG alias resolved; uV converted to mV.
    np.testing.assert_allclose(df['ECG'].dropna().to_numpy(), ecg * 1e-3, atol=2e-4)
    # ABD normalized to [-1, 1] via physical range (already (-1,1) -> identity).
    np.testing.assert_allclose(df['ABD'].dropna().to_numpy(), abd, atol=1e-4)
    assert metadata['ECG']['norm_method'] == 'voltage_to_mV'
    assert metadata['ECG']['sampling_freq'] == 128.0
    assert metadata['ABD']['norm_method'] == 'physical_range'


def test_arbitrary_range_normalization(tmp_path):
    """ABD with physical range (0, 4) must map to [-1, 1] about the center."""
    x = np.linspace(0.5, 3.5, 32 * 60)
    fp = str(tmp_path / 'r.edf')
    write_edf(fp, {'ABD': x}, {'ABD': 32.0}, physical_ranges={'ABD': (0.0, 4.0)})
    df, md = load_edf_data(fp, columns=['ABD'])
    got = df['ABD'].to_numpy()
    np.testing.assert_allclose(got, (x - 2.0) / 2.0, atol=1e-3)
    assert md['ABD']['norm_scale'] == pytest.approx(0.5)


def test_broken_unit_skipped(tmp_path):
    x = np.zeros(128 * 30)
    fp = str(tmp_path / 'b.edf')
    write_edf(
        fp,
        {'ECG': x, 'EKG': x + 1},
        {'ECG': 128.0, 'EKG': 128.0},
        units={'ECG': 'BROKEN', 'EKG': 'uV'},
        physical_ranges={'ECG': (-1, 1), 'EKG': (-1, 3)},
    )
    assert get_column_match('ECG', ['ECG', 'EKG'], units_map={'ECG': 'BROKEN', 'EKG': 'uV'}) == 'EKG'
    df, md = load_edf_data(fp, columns=['ECG'])
    # The broken 'ECG' channel is skipped in favour of the EKG alias.
    assert md['ECG']['unit'] == 'uV'


def test_missing_column_behaviour(edf_file):
    fp, *_ = edf_file
    with pytest.raises(KeyError):
        load_edf_data(fp, columns=['PPG'])
    df, md = load_edf_data(fp, columns=['PPG', 'ECG'], raise_on_missing=False)
    assert 'PPG' not in df.columns and 'ECG' in df.columns


def test_convert_time_index(edf_file):
    fp, *_ = edf_file
    df, _ = load_edf_data(fp, columns=['ECG'], convert_time=True)
    assert df.index[0] == datetime.datetime(2001, 6, 15, 22, 30, 5)


def test_get_edf_signals(edf_file):
    fp, *_ = edf_file
    sigs = get_edf_signals(fp)
    assert 'ECG' in sigs  # converted from EKG
    assert sigs['ECG']['sampling_rate'] == 128.0
    raw = get_edf_signals(fp, convert=False)
    assert 'EKG' in raw


def test_unit_scaling_table():
    assert get_unit_scaling('ECG', 'uV') == 1e-3
    assert get_unit_scaling('ECG', 'mV') == 1
    assert get_unit_scaling('ECG', 'Volts') == 1e3
    assert get_unit_scaling('ABD', 'uV') == 1.0  # non-voltage: no scaling
    assert get_unit_scaling('ECG', '') == 1.0
    assert get_unit_scaling('ECG', 'weird') == 1.0


# ---------------------------------------------------------------------------
# Malformed-file robustness (SURVEY §5 failure-detection role): untrusted NSRR
# downloads arrive truncated or with Profusion-export header lies; the reader
# must salvage-and-warn or raise a CLEAN error — never an obscure mmap
# failure, never garbage data read out of the header area.


def _corrupt(fp: str, offset: int, payload: bytes) -> str:
    with open(fp, 'r+b') as f:
        f.seek(offset)
        f.write(payload)
    return fp


def test_truncated_data_area_is_clamped(edf_file, caplog):
    """A file whose data area is shorter than n_records claims (interrupted
    download) reads the whole records actually present instead of failing
    the memmap with a size error."""
    import logging
    import os

    from wav2sleep_tpu.data.edf import EdfFile

    fp, ecg, _ = edf_file
    full = read_edf_header(fp)
    record_bytes = 2 * sum(c.samples_per_record for c in full.channels)
    # Drop the last 30 records plus half a record.
    new_size = full.header_bytes + record_bytes * (full.n_records - 30) + record_bytes // 2
    os.truncate(fp, new_size)
    with caplog.at_level(logging.WARNING):
        h = read_edf_header(fp)
    assert h.n_records == full.n_records - 30
    assert any('holds' in r.message for r in caplog.records)
    with EdfFile(fp) as f:
        dig = f.read_digital('EKG')
    assert dig.size == 128 * (full.n_records - 30)


def test_lying_header_bytes_is_recomputed(edf_file, caplog):
    """header_bytes inconsistent with the signal count (a known Profusion
    export bug class) is replaced by the computed 256*(ns+1) so the data
    area does not start mid-header."""
    import logging

    fp, ecg, _ = edf_file
    _corrupt(fp, 184, b'9999    ')
    with caplog.at_level(logging.WARNING):
        h = read_edf_header(fp)
    assert h.header_bytes == 256 * (1 + len(h.channels))
    assert any('computed size' in r.message for r in caplog.records)
    # Data decodes correctly from the recomputed offset.
    df, _ = load_edf_data(fp, columns=['ECG'])
    np.testing.assert_allclose(df['ECG'].dropna().to_numpy(), ecg * 1e-3, atol=2e-4)


def test_garbage_numeric_header_fields(edf_file):
    """Non-numeric n_records / header_bytes / record_duration fields fall
    back to salvageable defaults instead of raising bare int()/float()
    ValueErrors."""
    fp, ecg, _ = edf_file
    _corrupt(fp, 184, b'huh?    ')  # header_bytes
    _corrupt(fp, 236, b'lots    ')  # n_records
    _corrupt(fp, 244, b'soon    ')  # record_duration
    h = read_edf_header(fp)
    assert h.n_records == 120  # inferred from the file size
    assert h.record_duration == 1.0
    df, _ = load_edf_data(fp, columns=['ECG'])
    np.testing.assert_allclose(df['ECG'].dropna().to_numpy(), ecg * 1e-3, atol=2e-4)


def test_garbage_signal_count_raises_cleanly(edf_file):
    fp, *_ = edf_file
    _corrupt(fp, 252, b'four')
    with pytest.raises(ValueError, match='signal count'):
        read_edf_header(fp)


def test_negative_samples_per_record_zeroed(edf_file, caplog):
    """A negative samples/record entry (corrupt signal header) is treated as
    an empty channel rather than corrupting every other channel's offsets."""
    import logging

    fp, ecg, _ = edf_file
    # SpO2 is the 3rd signal; its spr field sits at 256 + 216*ns + 2*8.
    _corrupt(fp, 256 + 216 * 3 + 2 * 8, b'-1      ')
    with caplog.at_level(logging.WARNING):
        h = read_edf_header(fp)
    assert h.channels[2].samples_per_record == 0
    assert any('samples/record' in r.message for r in caplog.records)


def test_random_bytes_raise_cleanly(tmp_path):
    """Arbitrary non-EDF bytes must raise ValueError, not crash or hang."""
    rng = np.random.default_rng(7)
    short = tmp_path / 'short.bin'
    short.write_bytes(b'\x00' * 100)
    with pytest.raises(ValueError, match='truncated'):
        read_edf_header(str(short))
    junk = tmp_path / 'junk.bin'
    junk.write_bytes(rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes())
    with pytest.raises(ValueError):
        read_edf_header(str(junk))


def test_zero_record_duration_raises_cleanly(edf_file):
    """record_duration '0' (annotation-only EDF+ or corrupt export) must be
    a clean ValueError, not a ZeroDivisionError in sampling_freq()."""
    fp, *_ = edf_file
    _corrupt(fp, 244, b'0       ')
    with pytest.raises(ValueError, match='record duration'):
        read_edf_header(fp)


def test_duplicate_labels_first_wins_consistently(edf_file):
    """Duplicate channel labels: unit-based decisions (BROKEN skip) must
    judge the FIRST matching channel — the one EdfFile.channel()/reads
    return — not the last duplicate's unit."""
    from wav2sleep_tpu.data.edf import units_map_first

    fp, *_ = edf_file
    h0 = read_edf_header(fp)
    ns = len(h0.channels)
    # Rename channel 2 ('ABDO RES') to 'EKG' -> duplicate of channel 1,
    # and mark the FIRST EKG's unit BROKEN.
    _corrupt(fp, 256 + 16 * 1, b'EKG' + b' ' * 13)
    _corrupt(fp, 256 + 96 * ns + 8 * 0, b'BROKEN  ')
    h = read_edf_header(fp)
    assert [c.label for c in h.channels][:2] == ['EKG', 'EKG']
    um = units_map_first(h)
    assert um['EKG'] == 'BROKEN'  # first occurrence, matching channel()
    from wav2sleep_tpu.data.edf import get_column_match

    # The broken first channel must make the ECG match fail (consistent
    # with what a read would return), not pass on the duplicate's unit.
    assert get_column_match('ECG', [c.label for c in h.channels],
                            units_map=um, raise_error=False) is None


def test_header_mutation_fuzz(edf_file):
    """Byte-mutation fuzz over the header area: every mutated file must
    either parse to a structurally sane header or raise ValueError — never
    an unguarded ZeroDivisionError/OverflowError/mmap crash. (The per-file
    tolerance in ingest/streaming catches ValueError by design.)"""
    fp, *_ = edf_file
    import shutil

    rng = np.random.default_rng(123)
    original = open(fp, 'rb').read()
    header_span = 256 + 216 * 3  # fixed header + 3 signal headers
    for trial in range(200):
        data = bytearray(original)
        for _ in range(rng.integers(1, 6)):
            off = int(rng.integers(0, header_span))
            data[off] = int(rng.integers(0, 256))
        mut = fp + '.fuzz'
        with open(mut, 'wb') as f:
            f.write(data)
        try:
            h = read_edf_header(mut)
            assert h.record_duration > 0
            assert all(c.samples_per_record >= 0 for c in h.channels)
            # A parse that succeeds must also support the downstream reads.
            from wav2sleep_tpu.data.edf import EdfFile

            with EdfFile(mut) as f2:
                for c in h.channels:
                    if c.samples_per_record > 0:
                        f2.sampling_freq(c.label)
        except ValueError:
            pass  # clean rejection is the contract
