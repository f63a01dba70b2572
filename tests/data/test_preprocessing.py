"""Resampling parity vs the reference pandas implementation + grid checks."""

import numpy as np
import pandas as pd
import pytest

from wav2sleep_tpu.data.preprocessing import (
    TARGET_LABEL_INDEX,
    process_waveform_dataframe,
    signal_target_grid,
)
from wav2sleep_tpu.data.utils import interp_to_grid, interpolate_index


def test_target_label_grid():
    assert len(TARGET_LABEL_INDEX) == 1200
    assert TARGET_LABEL_INDEX[0] == 30.0
    assert TARGET_LABEL_INDEX[-1] == 36000.0


@pytest.mark.parametrize('col,spe', [('ABD', 256), ('ECG', 1024), ('EOG-L', 4096)])
def test_signal_grid_geometry(col, spe):
    grid = signal_target_grid(col, max_length_hours=10)
    assert len(grid) == spe * 1200
    assert grid[0] == pytest.approx(30.0 / spe)
    assert grid[-1] == pytest.approx(36000.0)


def test_interp_matches_numpy_linear():
    t = np.array([0.0, 1.0, 2.0, 4.0])
    v = np.array([0.0, 2.0, 4.0, 0.0])
    tgt = np.array([-1.0, 0.5, 3.0, 5.0])
    out = interp_to_grid(t, v, tgt, interior_only=True, fill_value=0.0)
    np.testing.assert_allclose(out, [0.0, 1.0, 2.0, 0.0])
    out2 = interp_to_grid(t, v, tgt, interior_only=False)
    np.testing.assert_allclose(out2, [0.0, 1.0, 2.0, 0.0])  # clamped edges


def test_process_waveform_matches_reference(ref_blocks):
    """Differential test vs the reference pandas implementation."""
    del ref_blocks  # only used to ensure reference checkout is available
    import tests.conftest as c

    ref_pre = c.load_reference_module('wav2sleep.data.preprocessing')
    rng = np.random.default_rng(0)
    n = 20000
    t = np.sort(rng.uniform(0, 1200.0, size=n))
    df = pd.DataFrame({'ABD': rng.normal(size=n), 'ECG': rng.normal(size=n)}, index=pd.Index(t))
    ours = process_waveform_dataframe(df.copy(), ['ABD', 'ECG'], max_length_hours=1)
    theirs = ref_pre.process_waveform_dataframe(df.copy(), ['ABD', 'ECG'], max_length_hours=1)
    for col in ('ABD', 'ECG'):
        a = ours[col].dropna().to_numpy()
        b = theirs[col].dropna().to_numpy()
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_process_waveform_datetime_roundtrip():
    rng = np.random.default_rng(1)
    n = 5000
    start = pd.Timestamp('2001-06-15 22:00:00')
    idx = start + pd.to_timedelta(np.sort(rng.uniform(0, 600.0, size=n)), unit='s')
    df = pd.DataFrame({'ABD': rng.normal(size=n)}, index=idx)
    out = process_waveform_dataframe(df, ['ABD'], max_length_hours=0.25)
    assert isinstance(out.index, pd.DatetimeIndex)
    assert out.index[0] > start
    assert np.isfinite(out['ABD'].to_numpy()).all()


def test_interpolate_index_series_api():
    s = pd.Series([1.0, 3.0, np.nan, 7.0], index=pd.Index([0.0, 1.0, 2.0, 3.0]))
    tgt = pd.Index([0.5, 1.5, 2.5])
    out = interpolate_index(s, tgt)
    assert isinstance(out, pd.Series)
    # NaN at t=2 is skipped; interpolation bridges 1.0 -> 3.0.
    np.testing.assert_allclose(out.to_numpy(), [2.0, 4.0, 6.0])
