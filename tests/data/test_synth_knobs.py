"""Corpus difficulty knobs (data/synth.py): overlap + label_noise.

These knobs exist so convergence drives and transport-quality measurements
can run on corpora where eval accuracy sits below ceiling (VERDICT r4 weak
#3) — label flips create irreducible error, overlap shrinks the per-stage
physiological separation.
"""

import numpy as np

from wav2sleep_tpu.data.synth import (
    _blend_toward_mean,
    synth_night,
    synth_night_eog,
)


def test_defaults_unchanged_and_deterministic():
    s1, y1 = synth_night(np.random.default_rng(7), 1.0)
    copies = {k: v.copy() for k, v in s1.items()}
    s2, y2 = synth_night(np.random.default_rng(7), 1.0)
    assert np.array_equal(y1, y2)
    for k in copies:
        assert np.array_equal(copies[k], s2[k])


def test_label_noise_flips_requested_fraction():
    _, y0 = synth_night(np.random.default_rng(7), 4.0)
    _, yn = synth_night(np.random.default_rng(7), 4.0, label_noise=0.2)
    frac = float((yn != y0).mean())
    assert 0.12 < frac < 0.28
    assert yn.min() >= 0 and yn.max() <= 3
    # Same stage sequence drives the SIGNALS either way (flips are label-only).
    s0, _ = synth_night(np.random.default_rng(7), 1.0)
    ecg0 = s0['ECG'].copy()
    s1, _ = synth_night(np.random.default_rng(7), 1.0, label_noise=0.2)
    assert np.array_equal(ecg0, s1['ECG'])


def test_overlap_shrinks_stage_separation():
    tab = np.array([1.0, 2.0, 3.0, 6.0])
    assert np.allclose(_blend_toward_mean(tab, 0.0), tab)
    assert np.allclose(_blend_toward_mean(tab, 1.0), np.full(4, 3.0))

    sig_e, y_e = synth_night(np.random.default_rng(7), 2.0)
    abd_e = sig_e['ABDO RES'].copy().reshape(len(y_e), -1).std(-1)
    means_e = [abd_e[y_e == k].mean() for k in range(4)]
    sig_h, y_h = synth_night(np.random.default_rng(7), 2.0, overlap=0.8)
    abd_h = sig_h['ABDO RES'].reshape(len(y_h), -1).std(-1)
    means_h = [abd_h[y_h == k].mean() for k in range(4)]
    assert np.ptp(means_h) < 0.5 * np.ptp(means_e)


def test_eog_knobs():
    _, y0 = synth_night_eog(np.random.default_rng(3), 4.0)
    sig, y = synth_night_eog(np.random.default_rng(3), 4.0, overlap=0.5, label_noise=0.15)
    assert y.min() >= 0 and y.max() <= 4
    frac = float((y != y0).mean())
    assert 0.08 < frac < 0.23
    assert set(sig) == {'EOG(L)', 'EOG(R)'}
