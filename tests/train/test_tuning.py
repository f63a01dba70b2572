"""Batch-size auto-tuner (train/tuning.py — the Lightning Tuner power-scaling
role, reference scripts/train.py:49-57): doubling probe settles on the last
batch that fit, re-raises non-OOM errors, and carries the same state trees as
the real step (EMA / grad-accum / offload-ring flags)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2sleep_tpu import models as jm
from wav2sleep_tpu.train import step as step_mod
from wav2sleep_tpu.train.tuning import tune_batch_size


def _tiny_model():
    return jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ABD': 'ABD'}), feature_dim=8, activation='gelu',
            norm='instance', chunk_causal=False, initial_channels=2, max_channels=4,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=8, layers=1, dim_ff=16, nhead=2, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=8, num_layers=1, kernel_size=3, num_dilations=1, norm='layer', dropout=0.0),
        num_classes=4,
    )


def _fake_step_factory(oom_at: int | None):
    """Stand-in for make_train_step: raise a RESOURCE_EXHAUSTED-shaped error
    for batches >= oom_at, otherwise return a loss like the real step."""

    def make_fake(model, tx, num_classes, **kwargs):
        def fake_step(state, batch, rng):
            x, _ = batch
            b = next(iter(x.values())).shape[0]
            if oom_at is not None and b >= oom_at:
                raise RuntimeError(f'RESOURCE_EXHAUSTED: Out of memory at batch {b}')
            return state, {'loss': jnp.zeros(())}

        return fake_step

    return make_fake


def test_settles_on_last_fitting_power_of_two(monkeypatch):
    monkeypatch.setattr(step_mod, 'make_train_step', _fake_step_factory(oom_at=16))
    best = tune_batch_size(_tiny_model(), columns=['ABD'], epochs_per_night=2, start=2, max_batch=512)
    assert best == 8  # 2, 4, 8 fit; 16 OOMs.


def test_caps_at_max_batch_when_everything_fits(monkeypatch):
    monkeypatch.setattr(step_mod, 'make_train_step', _fake_step_factory(oom_at=None))
    best = tune_batch_size(_tiny_model(), columns=['ABD'], epochs_per_night=2, start=4, max_batch=8)
    assert best == 8


def test_oom_on_first_probe_returns_zero(monkeypatch):
    monkeypatch.setattr(step_mod, 'make_train_step', _fake_step_factory(oom_at=2))
    best = tune_batch_size(_tiny_model(), columns=['ABD'], epochs_per_night=2, start=2, max_batch=8)
    assert best == 0


def test_non_oom_errors_propagate(monkeypatch):
    def make_broken(model, tx, num_classes, **kwargs):
        def broken_step(state, batch, rng):
            raise RuntimeError('INVALID_ARGUMENT: shapes are wrong')

        return broken_step

    monkeypatch.setattr(step_mod, 'make_train_step', make_broken)
    with pytest.raises(RuntimeError, match='INVALID_ARGUMENT'):
        tune_batch_size(_tiny_model(), columns=['ABD'], epochs_per_night=2, start=2, max_batch=8)


def test_real_probe_with_full_state_trees():
    """One real compile+step on CPU with every state-tree flag on: the probe
    must execute the genuine train step (EMA tree, MultiSteps acc tree, and
    the offload snapshot ring) without error and report the size fits."""
    best = tune_batch_size(
        _tiny_model(), columns=['ABD'], epochs_per_night=2, start=2, max_batch=2,
        ema=True, grad_accum=True, ema_pending_trees=2,
    )
    assert best == 2
