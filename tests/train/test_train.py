"""Training runtime tests: masker, schedule, metrics, full Trainer smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2sleep_tpu.train.masker import SignalMasker, invert_signals, validate_batch
from wav2sleep_tpu.train.metrics import confusion_matrix, cross_entropy_ignore_index
from wav2sleep_tpu.train.scheduler import PlateauController, exp_warmup_schedule

NEG_INF = float('-inf')


def make_signals(B=64, missing=None):
    rng = np.random.default_rng(0)
    sig = {
        'ECG': rng.normal(size=(B, 32)).astype(np.float32),
        'PPG': rng.normal(size=(B, 32)).astype(np.float32),
        'THX': rng.normal(size=(B, 16)).astype(np.float32),
    }
    if missing:
        for name, rows in missing.items():
            sig[name][rows] = NEG_INF
    return {k: jnp.asarray(v) for k, v in sig.items()}


class TestMasker:
    def test_at_least_one_survivor(self):
        masker = SignalMasker({'ECG': 0.9, 'PPG': 0.9, 'THX': 0.9}, backups=['ECG', 'PPG'])
        x = make_signals(B=256)
        out = masker(jax.random.PRNGKey(0), x)
        missing = np.stack([np.isinf(np.asarray(out[k])[:, 0]) for k in out], axis=-1)
        assert not missing.all(axis=-1).any()

    def test_respects_existing_missing(self):
        # PPG missing for rows 0..9 must stay missing.
        masker = SignalMasker({'ECG': 0.0, 'PPG': 0.0, 'THX': 0.0})
        x = make_signals(B=32, missing={'PPG': slice(0, 10)})
        out = masker(jax.random.PRNGKey(1), x)
        assert np.isinf(np.asarray(out['PPG'])[:10]).all()
        assert np.isfinite(np.asarray(out['ECG'])).all()

    def test_dropout_rate_statistics(self):
        masker = SignalMasker({'ECG': 0.5, 'PPG': 0.0, 'THX': 0.0}, backups=['PPG'])
        x = make_signals(B=2000)
        out = masker(jax.random.PRNGKey(2), x)
        frac = float(np.isinf(np.asarray(out['ECG'])[:, 0]).mean())
        assert 0.4 < frac < 0.6
        assert not np.isinf(np.asarray(out['PPG'])[:, 0]).any()

    def test_invalid_probability(self):
        with pytest.raises(ValueError):
            SignalMasker({'ECG': 1.5})

    def test_validate_batch_raises_when_all_missing(self):
        x = make_signals(B=4, missing={'ECG': slice(0, 1), 'PPG': slice(0, 1), 'THX': slice(0, 1)})
        with pytest.raises(ValueError, match='all signals unavailable'):
            validate_batch(x)

    def test_masker_under_jit(self):
        masker = SignalMasker({'ECG': 0.5, 'PPG': 0.1}, backups=['ECG', 'PPG'])
        x = {k: v for k, v in make_signals(B=16).items() if k != 'THX'}
        f = jax.jit(lambda r, s: masker(r, s))
        out = f(jax.random.PRNGKey(3), x)
        assert out['ECG'].shape == x['ECG'].shape


def test_invert_signals_flips_rows():
    x = make_signals(B=200)
    out = invert_signals(jax.random.PRNGKey(0), x)
    ratio = np.asarray(out['ECG']) / np.asarray(x['ECG'])
    row_sign = ratio[:, 0]
    assert set(np.unique(np.round(row_sign))) == {-1.0, 1.0}
    # Whole rows flip together.
    assert np.allclose(ratio, row_sign[:, None])
    # Roughly half flipped.
    assert 0.35 < (row_sign < 0).mean() < 0.65


class TestScheduleParity:
    def test_exp_warmup_matches_torch_formula(self):
        lr_max, warmup, tau = 1e-3, 100, 500.0
        sched = exp_warmup_schedule(lr_max, warmup, tau)
        # torch ExpWarmUpScheduler: step k (1-based) -> warmup ramp then decay
        for count in [0, 49, 99, 100, 250, 1000]:
            step = count + 1
            if step <= warmup:
                want = lr_max * step / warmup
            else:
                want = lr_max * np.exp(-(step - warmup) / tau)
            got = float(sched(count))
            assert got == pytest.approx(want, rel=1e-6), count

    def test_plateau_controller(self):
        pc = PlateauController(factor=0.1, patience=2)
        scales = [pc.update(v) for v in [1.0, 0.9, 0.91, 0.92, 0.93, 0.94]]
        # 0.9 is best; 0.91..0.93 are 3 bad epochs -> reduction on the 3rd.
        assert scales[:4] == [1.0, 1.0, 1.0, 1.0]
        assert scales[4] == pytest.approx(0.1)


class TestMetrics:
    def test_confusion_matrix_ignores_negatives(self):
        logits = jnp.asarray(
            [[[2.0, 0, 0, 0], [0, 2.0, 0, 0], [0, 0, 2.0, 0], [0, 0, 0, 2.0]]]
        )  # preds: 0,1,2,3
        labels = jnp.asarray([[0.0, 1.0, -1.0, 2.0]])
        cm = np.asarray(confusion_matrix(logits, labels, 4))
        assert cm.sum() == 3
        assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[2, 3] == 1

    def test_cross_entropy_matches_torch(self):
        torch = pytest.importorskip('torch')
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(50, 4)).astype(np.float32)
        labels = rng.integers(-1, 4, size=50).astype(np.float32)
        ours = float(cross_entropy_ignore_index(jnp.asarray(logits), jnp.asarray(labels)))
        crit = torch.nn.CrossEntropyLoss(reduction='mean', ignore_index=-1)
        want = float(crit(torch.from_numpy(logits), torch.from_numpy(labels).long()))
        assert ours == pytest.approx(want, rel=1e-5)

    def test_cross_entropy_label_smoothing_matches_torch(self):
        torch = pytest.importorskip('torch')
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(30, 5)).astype(np.float32)
        labels = rng.integers(0, 5, size=30).astype(np.float32)
        ours = float(
            cross_entropy_ignore_index(jnp.asarray(logits), jnp.asarray(labels), label_smoothing=0.1)
        )
        crit = torch.nn.CrossEntropyLoss(reduction='mean', ignore_index=-1, label_smoothing=0.1)
        want = float(crit(torch.from_numpy(logits), torch.from_numpy(labels).long()))
        assert ours == pytest.approx(want, rel=1e-4)


class TestMultirun:
    def test_expansion_product(self):
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            'train_script', os.path.join(os.path.dirname(__file__), '..', '..', 'scripts', 'train.py'))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        argv = ['-m', 'name=x', 'datasets=mesa,shhs', 'training.optimizer.lr=1e-3,3e-4', 'epochs=2']
        out = mod.expand_multirun(argv)
        assert len(out) == 4
        # every variant keeps the non-swept override and gets a unique name
        names = set()
        for sub in out:
            assert 'epochs=2' in sub
            assert sum(a.startswith('datasets=') for a in sub) == 1
            names.add([a for a in sub if a.startswith('name=')][-1])
        assert len(names) == 4
        assert any('name=x_datasets-mesa_lr-1e-3' in n for n in names)

    def test_not_multirun(self):
        import importlib.util, os
        spec = importlib.util.spec_from_file_location(
            'train_script2', os.path.join(os.path.dirname(__file__), '..', '..', 'scripts', 'train.py'))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.expand_multirun(['name=x', 'datasets=mesa']) is None


def test_multirun_keeps_bracketed_lists():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        'train_script3', os.path.join(os.path.dirname(__file__), '..', '..', 'scripts', 'train.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.expand_multirun(['-m', 'name=x', 'datasets.train=[mesa,shhs]', 'epochs=1,2'])
    assert len(out) == 2
    for sub in out:
        assert 'datasets.train=[mesa,shhs]' in sub


def test_weight_ema_tracks_reference_formula():
    """In-graph weight EMA (the reference EMACallback role): frozen before
    start_step, then ema = d*ema + (1-d)*params after each update."""
    import optax

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.train.step import init_train_state, make_optimizer, make_train_step

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG'}), feature_dim=8, activation='gelu',
            norm='instance', chunk_causal=False, initial_channels=2, max_channels=4,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=8, layers=1, dim_ff=16, nhead=2, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=8, num_layers=1, kernel_size=3, num_dilations=1, norm='layer', dropout=0.0),
        num_classes=4,
    )
    rng = np.random.default_rng(0)
    x = {'ECG': rng.normal(size=(2, 1024 * 2)).astype(np.float32)}
    y = rng.integers(0, 4, size=(2, 2)).astype(np.float32)
    tx = make_optimizer(optax.constant_schedule(1e-2), weight_decay=0.0, grad_clip=1.0)
    state = init_train_state(model, tx, x, jax.random.PRNGKey(0), ema=True)
    step = jax.jit(make_train_step(model, tx, num_classes=4, masker=None, flip_polarity=False,
                                   ema_decay=0.5, ema_start_step=1))

    def leaf(tree):
        return np.asarray(jax.tree_util.tree_leaves(tree)[0]).copy()

    ema0 = leaf(state.ema_params)
    # Step 0 (< start_step): EMA frozen at init.
    state, _ = step(state, (x, y), jax.random.PRNGKey(1))
    np.testing.assert_allclose(leaf(state.ema_params), ema0, rtol=1e-6)
    # Step 1 (>= start_step): ema = 0.5*ema + 0.5*new_params.
    prev_ema = leaf(state.ema_params)
    state, _ = step(state, (x, y), jax.random.PRNGKey(2))
    expected = 0.5 * prev_ema + 0.5 * leaf(state.params)
    np.testing.assert_allclose(leaf(state.ema_params), expected, rtol=1e-5, atol=1e-7)
    assert not np.allclose(leaf(state.ema_params), leaf(state.params))


def test_plateau_min_lr_floors_effective_lr():
    """min_lr floors the EFFECTIVE learning rate (torch ReduceLROnPlateau:
    new_lr = max(old_lr * factor, min_lr)) — not the raw scale. With
    base_lr=1e-3 and min_lr=1e-5 the scale floor is 1e-2, so two plateaus
    land exactly on min_lr instead of 1e-3 * 1e-5."""
    pc = PlateauController(factor=0.1, patience=0, min_lr=1e-5, base_lr=1e-3)
    pc.update(1.0)  # best
    s1 = pc.update(1.0)  # bad epoch -> 0.1
    s2 = pc.update(1.0)  # -> floored at 1e-2
    s3 = pc.update(1.0)  # stays at the floor
    assert s1 == pytest.approx(0.1)
    assert s2 == pytest.approx(1e-2)  # 1e-3 * 1e-2 == min_lr
    assert s3 == pytest.approx(1e-2)


def test_weight_ema_folds_once_per_optimizer_step_under_accumulation():
    """With optax.MultiSteps(k) the EMA must fold once per APPLIED
    optimizer step, not per micro-step: per-micro-step folding on unchanged
    params compounds the decay to ema_decay^k (an EMA horizon k times
    shorter than configured). ema_start_step counts optimizer steps."""
    import optax

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.train.step import init_train_state, make_optimizer, make_train_step

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG'}), feature_dim=8, activation='gelu',
            norm='instance', chunk_causal=False, initial_channels=2, max_channels=4,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=8, layers=1, dim_ff=16, nhead=2, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=8, num_layers=1, kernel_size=3, num_dilations=1, norm='layer', dropout=0.0),
        num_classes=4,
    )
    rng = np.random.default_rng(1)
    x = {'ECG': rng.normal(size=(2, 1024 * 2)).astype(np.float32)}
    y = rng.integers(0, 4, size=(2, 2)).astype(np.float32)
    k = 2
    tx = make_optimizer(optax.constant_schedule(1e-2), weight_decay=0.0, grad_clip=1.0,
                        accumulate_steps=k)
    state = init_train_state(model, tx, x, jax.random.PRNGKey(0), ema=True)
    step = jax.jit(make_train_step(model, tx, num_classes=4, masker=None, flip_polarity=False,
                                   ema_decay=0.5, ema_start_step=0))

    def leaf(tree):
        return np.asarray(jax.tree_util.tree_leaves(tree)[0]).copy()

    ema0 = leaf(state.ema_params)
    # Micro-step 1 of 2: optimizer did NOT apply -> EMA untouched.
    state, _ = step(state, (x, y), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(leaf(state.ema_params), ema0)
    np.testing.assert_array_equal(leaf(state.params), ema0)  # params unchanged too
    # Micro-step 2 of 2: applied -> exactly ONE fold toward the new params.
    state, _ = step(state, (x, y), jax.random.PRNGKey(2))
    expected = 0.5 * ema0 + 0.5 * leaf(state.params)
    np.testing.assert_allclose(leaf(state.ema_params), expected, rtol=1e-5, atol=1e-7)
