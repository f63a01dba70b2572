"""End-to-end training smoke: synthetic parquet corpus -> Trainer.fit ->
metrics, checkpoint resume, deployable export loadable by api + torch ref."""

import os

import numpy as np
import pandas as pd
import pytest

import jax

from wav2sleep_tpu import models as jm
from wav2sleep_tpu.train.datamodule import SleepDataModule
from wav2sleep_tpu.train.loop import Trainer
from wav2sleep_tpu.train.masker import SignalMasker

EPOCHS_PER_NIGHT = 6
FEATURE_DIM = 16

MODEL_CFG = {
    '_target_': 'wav2sleep.models.wav2sleep.Wav2Sleep',
    'num_classes': 4,
    'signal_encoders': {
        '_target_': 'wav2sleep.models.wav2sleep.SignalEncoders',
        'signal_map': {'ECG': 'ECG', 'THX': 'THX'},
        'feature_dim': FEATURE_DIM,
        'activation': 'gelu',
        'norm': 'instance',
        'causal': False,
        'chunk_causal': False,
        'initial_channels': 4,
        'max_channels': 8,
        'output_norm': False,
        'use_residual': True,
    },
    'epoch_mixer': {
        '_target_': 'wav2sleep.models.wav2sleep.MultiModalAttentionEmbedder',
        'feature_dim': FEATURE_DIM,
        'dropout': 0.0,
        'activation': 'gelu',
        'layers': 1,
        'dim_ff': 32,
        'nhead': 4,
    },
    'sequence_mixer': {
        '_target_': 'wav2sleep.models.wav2sleep.SequenceCNN',
        'feature_dim': FEATURE_DIM,
        'dropout': 0.0,
        'activation': 'gelu',
        'norm': 'layer',
        'causal': False,
        'num_layers': 1,
        'kernel_size': 3,
        'num_dilations': 2,
    },
}


def write_corpus(root, datasets=('mesa', 'shhs'), nights_per_split=4):
    """Class-separable synthetic nights: stage k has a distinctive amplitude."""
    rng = np.random.default_rng(0)
    for ds in datasets:
        for split in ('train', 'val', 'test'):
            folder = root / ds / split
            folder.mkdir(parents=True)
            for n in range(nights_per_split):
                labels = rng.integers(0, 4, size=EPOCHS_PER_NIGHT)
                ecg = np.concatenate(
                    [
                        (lab + 1.0) * np.sin(np.arange(1024) / 3.0) + 0.05 * rng.normal(size=1024)
                        for lab in labels
                    ]
                ).astype(np.float32)
                thx = np.concatenate(
                    [np.full(256, float(lab)) + 0.05 * rng.normal(size=256) for lab in labels]
                ).astype(np.float32)
                total = 1024 * EPOCHS_PER_NIGHT
                stage = np.full(total, np.nan, dtype=np.float32)
                stage[:EPOCHS_PER_NIGHT] = labels
                thx_col = np.full(total, np.nan, dtype=np.float32)
                thx_col[: len(thx)] = thx
                pd.DataFrame({'ECG': ecg, 'THX': thx_col, 'Stage': stage}).to_parquet(
                    folder / f'{ds}-night{n}.parquet'
                )
    # An .issues night that must be excluded.
    bad = root / datasets[0] / 'train' / 'bad.issues.parquet'
    pd.DataFrame({'ECG': np.zeros(1024, np.float32)}).to_parquet(bad)


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp('corpus')
    write_corpus(root)
    return root


def make_trainer(corpus, log_dir, **kw):
    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG', 'THX': 'THX'}),
            feature_dim=FEATURE_DIM,
            activation='gelu',
            norm='instance',
            chunk_causal=False,
            initial_channels=4,
            max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=FEATURE_DIM, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(
            feature_dim=FEATURE_DIM, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0
        ),
        num_classes=4,
    )
    dm = SleepDataModule(
        columns=['ECG', 'THX'],
        data_location=str(corpus),
        train_datasets=['mesa', 'shhs'],
        val_datasets=['mesa', 'shhs'],
        test_datasets=['mesa'],
        test=True,
        batch_size=4,
        val_batch_size=4,
        test_batch_size=4,
        num_workers=1,
        pad_to_epochs=EPOCHS_PER_NIGHT,
        max_length_hours=1,
    )
    defaults = dict(
        model=model,
        datamodule=dm,
        num_classes=4,
        epochs=2,
        lr=3e-3,
        warmup_steps=5,
        tau=1000.0,
        masker=SignalMasker({'ECG': 0.3, 'THX': 0.3}, backups=['ECG']),
        log_dir=str(log_dir),
        seed=0,
    )
    defaults.update(kw)
    return Trainer(**defaults)


def test_datamodule_structure(corpus):
    dm = SleepDataModule(
        columns=['ECG', 'THX'],
        data_location=str(corpus),
        train_datasets=['mesa', 'shhs'],
        val_datasets=['mesa', 'shhs'],
        test_datasets=['mesa'],
        test=True,
        batch_size=4,
        pad_to_epochs=EPOCHS_PER_NIGHT,
        max_length_hours=1,
        num_workers=1,
    )
    assert dm.num_train_nights == 8  # .issues excluded
    loaders = dm.val_loaders()
    assert [name for name, _ in loaders] == ['all', 'mesa', 'shhs']
    x, y = next(iter(dm.train_loader(0)))
    assert x['ECG'].shape == (4, 1024 * EPOCHS_PER_NIGHT)
    assert y.shape == (4, EPOCHS_PER_NIGHT)


def test_fit_learns_and_exports(corpus, tmp_path, ref_models):
    torch = pytest.importorskip('torch')
    trainer = make_trainer(corpus, tmp_path / 'run', epochs=4)
    final = trainer.fit()
    assert 'val_loss' in final and np.isfinite(final['val_loss'])
    # Eval matrix produced per-dataset and subset metrics.
    assert 'val_loss_mesa' in final
    assert 'val_ECG_loss_mesa' in final  # subset eval on mesa
    assert 'val_ECG_THX_loss_shhs' in final
    # The separable toy corpus should be learnable well below chance.
    assert final['val_loss'] < 1.3

    # Test-mode eval matrix.
    test_metrics = trainer.evaluate('test')
    assert 'test_loss_mesa' in test_metrics

    # Export deployable folder -> loadable by our api AND by torch.
    out = str(tmp_path / 'export')
    trainer.export(out, MODEL_CFG)
    from wav2sleep_tpu import api

    model = api.load_model(out)
    assert model.valid_signals == ['ECG', 'THX']

    sd = torch.load(os.path.join(out, 'state_dict.pth'), weights_only=True)
    tmodel = ref_models.Wav2Sleep(
        signal_encoders=ref_models.SignalEncoders(
            **{k: v for k, v in MODEL_CFG['signal_encoders'].items() if k != '_target_'}
        ),
        epoch_mixer=ref_models.MultiModalAttentionEmbedder(
            **{k: v for k, v in MODEL_CFG['epoch_mixer'].items() if k != '_target_'}
        ),
        sequence_mixer=ref_models.SequenceCNN(
            **{k: v for k, v in MODEL_CFG['sequence_mixer'].items() if k != '_target_'}
        ),
        num_classes=4,
    )
    tmodel.load_state_dict(sd)  # strict


def test_checkpoint_resume(corpus, tmp_path):
    log_dir = tmp_path / 'run_resume'
    t1 = make_trainer(corpus, log_dir, epochs=1)
    t1.fit()
    step_after_1 = int(t1.state.step)
    assert os.path.isdir(log_dir / 'checkpoints' / 'last')
    assert os.path.isdir(log_dir / 'checkpoints' / 'best')

    t2 = make_trainer(corpus, log_dir, epochs=2)
    t2.fit(resume_from='last')
    assert int(t2.state.step) > step_after_1  # continued, not restarted
    # Optimizer schedule count resumed (step carried in opt state).


def test_early_stopping(corpus, tmp_path):
    trainer = make_trainer(corpus, tmp_path / 'run_es', epochs=50, early_stopping_patience=1, lr=0.0)
    trainer.fit()
    # With lr=0 val loss never improves after first epoch: stops early.
    assert trainer.current_epoch < 49


def test_trainer_predict(corpus, tmp_path):
    trainer = make_trainer(corpus, tmp_path / 'run_pred', epochs=1)
    trainer.fit()
    loaders = trainer.datamodule.test_loaders()
    name, loader = loaders[0]
    out = trainer.predict(loader)
    assert set(out) >= {'labels', 'preds', 'preds_ECG', 'preds_ECG_THX'}
    assert out['preds'].shape == out['labels'].shape
    assert out['preds_ECG'].shape == out['preds'].shape


def test_train_cli_multirun(corpus, tmp_path, monkeypatch, caplog):
    """scripts/train.py end-to-end through run(): a -m sweep of two LRs on
    the synthetic corpus, each run exporting a deployable checkpoint."""
    import importlib.util
    import logging

    repo = os.path.join(os.path.dirname(__file__), '..', '..')
    spec = importlib.util.spec_from_file_location('train_cli', os.path.join(repo, 'scripts', 'train.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setenv('WAV2SLEEP_DATA', str(corpus))
    monkeypatch.setenv('WAV2SLEEP_STORAGE', str(tmp_path))
    caplog.set_level(logging.INFO, logger='train')
    results = mod.run([
        '-m',
        'name=cli_sweep',
        'datasets=mesa',
        'inputs=cardiorespiratory/ecg',
        'feature_dim=16',
        'max_length_hours=0.05',
        'pad_to_epochs=6',
        'batch_size=2',
        'target_batch_size=2',
        'training.val_batch_size=2',
        'epochs=1',
        'num_cpus=0',
        'num_devices=1',
        'restore_best=false',
        'training.optimizer.lr=1e-3,5e-4',
    ])
    assert len(results) == 2
    run_dirs = [
        os.path.join(root, 'model')
        for root, dirs, _ in os.walk(os.path.join(str(tmp_path), 'logs'))
        if 'model' in dirs
    ]
    assert len(run_dirs) == 2
    for d in run_dirs:
        assert os.path.exists(os.path.join(d, 'config.yaml'))
    # Wall-time line per run (reference hydra TimerCallback role).
    assert sum('Job wall time' in r.message for r in caplog.records) == 2


def test_eval_matrix_one_pass(corpus, tmp_path, monkeypatch):
    """Each eval epoch reads every night once per loader (no per-subset
    reloads) and subset metrics equal a per-subset re-run of the loader."""
    import wav2sleep_tpu.data.dataset as dsmod
    from wav2sleep_tpu.settings import ECG, THX

    trainer = make_trainer(corpus, tmp_path / 'run_eval1pass', epochs=1)
    trainer._ensure_state(next(iter(trainer.datamodule.train_loader(0))))

    reads: list[str] = []
    orig_read = dsmod.try_read_parquet

    def counting_read(fp, *a, **kw):
        reads.append(fp)
        return orig_read(fp, *a, **kw)

    monkeypatch.setattr(dsmod, 'try_read_parquet', counting_read)
    metrics = trainer.evaluate('val', epoch=0)
    # Corpus: mesa+shhs x 4 val nights. Combined loader reads 8; each
    # per-dataset loader reads its 4 nights ONCE despite evaluating the
    # (ECG,) and (ECG, THX) subsets on the same batches.
    assert len(reads) == 8 + 4 + 4, reads
    assert 'val_ECG_loss_mesa' in metrics and 'val_ECG_THX_loss_shhs' in metrics

    # Equivalence with the one-subset-per-pass protocol.
    for ds_name in ('mesa', 'shhs'):
        for subset in ((ECG,), (ECG, THX)):
            loader = dict(trainer.datamodule.val_loaders())[ds_name]
            losses = []
            for x, y in loader:
                present = {k: np.full((y.shape[0],), k in subset, bool) for k in x}
                out = trainer._jit_eval(
                    trainer._eval_params(), trainer.state.batch_stats, (x, y), present
                )
                losses.append(float(out['loss']))
            key = f'val_{"_".join(subset)}_loss_{ds_name}'
            assert np.isclose(metrics[key], np.mean(losses), rtol=0, atol=1e-7)


def test_eval_fetch_every_is_metric_invariant(corpus, tmp_path):
    """The deferred eval drain (eval_fetch_every > 1) is a scheduling
    change only: every metric must equal the round-3 per-batch-fetch
    protocol bit-for-bit (drain order never reorders the cmat += / loss
    accumulation)."""
    trainer = make_trainer(corpus, tmp_path / 'run_evaldrain', epochs=1)
    trainer._ensure_state(next(iter(trainer.datamodule.train_loader(0))))

    trainer.eval_fetch_every = 1
    per_batch = trainer.evaluate('val', epoch=0)
    trainer.eval_fetch_every = 16
    deferred = trainer.evaluate('val', epoch=0)

    assert per_batch.keys() == deferred.keys()
    for k in per_batch:
        a, b = per_batch[k], deferred[k]
        assert np.array_equal(np.asarray(a), np.asarray(b)), k


def test_eval_releases_staging_ring(corpus, tmp_path):
    """Under eval_transport the eval loop stages batches through the pooled
    device ring; after evaluate() returns every ring slot must be released,
    or the last stage_ring eval batches stay pinned in HBM through
    checkpointing and the whole next train epoch (~4 x full-batch HBM on
    the EOG geometry)."""
    trainer = make_trainer(corpus, tmp_path / 'run_evalring', epochs=1)
    trainer._ensure_state(next(iter(trainer.datamodule.train_loader(0))))
    trainer.eval_transport = 'q16'
    trainer.evaluate('val', epoch=0)
    assert all(d is None for d in getattr(trainer, '_ring_inflight', []))


def test_set_lr_scale_is_functional(corpus, tmp_path):
    """Plateau LR rescale rebuilds the optimizer state functionally and the
    scale survives a checkpoint round-trip."""
    import jax.numpy as jnp
    import optax

    from wav2sleep_tpu.train.checkpointing import CheckpointManager
    from wav2sleep_tpu.train.loop import _set_lr_scale

    def get_scale(opt_state):
        found = []

        inject_types = (optax.InjectHyperparamsState, optax.InjectStatefulHyperparamsState)

        def walk(node):
            if isinstance(node, inject_types):
                found.append(float(node.hyperparams['lr_scale']))
            elif isinstance(node, (tuple, list)):
                for o in node:
                    walk(o)

        walk(opt_state)
        assert len(found) == 1
        return found[0]

    t1 = make_trainer(corpus, tmp_path / 'plateau_run', epochs=1, scheduler='plateau')
    t1.fit()
    old_opt_state = t1.state.opt_state
    t1.state = _set_lr_scale(t1.state, 0.25)
    assert get_scale(t1.state.opt_state) == 0.25
    assert get_scale(old_opt_state) == 1.0  # no in-place mutation
    # A train step still runs with the rebuilt state.
    x, y = next(iter(t1.datamodule.train_loader(1)))
    state, m = t1._jit_train(t1.state, (x, y), jnp.asarray(t1.rng))
    assert np.isfinite(float(m['loss']))
    t1.state = state

    ckpt = CheckpointManager(os.path.join(t1.log_dir, 'checkpoints'))
    ckpt.save(t1, epoch=1, val_loss=1.0, is_best=False)
    t2 = make_trainer(corpus, tmp_path / 'plateau_run', epochs=2, scheduler='plateau')
    t2.restore('last')
    assert get_scale(t2.state.opt_state) == 0.25


def test_lr_value_logged_to_metrics(corpus, tmp_path):
    """metrics.jsonl carries the actual LR value (the reference LRMonitor
    role, scripts/config/training/callbacks/lr_monitor.yaml) plus the
    host-loader fraction, and under the plateau scheduler the logged LR
    reflects the controller's scale reductions."""
    import json as _json

    t = make_trainer(corpus, tmp_path / 'lr_run', epochs=2, scheduler='plateau')
    t.fit()
    rows = [
        _json.loads(line)
        for line in open(os.path.join(t.log_dir, 'metrics.jsonl'))
    ]
    train_rows = [r for r in rows if 'lr' in r]
    assert len(train_rows) == 2
    for r in train_rows:
        assert r['lr'] == pytest.approx(3e-3)  # scale 1.0 while improving
        assert 0.0 <= r['host_loader_frac'] <= 1.0
    # Force the controller past patience: the next logged LR must drop.
    for _ in range(t.plateau.patience + 1):
        t.plateau.update(1e9)
    assert t.current_lr() == pytest.approx(3e-3 * t.plateau.factor)

    # expdecay: host-side recomputation matches the optax schedule at the
    # applied-step count, in both the warmup and the decay regime.
    from wav2sleep_tpu.train.scheduler import exp_warmup_schedule

    t2 = make_trainer(corpus, tmp_path / 'lr_run2', epochs=1, warmup_steps=1, tau=10.0)
    t2.fit()
    applied = int(t2.state.step)
    assert applied > t2.warmup_steps  # past warmup -> decay regime
    sched = exp_warmup_schedule(t2.lr, t2.warmup_steps, t2.tau)
    assert t2.current_lr() == pytest.approx(float(sched(applied - 1)), rel=1e-6)
    t2.warmup_steps = applied + 50  # warmup regime re-check, same state
    assert t2.current_lr() == pytest.approx(t2.lr * applied / (applied + 50), rel=1e-6)


def test_ema_offload_matches_in_graph(corpus, tmp_path):
    """CPU-offloaded EMA (reference EMACallback offload_to_cpu role) produces
    the same averaged weights as the in-graph EMA, and survives a checkpoint
    round-trip."""
    import jax

    kw = dict(epochs=1, ema_decay=0.9, ema_start_step=0, masker=None, flip_polarity=False)
    t_graph = make_trainer(corpus, tmp_path / 'ema_graph', **kw)
    t_graph.fit()
    t_off = make_trainer(corpus, tmp_path / 'ema_off', ema_offload=True, **kw)
    t_off.fit()
    assert t_off.state.ema_params is None and t_off._host_ema is not None
    graph_ema = jax.device_get(t_graph.state.ema_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5),
        graph_ema,
        t_off._host_ema,
    )
    # Round-trip: a fresh trainer restores the offloaded EMA for eval.
    t2 = make_trainer(corpus, tmp_path / 'ema_off', ema_offload=True, **kw)
    t2.restore('last')
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=0, rtol=0),
        t2._host_ema,
        t_off._host_ema,
    )


def test_ema_offload_defers_the_fold(corpus, tmp_path, monkeypatch):
    """The host-EMA fold must ride the deferred metric drain, not block on
    every dispatched step: a per-step device_get would pin the staging
    pipeline to one transfer in flight, making the metric_fetch_every /
    stage_ring knobs inert (the regression this test pins was exactly
    that). With 2 steps/epoch and the fetch interval past epoch length,
    both steps' snapshots must be pending when the drain fires."""
    from wav2sleep_tpu.train.loop import Trainer

    seen = []
    orig = Trainer._drain_host_ema

    def spy(self):
        seen.append(len(self._ema_pending))
        orig(self)

    monkeypatch.setattr(Trainer, '_drain_host_ema', spy)
    t = make_trainer(
        corpus, tmp_path / 'ema_defer', epochs=1, ema_decay=0.9, ema_start_step=0,
        ema_offload=True, masker=None, flip_polarity=False,
    )
    t.fit()
    assert t._host_ema is not None and not t._ema_pending
    assert max(seen) >= 2, f'EMA fold drained per-step (pending lengths {seen})'


def test_restore_without_metadata_seeds_ema(corpus, tmp_path, monkeypatch, caplog):
    """Metadata-unavailable restore path: a checkpoint saved WITHOUT
    ema_offload, restored into an ema_offload trainer when orbax item
    metadata cannot be read, must fall back to the no-host_ema retry and
    seed the offloaded EMA from the restored params (not crash, and not
    mask the error)."""
    import logging

    from wav2sleep_tpu.train.checkpointing import CheckpointManager

    kw = dict(epochs=1, masker=None, flip_polarity=False)
    t1 = make_trainer(corpus, tmp_path / 'no_ema', **kw)  # no EMA: no host_ema entry
    t1.fit()

    monkeypatch.setattr(CheckpointManager, '_saved_keys', lambda self, path: None)
    t2 = make_trainer(
        corpus, tmp_path / 'no_ema', ema_decay=0.9, ema_start_step=0, ema_offload=True, **kw
    )
    with caplog.at_level(logging.WARNING):
        t2.restore('last')
    assert t2._host_ema is not None
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        t2._host_ema,
        jax.device_get(t2.state.params),
    )
    assert any('host_ema' in r.message for r in caplog.records)


def test_restore_without_metadata_drops_ema(corpus, tmp_path, monkeypatch, caplog):
    """The mirror metadata-unavailable path: a checkpoint saved WITH
    ema_offload (carries a host_ema entry), restored into a trainer that
    does not use one when orbax item metadata cannot be read, must fall
    back to the placeholder-and-drop retry instead of surfacing the
    tree-structure mismatch."""
    import logging

    from wav2sleep_tpu.train.checkpointing import CheckpointManager

    kw = dict(epochs=1, masker=None, flip_polarity=False)
    t1 = make_trainer(
        corpus, tmp_path / 'with_ema', ema_decay=0.9, ema_start_step=0, ema_offload=True, **kw
    )
    t1.fit()
    assert t1._host_ema is not None  # checkpoint carries a host_ema entry

    monkeypatch.setattr(CheckpointManager, '_saved_keys', lambda self, path: None)
    t2 = make_trainer(corpus, tmp_path / 'with_ema', **kw)  # no EMA offload
    with caplog.at_level(logging.WARNING):
        t2.restore('last')
    assert t2._host_ema is None
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        jax.device_get(t2.state.params),
        jax.device_get(t1.state.params),
    )
    assert any('ignored' in r.message for r in caplog.records)


def test_fit_bfloat16_precision(corpus, tmp_path):
    """Mixed-precision training (bf16 compute, host-cast bf16 batches) runs
    and produces finite losses and a usable confusion matrix."""
    trainer = make_trainer(corpus, tmp_path / 'bf16', epochs=1, precision='bfloat16')
    out = trainer.fit()
    assert np.isfinite(out['val_loss']), out


def test_fit_stops_on_non_finite_val_loss(corpus, tmp_path, monkeypatch, caplog):
    """A diverged run (NaN/inf val_loss) must stop instead of burning the
    full epoch budget (Lightning EarlyStopping check_finite role) — the old
    guard skipped early_stopping.update entirely on non-finite values, so
    the wait counter never advanced."""
    import logging

    t = make_trainer(corpus, tmp_path / 'nanrun', epochs=5, masker=None, flip_polarity=False)
    calls = {'n': 0}

    def nan_eval(mode='val', epoch=None):
        calls['n'] += 1
        return {'val_loss': float('nan')}

    monkeypatch.setattr(t, 'evaluate', nan_eval)
    with caplog.at_level(logging.WARNING):
        t.fit()
    assert calls['n'] == 1  # stopped after the first epoch, not 5
    assert any('non-finite val_loss' in r.message for r in caplog.records)


def test_destination_space_check_resumable(tmp_path):
    """The staging space check counts only the REMAINING bytes: a
    partially-staged copy both occupies destination space and shrinks what
    rsync still transfers, so requiring room for the full source would
    refuse to resume an interrupted stage. Also: the destination may not
    exist yet."""
    from wav2sleep_tpu.train.datamodule import _check_destination_space

    src = tmp_path / 'src'
    src.mkdir()
    (src / 'a.bin').write_bytes(b'x' * 10_000)
    # Destination does not exist: must not raise FileNotFoundError.
    _check_destination_space(str(src), str(tmp_path / 'dst_new' / 'data'))
    # Fully staged copy: remaining is 0 regardless of free space.
    dst = tmp_path / 'dst_done'
    dst.mkdir()
    (dst / 'a.bin').write_bytes(b'x' * 10_000)
    _check_destination_space(str(src), str(dst))


def test_fit_without_validation_trains_all_epochs(corpus, tmp_path, monkeypatch):
    """A run with NO validation data (evaluate() returns {}) is not a
    diverged run: fit() must train the full epoch budget with early
    stopping disabled, instead of misreading the absent val_loss as
    non-finite and stopping after epoch 0."""
    t = make_trainer(corpus, tmp_path / 'noval', epochs=3, masker=None, flip_polarity=False)
    trained = {'n': 0}
    orig = t.train_epoch

    def counting_train(epoch):
        trained['n'] += 1
        return orig(epoch)

    monkeypatch.setattr(t, 'train_epoch', counting_train)
    monkeypatch.setattr(t, 'evaluate', lambda mode='val', epoch=None: {})
    t.fit()
    assert trained['n'] == 3


def test_pad_batch_replicates_real_rows(corpus, tmp_path):
    """Partial-batch padding replicates real signal rows (ignore labels):
    zero rows would pollute per-batch statistics for batch-coupled
    normalization (norm='batch' trains with mutable batch_stats), shifting
    both that step's activations and the running stats evals use."""
    t = make_trainer(corpus, tmp_path / 'pad')
    B, L = 3, 16
    x = {'ECG': np.arange(B * L, dtype=np.float32).reshape(B, L)}
    y = np.zeros((B, 4), np.int32)
    xp, yp, real = t._pad_batch(x, y, 8)
    assert real == B and yp.shape[0] == 8 and xp['ECG'].shape[0] == 8
    # Padded rows cycle through the real rows — never all-zero rows.
    for i in range(B, 8):
        np.testing.assert_array_equal(xp['ECG'][i], x['ECG'][(i - B) % B])
    assert (yp[B:] == -1).all()
    assert (yp[:B] == 0).all()


def test_destination_space_ignores_stale_content(tmp_path):
    """Only bytes already staged at the SAME relative path count as
    progress: stale/unrelated destination content occupies space without
    reducing what rsync transfers, so crediting raw dst tree size would
    defeat the free-space guard."""
    from wav2sleep_tpu.train.datamodule import _staged_bytes

    src = tmp_path / 'src'
    (src / 'mesa').mkdir(parents=True)
    (src / 'mesa' / 'a.parquet').write_bytes(b'x' * 10_000)
    dst = tmp_path / 'dst'
    (dst / 'old_run').mkdir(parents=True)
    (dst / 'old_run' / 'junk.bin').write_bytes(b'y' * 50_000)  # unrelated
    assert _staged_bytes(str(src), str(dst)) == 0
    # A genuine partial stage at the matching path IS credited (capped at
    # the source size, so an over-long stale file can't over-credit).
    (dst / 'mesa').mkdir()
    (dst / 'mesa' / 'a.parquet').write_bytes(b'x' * 4_000)
    assert _staged_bytes(str(src), str(dst)) == 4_000
    (dst / 'mesa' / 'a.parquet').write_bytes(b'x' * 99_000)
    assert _staged_bytes(str(src), str(dst)) == 10_000


def test_ema_offload_matches_in_graph_under_accumulation(corpus, tmp_path):
    """The accumulation gating must agree between the two EMA paths: both
    fold once per APPLIED optimizer step (not per micro-step), so the
    offloaded and in-graph EMAs stay equal with accumulate_grad_batches>1."""
    import jax

    kw = dict(
        epochs=1, ema_decay=0.9, ema_start_step=0, masker=None,
        flip_polarity=False, accumulate_grad_batches=2,
    )
    t_graph = make_trainer(corpus, tmp_path / 'acc_graph', **kw)
    t_graph.fit()
    t_off = make_trainer(corpus, tmp_path / 'acc_off', ema_offload=True, **kw)
    t_off.fit()
    graph_ema = jax.device_get(t_graph.state.ema_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5),
        graph_ema,
        t_off._host_ema,
    )
    # And the EMA differs from the raw params only if a fold happened after
    # an applied step — with 2 applied steps and decay 0.9 it must differ.
    leaf = lambda tr: np.asarray(jax.tree_util.tree_leaves(tr)[0])
    assert not np.allclose(leaf(graph_ema), leaf(jax.device_get(t_graph.state.params)))


def test_shard_train_files_disjoint_equal_rotating():
    """Multi-host train sharding: disjoint equal-size shards from an
    identical global shuffle, rotating remainder nights across epochs."""
    from wav2sleep_tpu.train.datamodule import shard_train_files

    fps = [f'n{i}.parquet' for i in range(10)]
    shards = [shard_train_files(fps, seed=7, n_hosts=4, host=r) for r in range(4)]
    assert all(len(s) == 2 for s in shards)  # 10 -> truncate to 8, 2 each
    flat = [fp for s in shards for fp in s]
    assert len(set(flat)) == len(flat) == 8  # disjoint
    # Deterministic per (seed, host); different seed (epoch) reshuffles.
    assert shards[0] == shard_train_files(fps, seed=7, n_hosts=4, host=0)
    assert shards[0] != shard_train_files(fps, seed=8, n_hosts=4, host=0)
    import pytest

    with pytest.raises(ValueError, match='sharded over'):
        shard_train_files(fps[:3], seed=0, n_hosts=4, host=0)


def test_checkpoint_meta_holds_post_update_early_stopping(corpus, tmp_path, monkeypatch):
    """The checkpoint sidecar must serialize the early-stopping state AFTER
    this epoch's update: a stale pre-update best would let a later worse
    epoch overwrite the true best checkpoint on resume."""
    import json

    t = make_trainer(corpus, tmp_path / 'esorder', epochs=2, masker=None, flip_polarity=False)
    vals = iter([1.0, 0.5])
    monkeypatch.setattr(t, 'evaluate', lambda mode='val', epoch=None: {'val_loss': next(vals)})
    t.fit()
    meta = json.load(open(tmp_path / 'esorder' / 'checkpoints' / 'last.meta.json'))
    # After epoch 1 (val 0.5), the serialized best must be 0.5, not the
    # stale pre-update 1.0.
    assert meta['early_stopping']['best'] == 0.5


def test_restore_reconciles_in_graph_ema_toggle(corpus, tmp_path, caplog):
    """Toggling in-graph EMA between save and resume must reconcile (seed
    from params / drop with a warning), not crash with an opaque orbax
    structure error — symmetric with the host_ema reconciliation."""
    import logging

    import jax

    t = make_trainer(corpus, tmp_path / 'ema_on', epochs=1, ema_decay=0.9,
                     ema_start_step=0, masker=None, flip_polarity=False)
    t.fit()
    assert t.state.ema_params is not None
    # Resume WITHOUT EMA: weights restore, EMA dropped with a warning.
    t_off = make_trainer(corpus, tmp_path / 'ema_on', epochs=1, ema_decay=None,
                         masker=None, flip_polarity=False)
    with caplog.at_level(logging.WARNING):
        t_off.restore('last')
    assert t_off.state.ema_params is None
    assert any('EMA weights were ignored' in r.message for r in caplog.records)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t_off.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(t.state.params)[0]),
    )
    # And the reverse: a no-EMA checkpoint resumed into an EMA run seeds
    # the EMA from the restored params.
    t2 = make_trainer(corpus, tmp_path / 'ema_none', epochs=1, ema_decay=None,
                      masker=None, flip_polarity=False)
    t2.fit()
    t_on = make_trainer(corpus, tmp_path / 'ema_none', epochs=1, ema_decay=0.9,
                        ema_start_step=0, masker=None, flip_polarity=False)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        t_on.restore('last')
    assert t_on.state.ema_params is not None
    assert any('initialized the EMA' in r.message for r in caplog.records)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t_on.state.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(t_on.state.params)[0]),
    )
