"""Trainer end-to-end on a multi-device mesh: fit + full eval matrix +
checkpoint save/restore on a 4-way data-parallel CPU mesh must reproduce the
single-device run (reference role: Lightning DDP runs the same train/val
loops on every rank, src/wav2sleep/trainer/main.py:188-224).

Round-1/2 lesson: untested distributed surfaces ship broken — the jitted
train step was mesh-tested but ``Trainer.fit``/``evaluate``/checkpointing
never ran under a mesh before this file.
"""

import numpy as np
import pytest

import jax

from wav2sleep_tpu.parallel.mesh import make_mesh

from tests.train.test_trainer_smoke import corpus, make_trainer  # noqa: F401

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.device_count() < 4, reason='needs the multi-device CPU mesh (conftest XLA_FLAGS)'
    ),
]


def _mesh4():
    return make_mesh(jax.devices()[:4], data=4, model=1)


def test_fit_on_mesh_matches_single_device(corpus, tmp_path):  # noqa: F811
    common = dict(epochs=2, masker=None, flip_polarity=False)
    single = make_trainer(corpus, tmp_path / 'single', **common)
    final_single = single.fit()

    meshed = make_trainer(corpus, tmp_path / 'mesh', mesh=_mesh4(), **common)
    final_mesh = meshed.fit()

    assert set(final_mesh) == set(final_single)
    # Same seeds, same batch order, same augmentation stream — the only
    # difference is the psum reduction order, so metrics agree to float
    # tolerance across the whole eval matrix (combined + per-dataset +
    # signal-subset entries).
    for key, v in final_single.items():
        np.testing.assert_allclose(
            final_mesh[key], v, rtol=2e-3, atol=2e-3, err_msg=f'metric {key} diverged on mesh'
        )
    assert 'val_ECG_loss_mesa' in final_mesh  # subset matrix ran under the mesh

    # Test-mode eval matrix on the mesh.
    test_metrics = meshed.evaluate('test')
    assert np.isfinite(test_metrics['test_loss_mesa'])

    # Prediction variants (full / ECG-only / ECG+THX) through the sharded
    # eval graph.
    _, loader = meshed.datamodule.test_loaders()[0]
    preds = meshed.predict(loader)
    assert preds['preds'].shape == preds['labels'].shape
    assert 'preds_ECG' in preds and 'preds_ECG_THX' in preds


def test_fit_on_mesh_q8_transport(corpus, tmp_path):  # noqa: F811
    """q8 input transport on a mesh: the encoded batch pytree
    ({signal: (int8 codes [B,T], f32 peaks [B], bool present [B])}) must
    shard over the data axis through the same prefix shardings as the plain
    batch, with the in-graph decode running per-shard."""
    common = dict(epochs=1, masker=None, flip_polarity=False)
    plain = make_trainer(corpus, tmp_path / 'plain', **common)
    final_plain = plain.fit()

    q8 = make_trainer(corpus, tmp_path / 'q8', mesh=_mesh4(), input_transport='q8', **common)
    final_q8 = q8.fit()

    assert set(final_q8) == set(final_plain)
    assert np.isfinite(final_q8['val_loss'])
    # q8 quantizes the INPUTS only (~0.4% of sample magnitude); on the
    # separable toy corpus the training trajectory stays close to lossless.
    np.testing.assert_allclose(final_q8['val_loss'], final_plain['val_loss'], rtol=0.15)


def test_eval_transport_on_mesh(corpus, tmp_path):  # noqa: F811
    """eval_transport on a mesh: the encoded eval batch (int16/int8 codes
    [B,T] + per-row peaks/present) rides the same data-axis prefix
    shardings as the lossless batch; q16 metrics match lossless ~1e-3."""
    meshed = make_trainer(
        corpus, tmp_path / 'mesh', mesh=_mesh4(), epochs=1, masker=None, flip_polarity=False
    )
    meshed._ensure_state(next(iter(meshed.datamodule.train_loader(0))))
    lossless = meshed.evaluate('val', epoch=0)
    meshed.eval_transport = 'q16'
    q16 = meshed.evaluate('val', epoch=0)
    meshed.eval_transport = 'q8'
    q8m = meshed.evaluate('val', epoch=0)
    assert lossless.keys() == q16.keys() == q8m.keys()
    for k, v in lossless.items():
        assert q16[k] == pytest.approx(v, abs=2e-3), k
        assert np.isfinite(q8m[k]), k


def test_checkpoint_roundtrip_on_mesh(corpus, tmp_path):  # noqa: F811
    run = tmp_path / 'run'
    t1 = make_trainer(corpus, run, epochs=1, mesh=_mesh4(), masker=None, flip_polarity=False)
    t1.fit()
    step_before = int(t1.state.step)
    assert step_before > 0

    t2 = make_trainer(corpus, run, epochs=2, mesh=_mesh4(), masker=None, flip_polarity=False)
    start_epoch = t2.restore('last')
    assert start_epoch == 1
    assert int(t2.state.step) == step_before
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params), jax.tree_util.tree_leaves(t2.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Restored state must drive the sharded eval + further training.
    metrics = t2.evaluate('val', epoch=1)
    assert np.isfinite(metrics['val_loss'])
    t2.fit(resume_from='last')
    assert int(t2.state.step) > step_before


def test_partial_batches_padded_on_mesh(tmp_path):
    """Night counts that don't divide the batch size must not crash mesh
    placement: partial final batches are padded to one compiled shape with
    ignore rows (zero signals, labels -1 — skipped by both the loss and the
    confusion matrix), so the mesh run still matches single-device. The
    pre-fix behavior was a NamedSharding ValueError at the first partial
    batch ('axis 0 is partitioned 4 ways, but dimension size is 2')."""
    from tests.train.test_trainer_smoke import write_corpus

    root = tmp_path / 'corpus3'
    write_corpus(root, nights_per_split=3)  # 6 train / 3+3 val nights, batch 4
    common = dict(epochs=1, masker=None, flip_polarity=False)
    single = make_trainer(root, tmp_path / 'single', **common)
    final_single = single.fit()
    meshed = make_trainer(root, tmp_path / 'mesh', mesh=_mesh4(), **common)
    final_mesh = meshed.fit()
    assert set(final_mesh) == set(final_single)
    for key, v in final_single.items():
        np.testing.assert_allclose(final_mesh[key], v, rtol=2e-3, atol=2e-3, err_msg=key)
    # predict() pads to the data axis and trims back to the real rows.
    _, loader = meshed.datamodule.test_loaders()[0]
    preds = meshed.predict(loader)
    assert preds['preds'].shape == preds['labels'].shape
