"""mu-law int8 training input transport (ops/q8_transport.py +
native/src/mulaw8.cpp): encode/decode contract, native==numpy code
equality, the -inf missing-modality sentinel round-trip, and train-step
equivalence vs lossless inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2sleep_tpu.ops import q8_transport as q8


def _rows(rng, n=20_000):
    """Signal-like rows: baseline noise + sparse large spikes (ECG-like
    heavy tails are exactly what mu-law is for)."""
    base = rng.normal(scale=0.5, size=n)
    spikes = rng.random(n) < 0.01
    base[spikes] += rng.choice([-1, 1], spikes.sum()) * rng.uniform(4, 9, spikes.sum())
    return base.astype(np.float32)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = _rows(rng)
    codes, peak, present = q8.encode_row_numpy(x)
    assert present and peak > 0
    xhat = np.asarray(q8.dequant_q8(codes[None], np.float32([peak]), np.array([True])))[0]
    # Error is bounded by the local mu-law step at each sample's magnitude:
    # step(a) ~ (log256/127) * (a + peak/255). Decode levels are not interval
    # midpoints (geometric spacing), so one-sided error can exceed half the
    # step evaluated at |x| by a few percent — bound with 0.6*step.
    step = (np.log(256.0) / 127.0) * (np.abs(x) + peak / 255.0)
    assert np.all(np.abs(xhat - x) <= 0.6 * step + 1e-7)
    # Small amplitudes keep fine resolution (the point of companding).
    small = np.abs(x) < 0.1
    assert np.abs(xhat - x)[small].max() < 0.01 * peak


def test_native_matches_numpy_codes_exactly():
    from wav2sleep_tpu.native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, 'w2s_mulaw8_encode_f32'):
        pytest.skip('native library unavailable')
    import ctypes

    rng = np.random.default_rng(1)
    for trial in range(4):
        x = _rows(rng, n=5_000)
        np_codes, np_peak, np_present = q8.encode_row_numpy(x)
        c_codes = np.empty_like(np_codes)
        pk = ctypes.c_float()
        ok = lib.w2s_mulaw8_encode_f32(np.ascontiguousarray(x), x.size, c_codes, ctypes.byref(pk))
        assert bool(ok) == np_present
        assert pk.value == pytest.approx(float(np_peak), rel=0, abs=0)
        np.testing.assert_array_equal(c_codes, np_codes)


def test_encode_batch_missing_channel_roundtrip():
    rng = np.random.default_rng(2)
    x = {
        'ECG': np.stack([_rows(rng, 4096), np.full(4096, -np.inf, np.float32)]),
        'THX': np.stack([np.full(4096, np.inf, np.float32), _rows(rng, 4096)]),
    }
    enc = q8.encode_batch(x)
    assert q8.is_encoded_batch(enc)
    assert enc['ECG'][2].tolist() == [True, False]
    assert enc['THX'][2].tolist() == [False, True]
    dec = q8.dequant_batch({k: tuple(map(jnp.asarray, v)) for k, v in enc.items()})
    assert np.all(np.asarray(dec['ECG'])[1] == -np.inf)
    assert np.all(np.asarray(dec['THX'])[0] == -np.inf)
    assert np.isfinite(np.asarray(dec['ECG'])[0]).all()
    # Pooled-slot reuse: second call writes into the same buffers.
    slot = {}
    enc1 = q8.encode_batch(x, slot=slot)
    enc2 = q8.encode_batch(x, slot=slot)
    assert enc1['ECG'][0] is enc2['ECG'][0]


def test_train_step_q8_equivalent_to_lossless():
    """One jitted train step on q8-encoded inputs stays close to the same
    step on lossless inputs (same rng), and runs/updates params."""
    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.train.scheduler import exp_warmup_schedule
    from wav2sleep_tpu.train.step import init_train_state, make_optimizer, make_train_step

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG', 'THX': 'THX'}),
            feature_dim=16,
            activation='gelu',
            norm='instance',
            chunk_causal=False,
            initial_channels=4,
            max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(
            feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0
        ),
        num_classes=4,
    )
    rng = np.random.default_rng(3)
    B, S = 2, 4
    x = {
        'ECG': np.stack([_rows(rng, 1024 * S) for _ in range(B)]),
        'THX': np.stack([_rows(rng, 256 * S) for _ in range(B)]),
    }
    x['THX'][1] = -np.inf  # one missing channel flows through the transport
    y = rng.integers(0, 4, size=(B, S)).astype(np.float32)

    tx = make_optimizer(exp_warmup_schedule(1e-3, 10, 100))
    step = make_train_step(model, tx, num_classes=4, flip_polarity=True)
    state = init_train_state(model, tx, x, jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(7)

    _, m_ref = jax.jit(step)(state, (x, y), k)
    enc = q8.encode_batch(x)
    state_q8 = init_train_state(model, tx, enc, jax.random.PRNGKey(0))
    new_state, m_q8 = jax.jit(step)(state_q8, (enc, y), k)

    assert np.isfinite(float(m_q8['loss']))
    assert int(new_state.step) == 1
    # Same rng => same flips/masks; only input quantization differs.
    assert float(m_q8['loss']) == pytest.approx(float(m_ref['loss']), abs=0.05)
    assert np.asarray(m_q8['cmat']).sum() == np.asarray(m_ref['cmat']).sum()


def test_trainer_epoch_with_q8_transport(tmp_path):
    """Trainer.train_epoch end-to-end with input_transport='q8' on the
    synthetic corpus: runs, logs finite loss, pools encode slots."""
    from test_trainer_smoke import make_trainer, write_corpus

    root = tmp_path / 'corpus'
    write_corpus(root, nights_per_split=2)
    trainer = make_trainer(root, str(tmp_path / 'run'), epochs=1, input_transport='q8')
    out = trainer.train_epoch(0)
    assert np.isfinite(out['train_loss'])
    # Pooled staging ring in use (stage_ring slots, transfer-guarded reuse).
    assert trainer._ring_pool is not None
    assert len(trainer._ring_pool) == max(2, trainer.stage_ring)
    assert any(slot for slot in trainer._ring_pool)  # encode slots populated
    val = trainer.evaluate('val', 0)  # eval path stays lossless
    assert np.isfinite(val['val_loss'])


def test_mixed_finite_row_rejected():
    """A row mixing finite data with non-finite samples must raise in BOTH
    encoders: a per-sample -inf sentinel cannot survive the 1-byte code
    (it would decode as +/-peak — confident garbage instead of padding)."""
    rng = np.random.default_rng(5)
    x = _rows(rng, n=4096)
    x[1000:] = -np.inf
    with pytest.raises(ValueError, match='mixes finite'):
        q8.encode_row_numpy(x)
    from wav2sleep_tpu.native import get_lib

    if get_lib() is not None:
        with pytest.raises(ValueError, match='mixes finite'):
            q8.encode_batch({'ECG': x[None]})
    # Whole-row non-finite stays a valid missing channel.
    codes, peak, present = q8.encode_row_numpy(np.full(4096, -np.inf, np.float32))
    assert not present and peak == 0.0 and (codes == 0).all()


def test_q16_roundtrip_error_bound():
    """Linear int16 codes reconstruct within half a quantization step
    (peak/32767/2) everywhere — ~40x tighter than bf16 at full scale and
    with no mu-law coarsening of large amplitudes."""
    rng = np.random.default_rng(6)
    x = {'ECG': np.stack([_rows(rng, 8192) for _ in range(3)])}
    enc = q8.encode_batch_q16(x)
    codes, peaks, present = enc['ECG']
    assert codes.dtype == np.int16 and present.all()
    assert np.abs(codes).max() <= 32767
    dec = np.asarray(q8.dequant_q16(*(jnp.asarray(v) for v in enc['ECG'])))
    step = peaks[:, None] / 32767.0
    assert np.all(np.abs(dec - x['ECG']) <= 0.5 * step + 1e-7)
    # The peak sample itself is exact (codes clip at +/-32767, never wrap).
    for b in range(3):
        i = np.abs(x['ECG'][b]).argmax()
        assert dec[b, i] == pytest.approx(x['ECG'][b, i], rel=1e-6)


def test_q16_sentinel_mixed_and_slot_pooling():
    rng = np.random.default_rng(7)
    x = {'THX': np.stack([_rows(rng, 2048), np.full(2048, np.inf, np.float32)])}
    slot = {}
    enc = q8.encode_batch_q16(x, slot=slot)
    assert q8.is_encoded_batch(enc)
    assert enc['THX'][2].tolist() == [True, False]
    assert (enc['THX'][0][1] == 0).all() and enc['THX'][1][1] == 0.0
    dec = q8.dequant_batch({k: tuple(map(jnp.asarray, v)) for k, v in enc.items()})
    assert np.all(np.asarray(dec['THX'])[1] == -np.inf)
    assert np.isfinite(np.asarray(dec['THX'])[0]).all()
    enc2 = q8.encode_batch_q16(x, slot=slot)
    assert enc['THX'][0] is enc2['THX'][0]  # pooled buffers reused
    bad = x['THX'][:1].copy()
    bad[0, 100:200] = -np.inf
    with pytest.raises(ValueError, match='mixes finite'):
        q8.encode_batch_q16({'THX': bad})


def test_dequant_batch_dispatches_on_code_dtype():
    """One encoded batch may mix rungs per signal (int8 mu-law / int16
    linear); dequant_batch dispatches on the static code dtype."""
    rng = np.random.default_rng(8)
    x8 = np.stack([_rows(rng, 1024)])
    x16 = np.stack([_rows(rng, 1024)])
    enc = {**q8.encode_batch({'ECG': x8}), **q8.encode_batch_q16({'THX': x16})}
    dec = q8.dequant_batch({k: tuple(map(jnp.asarray, v)) for k, v in enc.items()})
    pk8 = float(enc['ECG'][1][0])
    step8 = (np.log(256.0) / 127.0) * (np.abs(x8[0]) + pk8 / 255.0)
    assert np.all(np.abs(np.asarray(dec['ECG'])[0] - x8[0]) <= 0.6 * step8 + 1e-7)
    assert np.abs(np.asarray(dec['THX'])[0] - x16[0]).max() <= float(enc['THX'][1][0]) / 32767.0


def test_evaluate_with_eval_transport(tmp_path):
    """The full eval matrix under eval_transport: q16 losses match the
    lossless pass to ~1e-3, q8 runs finite; both take the pooled
    transfer-guarded ring."""
    from test_trainer_smoke import make_trainer, write_corpus

    root = tmp_path / 'corpus'
    write_corpus(root, nights_per_split=2)
    trainer = make_trainer(root, str(tmp_path / 'run'), epochs=1)
    trainer._ensure_state(next(iter(trainer.datamodule.train_loader(0))))

    lossless = trainer.evaluate('val', 0)
    trainer.eval_transport = 'q16'
    q16 = trainer.evaluate('val', 0)
    trainer.eval_transport = 'q8'
    q8m = trainer.evaluate('val', 0)

    assert lossless.keys() == q16.keys() == q8m.keys()
    for k, v in lossless.items():
        assert q16[k] == pytest.approx(v, abs=2e-3), k
        assert np.isfinite(q8m[k]), k
    # Transport slots live namespaced inside the shared staging ring.
    assert any(('eval', 'q16') in slot for slot in trainer._ring_pool)

    with pytest.raises(ValueError, match='eval_transport'):
        make_trainer(root, str(tmp_path / 'run2'), eval_transport='bogus')


def test_shadow_eval_transport_logs_ab_series(tmp_path):
    """shadow_eval_transport='q16': each VAL epoch logs a val_loss_q16 row
    alongside the lossless val_loss it did NOT use for selection; the shadow
    value tracks the primary to ~1e-3 and the returned metrics are unchanged
    (selection semantics stay lossless)."""
    import json

    from test_trainer_smoke import make_trainer, write_corpus

    root = tmp_path / 'corpus'
    write_corpus(root, nights_per_split=2)
    trainer = make_trainer(root, str(tmp_path / 'run'), shadow_eval_transport='q16')
    trainer._ensure_state(next(iter(trainer.datamodule.train_loader(0))))
    out = trainer.evaluate('val', 0)
    assert 'val_loss_q16' not in out  # logged, never returned
    rows = [
        json.loads(line)
        for line in open(trainer.metrics_logger.fp)
    ]
    shadow = [r for r in rows if 'val_loss_q16' in r]
    assert len(shadow) == 1 and shadow[0]['step'] == 0
    assert shadow[0]['val_loss_q16'] == pytest.approx(out['val_loss'], abs=2e-3)
    assert shadow[0]['val_shadow_eval_seconds'] >= 0
    # test mode takes no shadow pass (selection only ever reads val).
    trainer.shadow_eval_transport = 'q8'
    trainer.evaluate('test', 0)
    rows = [json.loads(line) for line in open(trainer.metrics_logger.fp)]
    assert not any('test_loss_q8' in r for r in rows)

    with pytest.raises(ValueError, match='shadow_eval_transport'):
        make_trainer(root, str(tmp_path / 'run2'), shadow_eval_transport='bogus')
