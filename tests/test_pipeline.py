"""Streaming pipeline correctness: hypnograms must match the api path."""

import datetime

import numpy as np
import pytest

from wav2sleep_tpu.data.edf import write_edf
from wav2sleep_tpu.data.preprocessing import resample_signal, resample_uniform
from wav2sleep_tpu.pipeline import NightDecoder, StreamingPipeline
from wav2sleep_tpu.settings import COLS_TO_SAMPLES_PER_EPOCH


def test_resample_uniform_matches_general():
    rng = np.random.default_rng(0)
    fs = 125.0
    n = int(fs * 120)
    vals = rng.normal(size=n)
    t = np.arange(n) / fs
    fast = resample_uniform(vals.astype(np.float32), fs, 'ABD', max_length_hours=1 / 30)
    slow = resample_signal(t, vals, 'ABD', max_length_hours=1 / 30)
    np.testing.assert_allclose(fast, slow, atol=1e-5)


def test_night_decoder_matches_reference_path(tmp_path):
    rng = np.random.default_rng(1)
    n_sec = 10 * 60
    ecg = np.sin(np.arange(125 * n_sec) / 17) * 900
    fp = str(tmp_path / 'n.edf')
    write_edf(
        fp,
        {'EKG': ecg},
        {'EKG': 125.0},
        units={'EKG': 'uV'},
        physical_ranges={'EKG': (-1000, 1000)},
        start=datetime.datetime(2001, 1, 1, 23, 0, 0),
    )
    hours = n_sec / 3600
    dec = NightDecoder(['ECG', 'THX'], max_length_hours=hours)
    S = int(hours * 120)
    out = {c: np.empty(COLS_TO_SAMPLES_PER_EPOCH[c] * S, np.float32) for c in ('ECG', 'THX')}
    n_epochs = dec.decode_into(fp, out)
    assert n_epochs == S  # whole-epoch count from the EDF header
    assert np.isinf(out['THX']).all()
    # Cross-check against the api/pandas path.
    from wav2sleep_tpu.data.edf import load_edf_data
    from wav2sleep_tpu.data.preprocessing import process_waveform_dataframe

    df, _ = load_edf_data(fp, columns=['ECG'])
    ref = process_waveform_dataframe(df, ['ECG'], max_length_hours=hours)['ECG'].to_numpy()
    np.testing.assert_allclose(out['ECG'], ref, atol=2e-4)


def test_streaming_pipeline_end_to_end(tmp_path):
    import jax

    from wav2sleep_tpu import models as jm

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG'}),
            feature_dim=16,
            activation='gelu',
            norm='instance',
            chunk_causal=False,
            initial_channels=4,
            max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    hours = 6 / 120  # 6 epochs
    fps = []
    rng = np.random.default_rng(2)
    for i in range(3):
        n = int(1024 / 30 * hours * 3600)
        fp = str(tmp_path / f'{i}.edf')
        write_edf(
            fp,
            {'ECG': rng.normal(size=int(1024 / 30 * 30) * 6) * 0.5},
            {'ECG': 1024 / 30},
            physical_ranges={'ECG': (-3, 3)},
            record_duration=30.0,
        )
        fps.append(fp)
    x0 = {'ECG': np.zeros((1, 1024 * 6), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), x0)
    pipe = StreamingPipeline(model, variables, ['ECG'], batch_size=2, max_length_hours=hours, precision='float32')
    results = dict(pipe.run(fps))
    assert set(results) == set(fps)
    for hyp in results.values():
        assert hyp.shape == (6,)
        assert set(np.unique(hyp)) <= {0, 1, 2, 3}


def test_raw_int16_pipeline_matches_f32(tmp_path):
    """Raw-int16 on-device decode must produce the same hypnograms as the
    host-decoded f32 path."""
    import jax

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.pipeline import StreamingPipelineRaw

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG', 'THX': 'THX'}),
            feature_dim=16, activation='gelu', norm='instance', chunk_causal=False,
            initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    hours = 6 / 120
    rng = np.random.default_rng(3)
    fps = []
    for i in range(3):
        sigs = {'ECG': rng.normal(size=int(1024 / 30 * 30) * 6) * 0.5}
        if i != 1:  # file 1 misses THX -> present mask exercised
            sigs['THOR RES'] = rng.normal(size=int(256 / 30 * 30) * 6) * 0.4
        fp = str(tmp_path / f'{i}.edf')
        write_edf(
            fp, sigs,
            {k: (1024 if k == 'ECG' else 256) / 30 for k in sigs},
            physical_ranges={k: (-3, 3) for k in sigs},
            record_duration=30.0,
        )
        fps.append(fp)
    x0 = {'ECG': np.zeros((1, 1024 * 6), np.float32), 'THX': np.zeros((1, 256 * 6), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), x0)

    raw_pipe = StreamingPipelineRaw(model, variables, ['ECG', 'THX'], batch_size=2,
                                    max_length_hours=hours, precision='float32')
    out_raw = dict(raw_pipe.run(fps))
    f32_pipe = StreamingPipeline(model, variables, ['ECG', 'THX'], batch_size=2,
                                 max_length_hours=hours, precision='float32')
    out_f32 = dict(f32_pipe.run(fps))
    for fp in fps:
        agreement = (out_raw[fp] == out_f32[fp]).mean()
        assert agreement == 1.0, (fp, out_raw[fp], out_f32[fp])


def test_q16_pipeline_matches_f32(tmp_path):
    """Quantized-grid int16 transport (host fused resample in digital units,
    device affine+zscore) must produce the same hypnograms as the f32 path,
    including off-rate sources (real resampling) and a missing modality."""
    import jax

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.pipeline import (
        NightDecoder,
        Q16_META_DTYPE,
        Q16NightExtractor,
        StreamingPipeline,
        StreamingPipelineQ16,
    )

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG', 'THX': 'THX'}),
            feature_dim=16, activation='gelu', norm='instance', chunk_causal=False,
            initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    hours = 6 / 120
    rng = np.random.default_rng(5)
    fps = []
    for i in range(3):
        # 125/32 Hz: off model rates -> exercises true resampling.
        sigs = {'ECG': rng.normal(size=int(125 * 30) * 6) * 0.5}
        if i != 1:
            sigs['THOR RES'] = rng.normal(size=int(32 * 30) * 6) * 0.4
        fp = str(tmp_path / f'{i}.edf')
        write_edf(
            fp, sigs,
            {k: (125.0 if k == 'ECG' else 32.0) for k in sigs},
            physical_ranges={k: (-3, 3) for k in sigs},
            record_duration=30.0,
        )
        fps.append(fp)

    # Signal-level: dequantized q16 grid matches the host-decoded f32 grid to
    # sub-LSB accuracy.
    S = 6
    dec = NightDecoder(['ECG', 'THX'], max_length_hours=hours)
    ref = {c: np.empty(COLS_TO_SAMPLES_PER_EPOCH[c] * S, np.float32) for c in ('ECG', 'THX')}
    dec.decode_into(fps[0], ref)
    ext = Q16NightExtractor(['ECG', 'THX'], max_length_hours=hours)
    q = {c: np.zeros((1, COLS_TO_SAMPLES_PER_EPOCH[c] * S), np.int16) for c in ('ECG', 'THX')}
    meta = {c: np.zeros(1, dtype=Q16_META_DTYPE) for c in ('ECG', 'THX')}
    ext.extract_into(fps[0], q, meta, 0)
    for c in ('ECG', 'THX'):
        a, b, nv, n_pad, present = meta[c][0]
        assert present
        rec = q[c][0].astype(np.float32) * a + b
        rec[nv:] = 0.0
        np.testing.assert_allclose(rec, ref[c], atol=float(a) * 0.51 + 1e-7)

    x0 = {'ECG': np.zeros((1, 1024 * 6), np.float32), 'THX': np.zeros((1, 256 * 6), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), x0)
    q16_pipe = StreamingPipelineQ16(model, variables, ['ECG', 'THX'], batch_size=2,
                                    max_length_hours=hours, precision='float32')
    out_q16 = dict(q16_pipe.run(fps))
    f32_pipe = StreamingPipeline(model, variables, ['ECG', 'THX'], batch_size=2,
                                 max_length_hours=hours, precision='float32')
    out_f32 = dict(f32_pipe.run(fps))
    for fp in fps:
        agreement = (out_q16[fp] == out_f32[fp]).mean()
        assert agreement == 1.0, (fp, out_q16[fp], out_f32[fp])


def test_q8_pipeline_transport(tmp_path):
    """mu-law int8 transport: native kernel == python fallback exactly,
    reconstruction error ~1% rms, and end-to-end hypnograms agree with the
    f32 path except at near-tie logit margins (random-weights model on noise
    inputs is the worst case — a trained model's margins are far larger)."""
    import jax

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.pipeline import (
        MU_LAW,
        NightDecoder,
        Q8_META_DTYPE,
        Q8NightExtractor,
        StreamingPipeline,
        StreamingPipelineQ8,
    )

    hours = 6 / 120
    rng = np.random.default_rng(7)
    fps = []
    for i in range(3):
        sigs = {'ECG': np.sin(np.arange(int(125 * 30) * 6) / 9.0) * 0.8 + rng.normal(size=int(125 * 30) * 6) * 0.1}
        if i != 1:
            sigs['THOR RES'] = rng.normal(size=int(32 * 30) * 6) * 0.4
        fp = str(tmp_path / f'{i}.edf')
        write_edf(
            fp, sigs,
            {k: (125.0 if k == 'ECG' else 32.0) for k in sigs},
            physical_ranges={k: (-3, 3) for k in sigs},
            record_duration=30.0,
        )
        fps.append(fp)

    S = 6
    cols = ('ECG', 'THX')
    outs = {}
    for use_native in (True, False):
        ext = Q8NightExtractor(cols, max_length_hours=hours, use_native=use_native)
        q = {c: np.zeros((1, COLS_TO_SAMPLES_PER_EPOCH[c] * S), np.int8) for c in cols}
        meta = {c: np.zeros(1, dtype=Q8_META_DTYPE) for c in cols}
        ext.extract_into(fps[0], q, meta, 0)
        outs[use_native] = (q, meta)
    for c in cols:
        np.testing.assert_array_equal(outs[True][0][c], outs[False][0][c])
        assert outs[True][1][c][0] == outs[False][1][c][0]

    # Reconstruction error vs the host-decoded f32 grid.
    dec = NightDecoder(cols, max_length_hours=hours)
    ref = {c: np.empty(COLS_TO_SAMPLES_PER_EPOCH[c] * S, np.float32) for c in cols}
    dec.decode_into(fps[0], ref)
    q, meta = outs[True]
    for c in cols:
        a, b, vmax, nv, n_pad, present = meta[c][0]
        assert present
        qf = q[c][0].astype(np.float64)
        dig = np.sign(qf) * np.expm1(np.abs(qf) * np.log1p(MU_LAW) / 127.0) * vmax / MU_LAW
        rec = (dig * a + b).astype(np.float32)
        rec[nv:] = 0.0
        rms_err = np.sqrt(np.mean(np.square(rec - ref[c])))
        rms_sig = np.sqrt(np.mean(np.square(ref[c])))
        assert rms_err < 0.02 * max(rms_sig, 1e-9), (c, rms_err, rms_sig)

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG', 'THX': 'THX'}),
            feature_dim=16, activation='gelu', norm='instance', chunk_causal=False,
            initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    x0 = {'ECG': np.zeros((1, 1024 * 6), np.float32), 'THX': np.zeros((1, 256 * 6), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), x0)
    out_f32 = dict(StreamingPipeline(model, variables, list(cols), batch_size=2,
                                     max_length_hours=hours, precision='float32').run(fps))
    out_q8 = dict(StreamingPipelineQ8(model, variables, list(cols), batch_size=2,
                                      max_length_hours=hours, precision='float32').run(fps))
    agreement = np.concatenate([out_f32[fp] == out_q8[fp] for fp in fps]).mean()
    assert agreement >= 0.8, agreement


def test_q4_pipeline_transport(tmp_path):
    """Packed 4-bit block-DPCM rung: native/numpy host paths bit-identical,
    every reconstruction error is bounded by HALF THE BLOCK STEP (the
    independent-rint codec's per-sample guarantee) against the exact q16
    digital grid, the jitted device unpack+cumsum reproduces the host
    decode (logit parity vs the model applied to the host-reconstructed
    grid), and the streaming pipeline's batching/meta plumbing matches a
    direct single-batch launch bit-for-bit including a missing-modality
    row. Argmax agreement vs f32 is NOT asserted tightly: a random-init
    model's near-tie margins flip freely under any input noise; the
    decision-grade q4 quality number is measured on hardware by
    scripts/q8_quality.py."""
    import jax
    import jax.numpy as jnp

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.pipeline import (
        _EXP8_SCALE,
        NightDecoder,
        Q4_BLOCK,
        Q8_META_DTYPE,
        Q4NightExtractor,
        Q16_META_DTYPE,
        Q16NightExtractor,
        StreamingPipeline,
        StreamingPipelineQ4,
        _masked_zscore,
        make_streaming_forward_q4,
        q4_row_len,
    )

    hours = 6 / 120
    rng = np.random.default_rng(7)
    fps = []
    for i in range(3):
        sigs = {'ECG': np.sin(np.arange(int(125 * 30) * 6) / 9.0) * 0.8 + rng.normal(size=int(125 * 30) * 6) * 0.1}
        if i != 1:
            sigs['THOR RES'] = rng.normal(size=int(32 * 30) * 6) * 0.4
        fp = str(tmp_path / f'{i}.edf')
        write_edf(
            fp, sigs,
            {k: (125.0 if k == 'ECG' else 32.0) for k in sigs},
            physical_ranges={k: (-3, 3) for k in sigs},
            record_duration=30.0,
        )
        fps.append(fp)

    S = 6
    cols = ('ECG', 'THX')
    n_grid = {c: COLS_TO_SAMPLES_PER_EPOCH[c] * S for c in cols}
    outs = {}
    for use_native in (True, False):
        ext = Q4NightExtractor(cols, n_grid, max_length_hours=hours, use_native=use_native)
        q = {c: np.zeros((1, q4_row_len(n_grid[c])), np.uint8) for c in cols}
        meta = {c: np.zeros(1, dtype=Q8_META_DTYPE) for c in cols}
        ext.extract_into(fps[0], q, meta, 0)
        outs[use_native] = (q, meta)
    for c in cols:
        np.testing.assert_array_equal(outs[True][0][c], outs[False][0][c])
        assert outs[True][1][c][0] == outs[False][1][c][0]

    def decode_host(q_row, n, nv, a, b, f64=True):
        """Exact host decode of one q4 DPCM row (f64 anchors, matching the
        encoder; f64=False mirrors the device's f32 cumsum instead)."""
        mp = (n + 1) // 2
        packed = q_row[:mp].astype(np.int32)
        nib = np.stack([packed & 0xF, packed >> 4], axis=-1).reshape(-1)[:n]
        k = (1 - 2 * (nib >> 3)) * (nib & 7)
        s = _EXP8_SCALE[q_row[mp:]]
        step = np.repeat(s, Q4_BLOCK)[:n]
        dt = np.float64 if f64 else np.float32
        dig = np.cumsum((k * step).astype(dt), dtype=dt)
        rec = (dig * a + b).astype(np.float32)
        rec[nv:] = 0.0
        return rec, dig, step

    # Per-sample error bound: the independent-rint codec guarantees every
    # reconstructed digital value sits within HALF THE BLOCK STEP of the
    # exact resampled digital grid (the q16 extraction of the same file).
    q16_ext = Q16NightExtractor(cols, max_length_hours=hours)
    q16 = {c: np.zeros((1, n_grid[c]), np.int16) for c in cols}
    m16 = {c: np.zeros(1, dtype=Q16_META_DTYPE) for c in cols}
    q16_ext.extract_into(fps[0], q16, m16, 0)
    q, meta = outs[True]
    for c in cols:
        a, b, vmax, nv, n_pad, present = meta[c][0]
        assert present
        _, dig, step = decode_host(q[c][0], n_grid[c], nv, a, b)
        err = np.abs(dig[:nv] - q16[c][0][:nv].astype(np.float64))
        assert (err <= step[:nv] / 2 + 1e-9).all(), (c, float(err.max()))

    # Reconstruction RMS vs the host-decoded f32 grid stays small in
    # aggregate too (the mu-law codec this replaced sat at ~25% on ECG).
    dec = NightDecoder(cols, max_length_hours=hours)
    ref = {c: np.empty(n_grid[c], np.float32) for c in cols}
    dec.decode_into(fps[0], ref)
    for c in cols:
        a, b, vmax, nv, n_pad, present = meta[c][0]
        rec, _, _ = decode_host(q[c][0], n_grid[c], nv, a, b)
        rms_err = np.sqrt(np.mean(np.square(rec - ref[c])))
        rms_sig = np.sqrt(np.mean(np.square(ref[c])))
        assert rms_err < 0.30 * max(rms_sig, 1e-9), (c, rms_err, rms_sig)

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG', 'THX': 'THX'}),
            feature_dim=16, activation='gelu', norm='instance', chunk_causal=False,
            initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    x0 = {'ECG': np.zeros((1, 1024 * 6), np.float32), 'THX': np.zeros((1, 256 * 6), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), x0)

    # Device-unpack parity: the jitted q4 forward on the packed codes must
    # produce the same logits as the model applied to the host-decoded
    # reconstruction (any nibble-order / sign-bit / scale / cumsum bug in
    # the in-graph decode shows up here as a large logit gap; the residual
    # tolerance is f32 summation-ORDER noise — numpy's sequential cumsum
    # vs XLA's associative scan).
    fwd_logits = make_streaming_forward_q4(model, n_grid, precision='float32', output='logits')
    q, meta = outs[True]
    dev = {c: jnp.asarray(q[c]) for c in cols}
    vecs = [{c: jnp.asarray(meta[c][f]) for c in cols} for f in Q8_META_DTYPE.names]
    logits_q4 = np.asarray(fwd_logits(variables, dev, *vecs))
    x_host = {}
    for c in cols:
        a, b, vmax, nv, n_pad, present = meta[c][0]
        v, _, _ = decode_host(q[c][0], n_grid[c], nv, a, b, f64=False)
        valid = (np.arange(n_grid[c]) < n_pad)[None, :]
        x_host[c] = np.asarray(_masked_zscore(jnp.asarray(v[None, :]), jnp.asarray(valid), jnp.float32))
    logits_host = np.asarray(model.apply(variables, x_host)).astype(np.float32)
    np.testing.assert_allclose(logits_q4, logits_host, atol=1e-3, rtol=1e-3)

    # End-to-end: the streaming pipeline (slot rotation, row assignment,
    # per-file slicing, missing-THX present=False row) must match a direct
    # fill-and-launch of the same batch through the same jitted forward.
    pipe_q4 = StreamingPipelineQ4(model, variables, list(cols), batch_size=2,
                                  max_length_hours=hours, precision='float32')
    out_q4 = dict(pipe_q4.run(fps))
    ext2 = pipe_q4._make_extractor()
    bq = {c: np.zeros((2, q4_row_len(n_grid[c])), np.uint8) for c in cols}
    bm = {c: np.zeros(2, dtype=Q8_META_DTYPE) for c in cols}
    for row, fp in enumerate(fps[:2]):
        ext2.extract_into(fp, bq, bm, row)
    assert not bm['THX'][1]['present']  # file 1 ships without THOR RES
    direct = np.asarray(pipe_q4._launch(bq, bm))
    np.testing.assert_array_equal(out_q4[fps[0]], direct[0])
    np.testing.assert_array_equal(out_q4[fps[1]], direct[1])

    # Coarse anti-catastrophe floor only (see docstring for why not 0.8).
    out_f32 = dict(StreamingPipeline(model, variables, list(cols), batch_size=2,
                                     max_length_hours=hours, precision='float32').run(fps))
    agreement = np.concatenate([out_f32[fp] == out_q4[fp] for fp in fps]).mean()
    assert agreement >= 0.3, agreement


def test_stream_early_abandon(tmp_path):
    """Dropping the run() generator after one result must release the
    producer thread (stop-aware queue put) so a fresh run() works cleanly."""
    import gc

    import jax

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.pipeline import StreamingPipelineQ16

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG'}), feature_dim=16, activation='gelu',
            norm='instance', chunk_causal=False, initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    hours = 6 / 120
    rng = np.random.default_rng(9)
    fps = []
    for i in range(6):
        fp = str(tmp_path / f'{i}.edf')
        write_edf(fp, {'ECG': rng.normal(size=int(1024 / 30 * 30) * 6) * 0.5},
                  {'ECG': 1024 / 30}, physical_ranges={'ECG': (-3, 3)}, record_duration=30.0)
        fps.append(fp)
    variables = model.init(jax.random.PRNGKey(0), {'ECG': np.zeros((1, 1024 * 6), np.float32)})
    pipe = StreamingPipelineQ16(model, variables, ['ECG'], batch_size=1,
                                max_length_hours=hours, precision='float32')
    it = pipe.run(fps)
    next(it)
    it.close()  # abandon mid-stream
    gc.collect()
    full = dict(pipe.run(fps))  # would deadlock/corrupt before the fix
    assert set(full) == set(fps)


@pytest.mark.parametrize('transport', ['q16', 'q4'])
def test_q16_pipeline_multichip_mesh(tmp_path, transport):
    """Quantized serving sharded over an 8-device mesh (batch dim on the
    'data' axis) must match the single-device hypnograms exactly — for both
    the int16 rung and the packed-uint8 q4 rung (whose transport rows are
    half-length packed bytes; the mesh shards the night dim either way)."""
    import jax

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.parallel.mesh import make_mesh
    from wav2sleep_tpu.pipeline import StreamingPipelineQ4, StreamingPipelineQ16

    cls = {'q16': StreamingPipelineQ16, 'q4': StreamingPipelineQ4}[transport]

    if jax.device_count() < 8:
        import pytest

        pytest.skip('needs 8 virtual devices')
    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG'}), feature_dim=16, activation='gelu',
            norm='instance', chunk_causal=False, initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    hours = 6 / 120
    rng = np.random.default_rng(11)
    fps = []
    for i in range(10):
        fp = str(tmp_path / f'{i}.edf')
        write_edf(fp, {'ECG': rng.normal(size=int(1024 / 30 * 30) * 6) * 0.5},
                  {'ECG': 1024 / 30}, physical_ranges={'ECG': (-3, 3)}, record_duration=30.0)
        fps.append(fp)
    variables = model.init(jax.random.PRNGKey(0), {'ECG': np.zeros((1, 1024 * 6), np.float32)})
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    single = dict(cls(model, variables, ['ECG'], batch_size=8,
                      max_length_hours=hours, precision='float32').run(fps))
    sharded = dict(cls(model, variables, ['ECG'], batch_size=8,
                       max_length_hours=hours, precision='float32',
                       mesh=mesh).run(fps))
    for fp in fps:
        np.testing.assert_array_equal(single[fp], sharded[fp])


def test_q8_pipeline_eog_5class(tmp_path):
    """Neural (EOG-L/R, 4096 samples/epoch) 5-class model through the q8
    streaming transport — exercises the largest per-epoch rate."""
    import jax

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.pipeline import StreamingPipeline, StreamingPipelineQ8

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'EOG-L': 'EOG', 'EOG-R': 'EOG'}),
            feature_dim=16, activation='gelu', norm='instance', chunk_causal=False,
            initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=5,
    )
    hours = 4 / 120
    rng = np.random.default_rng(13)
    fps = []
    for i in range(2):
        n = int(256 * 30) * 4  # 256 Hz source -> resampled to 4096/30 Hz
        sigs = {'EOG(L)': rng.normal(size=n) * 40, 'EOG(R)': rng.normal(size=n) * 40}
        fp = str(tmp_path / f'{i}.edf')
        write_edf(fp, sigs, {k: 256.0 for k in sigs}, units={k: 'uV' for k in sigs},
                  physical_ranges={k: (-100, 100) for k in sigs}, record_duration=30.0)
        fps.append(fp)
    x0 = {'EOG-L': np.zeros((1, 4096 * 4), np.float32), 'EOG-R': np.zeros((1, 4096 * 4), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), x0)
    cols = ['EOG-L', 'EOG-R']
    out_f32 = dict(StreamingPipeline(model, variables, cols, batch_size=2,
                                     max_length_hours=hours, precision='float32').run(fps))
    out_q8 = dict(StreamingPipelineQ8(model, variables, cols, batch_size=2,
                                      max_length_hours=hours, precision='float32').run(fps))
    for fp in fps:
        assert out_q8[fp].shape == (4,)
        assert set(np.unique(out_q8[fp])) <= {0, 1, 2, 3, 4}
    agreement = np.concatenate([out_f32[fp] == out_q8[fp] for fp in fps]).mean()
    assert agreement >= 0.75, agreement


def test_streaming_causal_normalization(tmp_path):
    """normalize='causal' streaming path (Pallas EMA kernel on TPU,
    interpreter on CPU) must match host causal_rolling_normalize + model."""
    import jax
    import jax.numpy as jnp

    from wav2sleep_tpu import models as jm
    from wav2sleep_tpu.ops import causal_rolling_normalize
    from wav2sleep_tpu.pipeline import NightDecoder, StreamingPipeline

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({'ECG': 'ECG'}), feature_dim=16, activation='gelu',
            norm='instance', chunk_causal=False, initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    hours = 4 / 120
    rng = np.random.default_rng(17)
    fp = str(tmp_path / 'n.edf')
    n = int(1024 / 30 * 30) * 4
    write_edf(fp, {'ECG': np.sin(np.arange(n) / 7.0) * 0.6 + rng.normal(size=n) * 0.05},
              {'ECG': 1024 / 30}, physical_ranges={'ECG': (-3, 3)}, record_duration=30.0)
    variables = model.init(jax.random.PRNGKey(0), {'ECG': np.zeros((1, 1024 * 4), np.float32)})

    pipe = StreamingPipeline(model, variables, ['ECG'], batch_size=1,
                             max_length_hours=hours, precision='float32', normalize='causal')
    (got_fp, got), = list(pipe.run([fp]))

    # Host reference: decode -> causal EMA normalize -> model -> argmax.
    dec = NightDecoder(['ECG'], max_length_hours=hours)
    raw = {'ECG': np.empty(1024 * 4, np.float32)}
    dec.decode_into(fp, raw)
    z = causal_rolling_normalize(raw['ECG'], sampling_freq=1024 / 30)
    ref = np.argmax(np.asarray(model.apply(variables, {'ECG': jnp.asarray(z[None])})), axis=-1)[0]
    np.testing.assert_array_equal(got, ref)


def _mini_model(signals):
    import jax

    from wav2sleep_tpu import models as jm

    model = jm.Wav2Sleep(
        signal_encoders=jm.SignalEncoders(
            signal_map=jm.as_signal_map({s: s for s in signals}), feature_dim=16,
            activation='gelu', norm='instance', chunk_causal=False,
            initial_channels=4, max_channels=8,
        ),
        epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=16, layers=1, dim_ff=32, nhead=4, dropout=0.0),
        sequence_mixer=jm.SequenceCNN(feature_dim=16, num_layers=1, kernel_size=3, num_dilations=2, norm='layer', dropout=0.0),
        num_classes=4,
    )
    x0 = {s: np.zeros((1, COLS_TO_SAMPLES_PER_EPOCH[s] * 2), np.float32) for s in signals}
    return model, model.init(jax.random.PRNGKey(0), x0)


def test_short_night_matches_parquet_convention(tmp_path):
    """A night shorter than max_length_hours must (a) yield a hypnogram
    trimmed to its real epochs and (b) be normalized over its real epochs
    only, with -inf padding beyond — the parquet/api path's convention
    (dataset z-scores real samples; api trims to night_epochs). The old
    behavior z-scored the zero-padded tail into the moments and returned
    1,200 epochs of garbage tail for every short recording."""
    import datetime

    import jax.numpy as jnp

    from wav2sleep_tpu.pipeline import StreamingPipelineQ8, StreamingPipelineQ16

    rng = np.random.default_rng(23)
    grid_epochs, night_epochs = 6, 4
    hours = grid_epochs / 120
    fs = 125.0
    n = int(fs * 30) * night_epochs
    fp = str(tmp_path / 'short.edf')
    write_edf(
        fp, {'ECG': rng.normal(size=n) * 0.5}, {'ECG': fs},
        physical_ranges={'ECG': (-3, 3)},
        start=datetime.datetime(2001, 1, 1, 22, 0, 0), record_duration=30.0,
    )
    model, variables = _mini_model(['ECG'])

    # Host reference, parquet-style: decode the night's real epochs,
    # z-score them (ddof=1), -inf pad to the grid, forward (normalize off).
    dec = NightDecoder(['ECG'], max_length_hours=hours)
    spe = COLS_TO_SAMPLES_PER_EPOCH['ECG']
    buf = np.empty(spe * grid_epochs, np.float32)
    assert dec.decode_into(fp, {'ECG': buf}) == night_epochs
    real = buf[: spe * night_epochs].astype(np.float64)
    assert np.isinf(buf[spe * night_epochs :]).all()  # -inf pad, not zeros
    z = (real - real.mean()) / max(real.std(ddof=1), 1e-6)
    padded = np.full(len(buf), -np.inf, np.float32)
    padded[: len(z)] = z.astype(np.float32)
    ref = np.argmax(
        np.asarray(model.apply(variables, {'ECG': jnp.asarray(padded[None])})), axis=-1
    )[0][:night_epochs]

    for cls in (StreamingPipeline, StreamingPipelineQ16, StreamingPipelineQ8):
        pipe = cls(model, variables, ['ECG'], batch_size=1,
                   max_length_hours=hours, precision='float32')
        (got_fp, got), = list(pipe.run([fp]))
        assert got_fp == fp
        assert len(got) == night_epochs, cls.__name__  # trimmed, not grid
        np.testing.assert_array_equal(got, ref, err_msg=cls.__name__)


def test_corrupt_file_skipped_not_fatal(tmp_path, caplog):
    """One unreadable EDF in a sweep is logged and skipped; the remaining
    nights still stream (api.prepare's per-file skip, SURVEY §5.3 role)."""
    import logging

    rng = np.random.default_rng(3)
    hours = 4 / 120
    fps = []
    for i in range(3):
        fp = str(tmp_path / f'{i}.edf')
        write_edf(fp, {'ECG': rng.normal(size=int(125 * 30) * 4) * 0.5}, {'ECG': 125.0},
                  physical_ranges={'ECG': (-3, 3)}, record_duration=30.0)
        fps.append(fp)
    with open(fps[1], 'wb') as f:
        f.write(b'not an edf')
    model, variables = _mini_model(['ECG'])
    pipe = StreamingPipeline(model, variables, ['ECG'], batch_size=2,
                             max_length_hours=hours, precision='float32')
    with caplog.at_level(logging.WARNING):
        out = dict(pipe.run(fps))
    assert set(out) == {fps[0], fps[2]}
    assert any('Skipping unreadable night' in r.message for r in caplog.records)


def test_raw_extractor_truncates_to_bucket(tmp_path):
    """A file longer than the probed raw bucket truncates to whole records
    instead of crashing the row reshape."""
    from wav2sleep_tpu.pipeline import META_DTYPE, RawNightExtractor

    rng = np.random.default_rng(9)
    fs = 125.0
    fp = str(tmp_path / 'long.edf')
    n_epochs = 20
    write_edf(fp, {'ECG': rng.normal(size=int(fs * 30) * n_epochs) * 0.5}, {'ECG': fs},
              physical_ranges={'ECG': (-3, 3)}, record_duration=30.0)
    ext = RawNightExtractor(['ECG'])
    cap = 65536  # < 75,000 samples in the file, NOT a multiple of spr=3750
    out = {'ECG': np.zeros((1, cap), np.int16)}
    meta = {'ECG': np.zeros(1, dtype=META_DTYPE)}
    assert ext.extract_into(fp, out, meta, 0) == n_epochs
    n = int(meta['ECG'][0]['n'])
    spr = int(fs * 30)
    assert n <= cap and n % spr == 0 and n > 0


def test_salvaged_empty_channel_is_missing_modality(tmp_path):
    """A channel the EDF-header salvage clamped to 0 samples/record (bogus
    negative spr) must behave like a MISSING modality in every transport —
    not crash the night (ZeroDivisionError in the raw row reshape, empty-
    array .max() in the q8 fallback) or feed the model constant zeros."""
    from wav2sleep_tpu.pipeline import (
        META_DTYPE,
        Q8_META_DTYPE,
        NightDecoder,
        Q8NightExtractor,
        RawNightExtractor,
    )

    rng = np.random.default_rng(11)
    hours = 4 / 120
    S = 4
    fp = str(tmp_path / 'salvaged.edf')
    write_edf(
        fp,
        {'ECG': rng.normal(size=int(125 * 30) * S) * 0.5,
         'THOR RES': rng.normal(size=int(32 * 30) * S) * 0.4},
        {'ECG': 125.0, 'THOR RES': 32.0},
        physical_ranges={'ECG': (-3, 3), 'THOR RES': (-3, 3)},
        record_duration=30.0,
    )
    # Corrupt THOR RES's samples/record field to -1 (signal header layout:
    # 256-byte header + per-signal fields; spr sits at 256 + 216*ns + i*8).
    with open(fp, 'r+b') as f:
        f.seek(256 + 216 * 2 + 1 * 8)
        f.write(b'-1      ')
    from wav2sleep_tpu.data.edf import read_edf_header

    h = read_edf_header(fp)
    assert h.channels[1].samples_per_record == 0  # salvage happened

    cols = ('ECG', 'THX')
    # f32 decode: salvaged channel becomes the -inf missing sentinel.
    dec = NightDecoder(list(cols), max_length_hours=hours)
    out = {c: np.empty(COLS_TO_SAMPLES_PER_EPOCH[c] * S, np.float32) for c in cols}
    assert dec.decode_into(fp, out) == S
    assert np.isinf(out['THX']).all()
    assert np.isfinite(out['ECG']).all()

    # Raw int16: present=False, no ZeroDivisionError.
    ext = RawNightExtractor(list(cols))
    raw = {c: np.zeros((1, 65536), np.int16) for c in cols}
    meta = {c: np.zeros(1, dtype=META_DTYPE) for c in cols}
    assert ext.extract_into(fp, raw, meta, 0) == S
    assert not meta['THX'][0]['present']
    assert meta['ECG'][0]['present'] and meta['ECG'][0]['n'] > 0

    # q8 (native and fallback): present=False, no empty-array .max().
    for use_native in (True, False):
        ext8 = Q8NightExtractor(list(cols), max_length_hours=hours, use_native=use_native)
        q = {c: np.zeros((1, COLS_TO_SAMPLES_PER_EPOCH[c] * S), np.int8) for c in cols}
        m8 = {c: np.zeros(1, dtype=Q8_META_DTYPE) for c in cols}
        assert ext8.extract_into(fp, q, m8, 0) == S
        assert not m8['THX'][0]['present']
        assert m8['ECG'][0]['present'] and m8['ECG'][0]['n_valid'] > 0
