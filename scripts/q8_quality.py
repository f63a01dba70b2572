#!/usr/bin/env python
"""Quantify the quality cost of the mu-law int8 (q8) serving transport.

Generates off-grid, physiologically-scaled synthetic nights (ECG 125 Hz with
stage-modulated heart rate, QRS spikes, baseline wander and movement
artifacts; PPG 256 Hz pulse waves; respiration 10 Hz with stage-modulated
amplitude and apnea-like dropouts), briefly TRAINS the flagship model to
separate the synthetic stages (so logits have trained-model structure), then
runs the same weights through the lossless f32 decode path and the q8
companded transport on held-out nights and compares end-to-end. Reported:

- hypnogram agreement + Cohen's kappa between the two hypnograms,
- logit perturbation |delta| (mean / p95) vs the per-epoch decision margin,
- the decision margin of flipped epochs (flips should sit at near-ties).

A second configuration repeats the comparison with random-init weights whose
per-class bias has been centered out — there the decision margins are ~15x
smaller than any trained model's, giving a deliberately pessimistic bound.

The released reference checkpoints aren't fetchable here (no egress), so the
synthetic-trained model is the realism anchor. Prints one JSON line per
configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from wav2sleep_tpu.data.synth import write_nights  # noqa: E402  (shared generator)


def zscore_host(x: np.ndarray) -> np.ndarray:
    """Mirror of the pipelines' in-graph per-recording z-score (ddof=1)."""
    mu = x.mean(axis=-1, keepdims=True)
    std = np.sqrt(np.square(x - mu).sum(axis=-1, keepdims=True) / (x.shape[-1] - 1))
    return (x - mu) / np.maximum(std, 1e-6)


def compare(ref: np.ndarray, test: np.ndarray) -> dict:
    from wav2sleep_tpu.stats import cohens_kappa

    ref_pred, pred = ref.argmax(-1), test.argmax(-1)
    agree = pred == ref_pred
    delta = np.abs(test - ref)
    top2 = np.sort(ref, axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    cmat = np.histogram2d(ref_pred.ravel(), pred.ravel(), bins=(4, 4), range=((0, 4), (0, 4)))[0]
    return {
        'agreement': float(agree.mean()),
        'kappa_vs_f32': float(cohens_kappa(cmat, n_classes=4)),
        'delta_logit_mean': float(delta.mean()),
        'delta_logit_p95': float(np.quantile(delta, 0.95)),
        'margin_median': float(np.median(margin)),
        'flipped_margin_median': float(np.median(margin[~agree])) if (~agree).any() else 0.0,
    }


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument('--train-nights', type=int, default=10)
    parser.add_argument('--eval-nights', type=int, default=8)
    parser.add_argument('--hours', type=float, default=6.0)
    parser.add_argument('--train-steps', type=int, default=120)
    parser.add_argument('--feature-dim', type=int, default=128)
    parser.add_argument(
        '--train-transport',
        default='lossless',
        choices=['lossless', 'q8'],
        help='quantize the TRAINING inputs through the mu-law int8 training '
        'transport (ops/q8_transport.py) before the training loop, to A/B '
        'the end-task cost of input_transport=q8 (same seeds/rng either way)',
    )
    parser.add_argument(
        '--label-noise',
        type=float,
        default=0.0,
        help='corpus difficulty: fraction of epoch labels re-scored to a '
        'random other stage (data/synth.py). Use with --overlap to measure '
        'transport deltas at sub-ceiling accuracy (the default easy corpus '
        'saturates at ~0.998 eval acc, compressing every delta).',
    )
    parser.add_argument(
        '--overlap',
        type=float,
        default=0.0,
        help='corpus difficulty: 0..1 blend of per-stage physiology toward '
        'the mean (shrinks class separability; data/synth.py)',
    )
    return parser


def setup_and_train(args):
    """Synthesize disjoint train/eval corpora, train the flagship with
    held-out model selection, and compute the lossless-f32 reference logits.

    Returns a SimpleNamespace with everything a transport-quality rung
    needs (model, selected f32/bf16 weights, eval corpus + labels, the q8
    eval extraction, reference logits and the JSON row prefix), so sibling
    harnesses (scripts/q4_codebook_probe.py) can reuse the exact protocol
    without retraining code drift.
    """
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update('jax_compilation_cache_dir', os.path.join(REPO, '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from __graft_entry__ import _flagship_model
    from wav2sleep_tpu.data.preprocessing import signal_target_grid
    from wav2sleep_tpu.pipeline import (
        NightDecoder,
        Q8_META_DTYPE,
        Q8NightExtractor,
        make_streaming_forward,
        make_streaming_forward_q8,
    )
    from wav2sleep_tpu.settings import COLS_TO_SAMPLES_PER_EPOCH
    from wav2sleep_tpu.train.metrics import cross_entropy_ignore_index

    signals = ['ABD', 'THX', 'ECG', 'PPG']
    model, _ = _flagship_model(feature_dim=args.feature_dim)

    tmp = tempfile.mkdtemp(prefix='w2s_q8q_')
    print('# synthesizing corpus...', file=sys.stderr)
    # Disjoint subfolders: write_nights names files night{i:03d}.edf, so
    # sharing one folder would overwrite the first eval_nights train files
    # with eval waveforms (while keeping the train labels) — contaminating
    # both the train set and the train/eval split.
    train_dir = os.path.join(tmp, 'train')
    eval_dir = os.path.join(tmp, 'eval')
    os.makedirs(train_dir)
    os.makedirs(eval_dir)
    knobs = dict(overlap=args.overlap, label_noise=args.label_noise)
    train_fps, train_y = write_nights(train_dir, args.train_nights, args.hours, seed=0, **knobs)
    eval_fps, eval_y = write_nights(eval_dir, args.eval_nights, args.hours, seed=1, **knobs)
    print('# corpus written; decoding...', file=sys.stderr)
    n_grid = {c: len(signal_target_grid(c, args.hours)) for c in signals}

    decoder = NightDecoder(signals, args.hours)

    def decode_all(fps):
        buf = {c: np.empty((len(fps), n_grid[c]), np.float32) for c in signals}
        for i, fp in enumerate(fps):
            decoder.decode_into(fp, {c: buf[c][i] for c in signals})
        return buf

    train_f32, eval_f32 = decode_all(train_fps), decode_all(eval_fps)
    train_z = {c: zscore_host(v) for c, v in train_f32.items()}
    if args.train_transport == 'q8':
        # Round-trip the training inputs through the mu-law int8 training
        # transport: the model only ever sees quantized inputs, exactly as
        # under Trainer(input_transport='q8').
        from wav2sleep_tpu.ops.q8_transport import dequant_batch, encode_batch

        train_z = {
            c: np.asarray(v) for c, v in dequant_batch(encode_batch(train_z)).items()
        }

    extractor = Q8NightExtractor(signals, args.hours)
    B_eval = len(eval_fps)
    q8_buf = {c: np.zeros((B_eval, n_grid[c]), np.int8) for c in signals}
    meta = {c: np.zeros(B_eval, dtype=Q8_META_DTYPE) for c in signals}
    for i, fp in enumerate(eval_fps):
        extractor.extract_into(fp, q8_buf, meta, i)

    def q8_args():
        # Operand order = Q8_META_DTYPE field order (pipeline._launch).
        return (
            {c: jnp.asarray(q8_buf[c]) for c in signals},
            *(
                {c: jnp.asarray(meta[c][name]) for c in signals}
                for name in Q8_META_DTYPE.names
            ),
        )

    tiny = {k: np.zeros((1, COLS_TO_SAMPLES_PER_EPOCH[k] * 2), np.float32) for k in signals}
    var_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), tiny))

    fwd_f32 = make_streaming_forward(model, precision='float32', output='logits')
    fwd_q8_f32 = make_streaming_forward_q8(model, precision='float32', output='logits')
    fwd_q8_bf16 = make_streaming_forward_q8(model, precision='bfloat16', output='logits')

    # --- train briefly so logits have trained-model structure ---
    variables = model.init(jax.random.PRNGKey(0), tiny)
    tx = optax.adam(3e-3)
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, x, y):
        def loss_fn(v):
            logits = model.apply(v, x)
            return cross_entropy_ignore_index(logits.reshape(-1, 4), y.reshape(-1))

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state2, loss

    # Held-out model selection: keep the best-generalizing weights, the
    # regime a production model lives in. (Training to convergence on 6
    # synthetic nights memorizes them — train_acc 1.0, loss 6e-4 — and such
    # an overconfident model is pathologically input-sensitive: measured
    # agreement drops to 90% with LARGE-margin flips. Real models trained on
    # 10k+ nights sit at val loss ~0.8, the regime selection pins here.)
    eval_x_dev = {c: jnp.asarray(eval_f32[c]) for c in signals}
    eval_y_dev = jnp.asarray(eval_y)

    @jax.jit
    def eval_loss_fn(variables):
        logits = model.apply(
            variables, {c: _zscore_dev(eval_x_dev[c]) for c in signals}
        )
        return cross_entropy_ignore_index(logits.reshape(-1, 4), eval_y_dev.reshape(-1))

    def _zscore_dev(v):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        std = jnp.sqrt(jnp.sum(jnp.square(v - mu), axis=-1, keepdims=True) / (v.shape[-1] - 1))
        return (v - mu) / jnp.maximum(std, 1e-6)

    rng = np.random.default_rng(0)
    n_train = len(train_fps)
    loss = float('nan')
    best = {'loss': float('inf'), 'vars': None, 'step': -1}
    t0 = __import__('time').time()
    for step in range(args.train_steps):
        idx = rng.choice(n_train, size=min(4, n_train), replace=False)
        x = {c: jnp.asarray(train_z[c][idx]) for c in signals}
        y = jnp.asarray(train_y[idx])
        variables, opt_state, loss = train_step(variables, opt_state, x, y)
        if step % 5 == 0 or step == args.train_steps - 1:
            el = float(eval_loss_fn(variables))
            if el < best['loss']:
                best = {'loss': el, 'vars': jax.device_get(variables), 'step': step}
            print(
                f'# step {step} train_loss={float(loss):.4f} eval_loss={el:.4f} '
                f'({__import__("time").time() - t0:.0f}s)',
                file=sys.stderr,
            )
    if best['vars'] is None:
        raise SystemExit(
            f'--train-steps {args.train_steps} trained no model '
            '(need >= 1 step to select evaluation weights).'
        )
    variables = best['vars']
    train_acc_logits = np.asarray(
        fwd_f32(variables, {c: jnp.asarray(train_f32[c]) for c in signals})
    )
    train_acc = float((train_acc_logits.argmax(-1) == train_y).mean())

    epochs = int(args.eval_nights * args.hours * 120)
    ref = np.asarray(fwd_f32(variables, eval_x_dev))
    f32_acc = float((ref.argmax(-1) == eval_y).mean())
    base = {
        'nights': args.eval_nights,
        'epochs': epochs,
        'label_noise': args.label_noise,
        'overlap': args.overlap,
        'train_transport': args.train_transport,
        'train_steps': args.train_steps,
        'selected_step': best['step'],
        'eval_loss': round(best['loss'], 4),
        'train_acc': round(train_acc, 4),
        'f32_eval_acc': round(f32_acc, 4),
    }
    # bf16 configs must evaluate bf16 WEIGHTS, not just bf16 activations:
    # f32 params promote every matmul back to f32, and the reported delta
    # would exclude exactly the bf16 matmul noise it exists to bound
    # (bench.py's bf16 pipelines cast variables the same way).
    variables_bf16 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), variables
    )
    from types import SimpleNamespace

    return SimpleNamespace(
        signals=signals,
        model=model,
        n_grid=n_grid,
        eval_fps=eval_fps,
        eval_y=eval_y,
        eval_f32=eval_f32,
        epochs=epochs,
        q8_args=q8_args,
        fwd_f32=fwd_f32,
        fwd_q8_f32=fwd_q8_f32,
        fwd_q8_bf16=fwd_q8_bf16,
        variables=variables,
        variables_bf16=variables_bf16,
        var_shapes=var_shapes,
        ref=ref,
        f32_acc=f32_acc,
        base=base,
    )


def main() -> None:
    args = build_parser().parse_args()
    import jax
    import jax.numpy as jnp

    ns = setup_and_train(args)
    signals, model, n_grid = ns.signals, ns.model, ns.n_grid
    eval_fps, eval_y, eval_f32, epochs = ns.eval_fps, ns.eval_y, ns.eval_f32, ns.epochs
    q8_args, fwd_f32 = ns.q8_args, ns.fwd_f32
    variables, variables_bf16 = ns.variables, ns.variables_bf16
    ref, f32_acc, base = ns.ref, ns.f32_acc, ns.base

    from wav2sleep_tpu.pipeline import (
        Q4NightExtractor,
        Q8_META_DTYPE,
        make_streaming_forward_q4,
        q4_row_len,
    )

    for name, fwd, fwd_vars in (
        ('float32', ns.fwd_q8_f32, variables),
        ('bfloat16', ns.fwd_q8_bf16, variables_bf16),
    ):
        test = np.asarray(fwd(fwd_vars, *q8_args()))
        q8_acc = float((test.argmax(-1) == eval_y).mean())
        print(
            json.dumps(
                {
                    'config': f'trained model: q8+{name} vs f32 lossless',
                    **base,
                    'q8_eval_acc': round(q8_acc, 4),
                    'acc_delta': round(q8_acc - f32_acc, 5),
                    **{k: round(v, 5) for k, v in compare(ref, test).items()},
                }
            )
        )

    # --- q4 rung: the same trained weights over the packed 4-bit transport ---
    B_eval = len(eval_fps)
    q4_ext = Q4NightExtractor(signals, n_grid, args.hours)
    q4_buf = {c: np.zeros((B_eval, q4_row_len(n_grid[c])), np.uint8) for c in signals}
    meta4 = {c: np.zeros(B_eval, dtype=Q8_META_DTYPE) for c in signals}
    for i, fp in enumerate(eval_fps):
        q4_ext.extract_into(fp, q4_buf, meta4, i)

    def q4_args():
        return (
            {c: jnp.asarray(q4_buf[c]) for c in signals},
            *(
                {c: jnp.asarray(meta4[c][name]) for c in signals}
                for name in Q8_META_DTYPE.names
            ),
        )

    fwd_q4_f32 = make_streaming_forward_q4(model, n_grid, precision='float32', output='logits')
    fwd_q4_bf16 = make_streaming_forward_q4(model, n_grid, precision='bfloat16', output='logits')
    for name, fwd, fwd_vars in (
        ('float32', fwd_q4_f32, variables),
        ('bfloat16', fwd_q4_bf16, variables_bf16),
    ):
        test = np.asarray(fwd(fwd_vars, *q4_args()))
        q4_acc = float((test.argmax(-1) == eval_y).mean())
        print(
            json.dumps(
                {
                    'config': f'trained model: q4+{name} vs f32 lossless',
                    **base,
                    'q4_eval_acc': round(q4_acc, 4),
                    'acc_delta': round(q4_acc - f32_acc, 5),
                    **{k: round(v, 5) for k, v in compare(ref, test).items()},
                }
            )
        )

    # --- pessimistic bound: random init, per-class bias centered out ---
    rng = np.random.default_rng(0)
    rand_vars = jax.tree_util.tree_map(
        lambda sh: jnp.asarray(rng.normal(size=sh.shape, scale=0.05), jnp.float32),
        ns.var_shapes,
    )
    ref_r = np.asarray(fwd_f32(rand_vars, {c: jnp.asarray(eval_f32[c]) for c in signals}))
    rand_vars_bf16 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.bfloat16), rand_vars)
    test_r = np.asarray(ns.fwd_q8_bf16(rand_vars_bf16, *q8_args()))
    bias = ref_r.mean(axis=(0, 1), keepdims=True)
    print(
        json.dumps(
            {
                'config': 'random-init bias-centered (pessimistic): q8+bfloat16 vs f32 lossless',
                'nights': args.eval_nights,
                'epochs': epochs,
                **{k: round(v, 5) for k, v in compare(ref_r - bias, test_r - bias).items()},
            }
        )
    )


if __name__ == '__main__':
    main()
