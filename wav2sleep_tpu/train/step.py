"""Jitted training / evaluation steps over a device mesh.

The reference's training runtime is Lightning DDP (trainer/main.py): implicit
NCCL gradient sync, torchmetrics confusion matrices all-reduced by hand. The
TPU-native equivalent is a single jitted step with global-batch semantics:
the batch is sharded across the mesh's ``data`` axis, parameters are
replicated, and XLA inserts gradient/metric ``psum`` collectives over ICI.
Augmentations (polarity flip, modality dropout) and the loss/confusion
matrix run inside the same compiled program — one graph per signal-set,
signal subsets expressed via presence masks (no retraces).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import numpy as np

from ..ops.q8_transport import dequant_batch, is_encoded_batch
from ..parallel.mesh import DATA_AXIS
from .masker import SignalMasker, invert_signals
from .metrics import confusion_matrix, cross_entropy_ignore_index


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None
    ema_params: Any = None


def make_optimizer(
    learning_rate,
    weight_decay: float = 1e-4,
    grad_clip: float | None = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    accumulate_steps: int = 1,
    inject_lr_scale: bool = False,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip (+ gradient accumulation), torch defaults.

    ``inject_lr_scale`` wraps the transform in ``inject_hyperparams`` so a
    host-side plateau controller can rescale the LR between epochs.
    """
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if inject_lr_scale:
        adamw = optax.inject_hyperparams(
            lambda lr_scale: optax.adamw(
                learning_rate=lambda c: learning_rate(c) * lr_scale
                if callable(learning_rate)
                else learning_rate * lr_scale,
                b1=b1,
                b2=b2,
                eps=eps,
                weight_decay=weight_decay,
            )
        )(lr_scale=1.0)
    else:
        adamw = optax.adamw(
            learning_rate=learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
        )
    chain.append(adamw)
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def init_train_state(
    model,
    tx: optax.GradientTransformation,
    example_batch: dict[str, jnp.ndarray],
    rng: jax.Array,
    family: str = 'wav2sleep',
    ema: bool = False,
) -> TrainState:
    x = example_batch
    if is_encoded_batch(x):
        # q8-transport example: init from a plain f32 example of the same
        # shapes (codes are [B, T], same geometry as the raw signal).
        x = {k: np.zeros(v[0].shape, np.float32) for k, v in x.items()}
    x = _model_input(x, family)
    if family != 'ppgnet':
        # Parameters are independent of batch/sequence length: initialize on
        # a 1-night, 2-epoch example so init doesn't compile a full-size
        # forward (SleepPPG-Net hard-codes its input length, so keep it).
        from ..settings import COLS_TO_SAMPLES_PER_EPOCH

        x = {
            k: jnp.zeros((1, COLS_TO_SAMPLES_PER_EPOCH[k] * 2), v.dtype if hasattr(v, 'dtype') else jnp.float32)
            for k, v in x.items()
        }
    variables = model.init(rng, x, train=False)
    params = variables['params']
    batch_stats = variables.get('batch_stats')
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )


def _model_input(x: dict[str, jnp.ndarray], family: str):
    if family == 'ppgnet':
        if len(x) != 1:
            raise ValueError(f'{list(x.keys())=} but expected unimodal input!')
        return next(iter(x.values()))
    return x


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    num_classes: int,
    masker: Optional[SignalMasker] = None,
    flip_polarity: bool = True,
    family: str = 'wav2sleep',
    label_smoothing: float = 0.0,
    ema_decay: float | None = None,
    ema_start_step: int = 0,
    compute_dtype: Any = None,
) -> Callable:
    """Build the (unjitted) train step; see ``parallelize`` to jit over a mesh.

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16 against
    float32 master params (mixed precision: params are cast inside the loss,
    so gradients and the AdamW update stay f32; the loss itself is computed
    in f32 by ``cross_entropy_ignore_index``).
    """

    def train_step(state: TrainState, batch, rng: jax.Array):
        x, y = batch
        if is_encoded_batch(x):
            # mu-law int8 input transport: reconstruct the f32 signals (and
            # the -inf missing-modality sentinel) on device, BEFORE the
            # augmentations — mu-law is odd-symmetric, so polarity flipping
            # the decode equals flipping before encode.
            x = dequant_batch(x)
        rng = jax.random.fold_in(rng, state.step)
        rng_flip, rng_mask, rng_drop = jax.random.split(rng, 3)
        if flip_polarity:
            x = invert_signals(rng_flip, x)
        if masker is not None:
            x = masker(rng_mask, x)

        def loss_fn(params):
            apply_params = params
            xin = _model_input(x, family)
            if compute_dtype is not None:
                apply_params = jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params)
                xin = jax.tree_util.tree_map(lambda v: v.astype(compute_dtype), xin)
            variables = {'params': apply_params}
            if state.batch_stats is not None:
                variables['batch_stats'] = state.batch_stats
                logits, mutated = model.apply(
                    variables,
                    xin,
                    train=True,
                    rngs={'dropout': rng_drop},
                    mutable=['batch_stats'],
                )
                new_stats = mutated['batch_stats']
            else:
                logits = model.apply(variables, xin, train=True, rngs={'dropout': rng_drop})
                new_stats = None
            loss = cross_entropy_ignore_index(
                logits.reshape(-1, num_classes), y.reshape(-1), label_smoothing
            )
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay is not None:
            # Under gradient accumulation (optax.MultiSteps) the EMA must
            # fold ONLY on micro-steps where the optimizer actually applied:
            # folding every micro-step on unchanged params compounds the
            # decay to ema_decay^k (an EMA horizon k times shorter than
            # configured). ema_start_step likewise counts OPTIMIZER steps
            # (the reference EMACallback's global_step), not micro-steps.
            if hasattr(new_opt_state, 'mini_step'):  # MultiSteps state
                applied = new_opt_state.mini_step == 0
                steps_done = new_opt_state.gradient_step - applied.astype(jnp.int32)
            else:
                applied = None
                steps_done = state.step
            decay = jnp.where(steps_done >= ema_start_step, ema_decay, 1.0)
            if applied is None:
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: decay * e + (1.0 - decay) * p, state.ema_params, new_params
                )
            else:
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: jnp.where(applied, decay * e + (1.0 - decay) * p, e),
                    state.ema_params,
                    new_params,
                )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats if new_stats is not None else state.batch_stats,
            ema_params=new_ema,
        )
        metrics = {
            'loss': loss,
            'cmat': confusion_matrix(logits, y, num_classes),
            'grad_norm': optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model, num_classes: int, family: str = 'wav2sleep') -> Callable:
    """Eval step; ``present`` masks modalities without retracing."""

    def eval_step(params, batch_stats, batch, present=None):
        x, y = batch
        if is_encoded_batch(x):
            # Opt-in eval input transport (Trainer.eval_transport): linear
            # int16 (near-lossless) or mu-law int8 codes, decoded on device
            # before the forward — same -inf sentinel reconstruction as the
            # train step's q8 path.
            x = dequant_batch(x)
        variables = {'params': params}
        if batch_stats is not None:
            variables['batch_stats'] = batch_stats
        if family == 'ppgnet':
            logits = model.apply(variables, _model_input(x, family), train=False)
        else:
            logits = model.apply(variables, x, train=False, present=present)
        loss = cross_entropy_ignore_index(logits.reshape(-1, num_classes), y.reshape(-1))
        return {
            'loss': loss,
            'cmat': confusion_matrix(logits, y, num_classes),
            'preds': jnp.argmax(logits, axis=-1),
        }

    return eval_step


def parallelize_train_step(train_step, mesh, state, example_batch):
    """Jit the train step with DP shardings: replicated state, data-sharded
    batch. XLA inserts the gradient psum over ICI. Shardings are passed as
    pytree PREFIXES, so one jitted step serves every input-transport
    encoding (f32 / bf16 / q8 code+peak tuples) without restructuring."""
    del state, example_batch  # prefix shardings cover any tree
    rep = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        train_step,
        in_shardings=(rep, dsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def parallelize_eval_step(eval_step, mesh, params, batch_stats, example_batch):
    """Jit the eval step with DP shardings: replicated params/stats,
    data-sharded batch. The 4th (``present``) argument is left
    unconstrained — it is either None or a dict of tiny per-night [B] bool
    masks, and jit retraces per pytree structure anyway."""
    del params, batch_stats, example_batch  # prefix shardings cover any tree
    rep = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(eval_step, in_shardings=(rep, rep, dsh, None))
