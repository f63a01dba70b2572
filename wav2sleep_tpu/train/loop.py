"""Training orchestration: epochs, eval matrix, checkpointing, early stop.

TPU-native replacement for the reference's Lightning module + Trainer
(src/wav2sleep/trainer/main.py, scripts/train.py):

- one jitted train step (augmentations + loss + grads + AdamW + metrics) over
  the device mesh; batches stream from the threaded host pipeline,
- per-(mode, signal-subset, dataset) evaluation matrix via presence masks —
  all subsets share ONE compiled eval graph (the reference re-forwards with
  sliced dicts and needed torch.compile recompile_limit=64 for this),
- weight EMA maintained in-graph (the EMACallback role), used for eval when
  enabled,
- val_loss early stopping (patience 5) with optional reset-on-resume,
- Orbax checkpointing of the full training state (params, optimizer, EMA,
  RNG, early-stop/plateau state) with best/last retention, plus export of
  the deployable ``config.yaml`` + ``state_dict.pth`` folder on exit.
"""

from __future__ import annotations

import json
import logging
import math
import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import CCSHS, CFS, CHAT, ECG, MESA, PPG, SHHS, THX, TRAIN, VAL
from .datamodule import SleepDataModule
from ..utils import robust_fetch
from .masker import SignalMasker, validate_batch
from .scheduler import PlateauController, exp_warmup_schedule
from .step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

logger = logging.getLogger(__name__)


@dataclass
class EarlyStopping:
    """val_loss early stopping (reference ResettableEarlyStopping,
    trainer/callbacks.py:131-147)."""

    patience: int = 5
    min_delta: float = 0.0
    best: float = float('inf')
    wait: int = 0

    def update(self, metric: float) -> bool:
        """Returns True when training should stop."""
        if metric < self.best - self.min_delta:
            self.best = metric
            self.wait = 0
            return False
        self.wait += 1
        return self.wait >= self.patience

    def reset(self) -> None:
        self.best = float('inf')
        self.wait = 0

    def state_dict(self) -> dict:
        return {'best': self.best, 'wait': self.wait}

    def load_state_dict(self, s: dict) -> None:
        self.best, self.wait = s['best'], s['wait']


class MetricsLogger:
    """JSON-lines metric log + optional confusion-matrix PNGs + MLflow."""

    def __init__(self, log_dir: str, num_classes: int, plot_confusion: bool = True):
        self.log_dir = log_dir
        self.num_classes = num_classes
        self.plot_confusion = plot_confusion
        os.makedirs(log_dir, exist_ok=True)
        self.fp = os.path.join(log_dir, 'metrics.jsonl')
        self._mlflow = None
        try:  # Optional MLflow parity (reference logs everything there).
            if os.environ.get('MLFLOW_TRACKING_URI'):
                import mlflow

                self._mlflow = mlflow
                from ..utils import is_rank_zero

                if is_rank_zero():
                    try:
                        # CPU/accelerator utilization sampling (the reference
                        # enables this at run start, scripts/train.py:28-29).
                        mlflow.enable_system_metrics_logging()
                    except Exception as e:
                        logger.debug(f'mlflow system metrics unavailable: {e}')
        except ImportError:
            pass

    def log(self, metrics: dict[str, float], step: int) -> None:
        from ..utils import is_rank_zero

        # Rank-zero only, like log_confusion: on a pod with a shared
        # log_dir every process would otherwise append duplicate jsonl
        # lines and post conflicting MLflow points for the same step.
        if not is_rank_zero():
            return
        record = {'step': step, 'time': time.time(), **metrics}
        with open(self.fp, 'a') as f:
            f.write(json.dumps(record) + '\n')
        if self._mlflow is not None:
            self._mlflow.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)

    def log_confusion(self, cmat: np.ndarray, epoch: int, prefix: str) -> dict[str, float]:
        """Log kappa/acc (+ optional PNG) for one confusion matrix; returns
        the metrics dict (reference log.py:28-47). Delegates to the single
        implementation in wav2sleep_tpu/log.py (jsonl + PNG + MLflow)."""
        from ..log import log_aux_metrics

        return log_aux_metrics(
            cmat, epoch, prefix, artifact_dir=self.log_dir, plot=self.plot_confusion
        ) or {}


@dataclass
class Trainer:
    model: Any
    datamodule: SleepDataModule
    num_classes: int = 4
    family: str = 'wav2sleep'
    # Optimizer / schedule (reference defaults: adamw lr 1e-3 wd 1e-4,
    # warmup 2000, tau 10000, clip 1.0, 50 epochs).
    lr: float = 1e-3
    weight_decay: float = 1e-4
    warmup_steps: int = 2000
    tau: float = 10_000.0
    scheduler: str = 'expdecay'  # 'expdecay' | 'plateau' | 'none'
    grad_clip: float = 1.0
    accumulate_grad_batches: int = 1
    epochs: int = 50
    label_smoothing: float = 0.0
    # Augmentation
    masker: Optional[SignalMasker] = None
    flip_polarity: bool = True
    # EMA (reference EMACallback; off by default like the reference)
    ema_decay: Optional[float] = None
    ema_start_step: int = 2000
    eval_with_ema: bool = True
    # Keep the EMA copy in host RAM instead of device HBM (the reference
    # EMACallback's offload_to_cpu option, trainer/callbacks.py:27-29):
    # trades a per-step D2H fetch for one parameter-sized HBM buffer.
    ema_offload: bool = False
    # Early stopping
    early_stopping_patience: int = 5
    reset_early_stopping: bool = False
    # Infra
    precision: str = 'float32'  # 'float32' | 'bfloat16' (mixed: f32 master params)
    # Training INPUT transport: None ships signals at compute precision
    # (f32, or bf16 under mixed precision); 'q8' ships mu-law int8 codes +
    # per-(night,signal) peaks and reconstructs inside the jitted step
    # (ops/q8_transport.py) — half the H2D bytes of bf16, for hosts where
    # the step is transfer-bound. Eval/predict stay lossless either way.
    input_transport: Optional[str] = None
    seed: int = 42
    log_dir: str = 'runs/default'
    mesh: Any = None
    eval_subsets: bool = True
    max_steps_per_epoch: Optional[int] = None  # debug cap
    progress_bar: bool = True  # smoothed tqdm (reference CustomTQDMProgressBar)
    # Pipeline depth: metrics of step n are fetched only every K steps (the
    # per-step fetch serialized transfer behind compute: the host could not
    # issue transfer n+2 until step n's metrics arrived), so up to
    # ``stage_ring`` H2D transfers ride under in-flight compute. Slot reuse
    # is guarded by an explicit block-until-ready on the transfer staged
    # ``stage_ring`` batches ago (no longer implied by the metric fetch).
    metric_fetch_every: int = 16
    stage_ring: int = 4
    # Same deferred-drain treatment for the eval matrix: results of batch n
    # (loss scalar + [C,C] cmat + preds per subset — tiny) are fetched only
    # every K batches, so eval H2D transfers stack under in-flight compute
    # instead of serializing one batch at a time behind a per-batch fetch.
    # 1 restores the round-3 per-batch-fetch behavior (the A/B baseline).
    eval_fetch_every: int = 16
    # Eval INPUT transport: None ships the loader's f32 rows (lossless —
    # eval feeds model selection and the reported kappa, so this is the
    # default); 'q16' ships linear int16 codes + per-(night,signal) peaks
    # (half the bytes, ~1e-4 absolute reconstruction error on z-scored
    # rows); 'q8' reuses the mu-law train rung (quarter the bytes, the
    # measured q8 quality tax — docs/measurements/q8_quality_r4.json).
    # Decoded on device inside the jitted eval step. predict()/export are
    # always lossless.
    eval_transport: Optional[str] = None
    # Shadow eval transport: when set, every VAL epoch ALSO re-runs the val
    # loaders (no subsets) under this transport and logs the resulting
    # aggregate as ``val_loss_<transport>`` to metrics.jsonl. Selection
    # (early stopping, best-checkpoint, plateau) keeps using the primary
    # transport's val_loss — the shadow series exists to answer, from one
    # training run, whether best-epoch selection WOULD have differed under
    # the cheaper transport (the lossless-vs-q16 default question).
    shadow_eval_transport: Optional[str] = None

    state: TrainState = field(default=None, repr=False)
    current_epoch: int = 0

    def __post_init__(self):
        if self.input_transport not in (None, 'q8'):
            raise ValueError(f'unknown input_transport {self.input_transport!r} (None or "q8")')
        if self.eval_transport not in (None, 'q16', 'q8'):
            raise ValueError(
                f'unknown eval_transport {self.eval_transport!r} (None, "q16" or "q8")'
            )
        if self.shadow_eval_transport not in (None, 'q16', 'q8'):
            raise ValueError(
                f'unknown shadow_eval_transport {self.shadow_eval_transport!r} '
                '(None, "q16" or "q8")'
            )
        self.metrics_logger = MetricsLogger(self.log_dir, self.num_classes)
        self.early_stopping = EarlyStopping(patience=self.early_stopping_patience)
        self.plateau = (
            PlateauController(base_lr=self.lr) if self.scheduler == 'plateau' else None
        )
        if self.scheduler == 'expdecay':
            schedule = exp_warmup_schedule(self.lr, self.warmup_steps, self.tau)
        else:
            schedule = self.lr
        self.tx = make_optimizer(
            schedule,
            weight_decay=self.weight_decay,
            grad_clip=self.grad_clip,
            accumulate_steps=self.accumulate_grad_batches,
            inject_lr_scale=self.scheduler == 'plateau',
        )
        self.unified = self.family == 'wav2sleep' and len(self.model.signal_encoders) > 1
        self._train_step = make_train_step(
            self.model,
            self.tx,
            num_classes=self.num_classes,
            masker=self.masker if self.unified else None,
            flip_polarity=self.flip_polarity,
            family=self.family,
            label_smoothing=self.label_smoothing,
            ema_decay=None if self.ema_offload else self.ema_decay,
            ema_start_step=self.ema_start_step,
            compute_dtype=jnp.bfloat16 if self.precision == 'bfloat16' else None,
        )
        self._eval_step = make_eval_step(self.model, self.num_classes, family=self.family)
        self._jit_train = None
        self._jit_eval = None
        self._host_ema = None  # CPU-offloaded EMA pytree (ema_offload=True)
        self._ema_pending = []  # device param trees awaiting the host EMA fold
        self._ema_snapshot_fn = None
        self.rng = jax.random.PRNGKey(self.seed)

    # ------------------------------------------------------------------
    def _ensure_state(self, example_batch):
        if self.state is None:
            init_rng, self.rng = jax.random.split(self.rng)
            x = example_batch[0] if isinstance(example_batch, tuple) else example_batch
            self.state = init_train_state(
                self.model,
                self.tx,
                x,
                init_rng,
                family=self.family,
                ema=self.ema_decay is not None and not self.ema_offload,
            )
            if self.ema_decay is not None and self.ema_offload and self._host_ema is None:
                self._host_ema = jax.device_get(self.state.params)
            n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.state.params))
            logger.info(f'Initialized model with {n_params:,} parameters.')
        if self._jit_train is None:
            if self.mesh is not None:
                from ..parallel.mesh import replicate, warmup_collectives
                from .step import parallelize_eval_step, parallelize_train_step

                x, y = example_batch if isinstance(example_batch, tuple) else (example_batch, None)
                self._jit_train = parallelize_train_step(self._train_step, self.mesh, self.state, (x, y))
                self._jit_eval = parallelize_eval_step(
                    self._eval_step, self.mesh, self.state.params, self.state.batch_stats, (x, y)
                )
                # Replicate the state onto the mesh explicitly: on a single
                # process jit would reshard the committed single-device init
                # arrays implicitly, but on multi-process runs a committed
                # local array cannot be consumed by a global computation —
                # the state must become a global (fully-replicated) array
                # before the first step.
                self.state = replicate(self.mesh, self.state)
                # Create the Gloo/ICI communicator NOW, while the processes
                # are within seconds of each other — before the first train
                # step's minutes-long compile can skew them past the 30 s
                # context-init deadline (see warmup_collectives docstring).
                warmup_collectives(self.mesh)
            else:
                self._jit_train = jax.jit(self._train_step, donate_argnums=(0,))
                self._jit_eval = jax.jit(self._eval_step)

    def _ring_slot(self):
        """Claim the next staging-ring slot: returns (slot_dict, idx) after
        blocking on the H2D transfer that last used this slot (the reuse
        guard — a pooled host buffer may be rewritten only once its previous
        transfer completed; with deferred metric fetches that is no longer
        implied by step completion)."""
        if getattr(self, '_ring_pool', None) is None:
            R = max(2, self.stage_ring)
            self._ring_pool = [{} for _ in range(R)]
            self._ring_inflight = [None] * R
            self._ring_idx = 0
        j = self._ring_idx
        self._ring_idx = (self._ring_idx + 1) % len(self._ring_pool)
        if self._ring_inflight[j] is not None:
            jax.block_until_ready(self._ring_inflight[j])
            self._ring_inflight[j] = None
        return self._ring_pool[j], j

    def _bf16_cast(self, x, slot):
        import ml_dtypes

        out = {}
        for k, v in x.items():
            buf = slot.get(k)
            if buf is None or buf.shape != v.shape:
                buf = slot[k] = np.empty(v.shape, ml_dtypes.bfloat16)
            np.copyto(buf, v, casting='same_kind')
            out[k] = buf
        return out

    def _device_batch(self, x, y):
        if self.mesh is not None:
            import jax as _jax

            if _jax.process_count() > 1:
                # Multi-host: each process contributes its local shard.
                from ..parallel.mesh import global_batch_from_local

                return global_batch_from_local(self.mesh, (x, y))
            from ..parallel.mesh import shard_batch

            return shard_batch(self.mesh, (x, y))
        # Explicit async H2D: returning host numpy would defer the transfer
        # into the jit dispatch, making the staging ring's reuse guard
        # (_ring_slot blocks on these refs) a no-op on the single-chip path.
        return jax.device_put((x, y))

    def _pad_batch(self, x, y, target: int | None):
        """Pad a partial batch to ``target`` rows by replicating real rows,
        with ignore labels (-1). Loss and the confusion matrix skip labels
        < 0 (train/metrics.py) and per-row norms don't couple rows, so
        padding changes no metric; replicated (not zero) signal rows keep
        batch-coupled normalization honest — norm='batch' models compute
        per-batch statistics over ALL rows with mutable batch_stats, and
        zero rows would shift both that step's activations and the running
        stats every eval later uses. Padding keeps ONE compiled shape per
        phase and keeps the batch divisible by the mesh's data axis — a
        partial final batch would otherwise fail NamedSharding placement
        (ValueError) or trigger a fresh multi-minute compile.
        Returns (x, y, real_rows)."""
        B = int(y.shape[0])
        if target is None or B >= target:
            return x, y, B
        pad_idx = np.arange(target - B) % B
        x = {k: np.concatenate([v, v[pad_idx]], axis=0) for k, v in x.items()}
        y = np.concatenate(
            [y, np.full((target - B, *y.shape[1:]), -1, y.dtype)], axis=0
        )
        return x, y, B

    def _batch_target(self, B: int, configured: int | None) -> int | None:
        """Row count a batch of ``B`` real rows should be padded to: the
        configured loader batch size when short of it, rounded up to the
        next multiple of the mesh's data axis (the configured size itself
        may not divide it). On multi-process runs the batch being padded is
        the PROCESS-LOCAL shard (each host feeds its own rows through
        ``global_batch_from_local``), so it must fill this host's share of
        the data axis — rounding a local batch up to the GLOBAL axis size
        would pad every host to the full global batch and ship
        ``process_count``× the intended rows."""
        target = max(B, int(configured)) if configured is not None else B
        if self.mesh is not None:
            import jax as _jax

            n_data = self.mesh.shape['data']
            n_procs = _jax.process_count()
            if n_procs > 1:
                if n_data % n_procs:
                    raise ValueError(
                        f'data axis ({n_data}) not divisible by process count ({n_procs})'
                    )
                n_data //= n_procs
            target = -(-target // n_data) * n_data
        return None if target == B else target

    # ------------------------------------------------------------------
    def _progress(self, it, desc: str):
        """Smoothed tqdm progress (the reference CustomTQDMProgressBar role:
        smoothing=0.7 so batches/s reflects current throughput,
        trainer/callbacks.py:150-171 there). No-op when tqdm is missing or
        progress is disabled."""
        if not self.progress_bar:
            return it
        try:
            from tqdm import tqdm
        except ImportError:
            return it
        return tqdm(it, desc=desc, smoothing=0.7, leave=False)

    def _stage_batch(self, x, y):
        """Host-side staging: optional bf16 cast / q8 encode into a pooled
        ring slot, then an (async) H2D transfer. Called one batch AHEAD of
        the step consuming it; with the deferred metric fetch up to
        ``stage_ring`` transfers are in flight under device compute. The
        returned device batch is recorded against its ring slot so
        ``_ring_slot`` can guard reuse (page-warm pooled buffers: fresh
        large allocations fault at ~12 MB/s on sandboxed hosts)."""
        if self.masker is not None:
            # Eager-mode mirror of the reference masker's degenerate-night
            # error (all signals missing): under jit the masker can only
            # fall back silently, and the failure would otherwise surface
            # as NaN logits far from the cause. Probes one sample per row.
            validate_batch(x)
        x, y, _ = self._pad_batch(
            x, y, self._batch_target(y.shape[0], getattr(self.datamodule, 'batch_size', None))
        )
        slot_idx = None
        if self.input_transport == 'q8':
            from ..ops.q8_transport import encode_batch

            slot, slot_idx = self._ring_slot()
            x = encode_batch(x, slot=slot)
        elif self.precision == 'bfloat16':
            # The train step casts inputs to bf16 anyway (mixed precision);
            # casting on the host first halves H2D bytes with bit-identical
            # results (polarity flip and the -inf sentinel are exact in
            # bf16, and the z-score already happened in f32).
            slot, slot_idx = self._ring_slot()
            x = self._bf16_cast(x, slot)
        self._ensure_state((x, y))
        dev = self._device_batch(x, y)
        if slot_idx is not None:
            self._ring_inflight[slot_idx] = dev
        return dev

    def train_epoch(self, epoch: int) -> dict[str, float]:
        losses = []
        cmat = np.zeros((self.num_classes, self.num_classes), np.int64)
        step_rng = jax.random.fold_in(self.rng, epoch)
        if self.mesh is not None:
            # fold_in yields a committed single-device array; the jitted
            # step's replicated in_sharding needs a global array. fold_in is
            # deterministic and self.rng is per-process identical, so the
            # collective-free replicate is exact (see parallel/mesh.py).
            from ..parallel.mesh import replicate

            step_rng = replicate(self.mesh, step_rng)
        t0 = time.time()
        n = 0
        # Software pipeline: dispatch step n (async), stage batch n+1 so its
        # H2D transfer rides under in-flight compute, and only drain metrics
        # every ``metric_fetch_every`` steps — the old per-step fetch bounded
        # the pipeline to ONE transfer in flight (the host could not issue
        # transfer n+2 until step n completed), leaving the device idle for
        # most of each transfer. Deferring the drain lets transfers stack up
        # to ``stage_ring`` deep under compute; the drain (which blocks on
        # the newest dispatched step) bounds how far the host runs ahead.
        pending: list = []

        def drain():
            for m in pending:
                losses.append(m['loss'])
                # robust_fetch: on the relay tunnel a plain np.asarray here
                # can block forever on a lost D2H reply (utils.robust_fetch).
                cmat_np = robust_fetch(m['cmat']).astype(np.int64)
                np.add(cmat, cmat_np, out=cmat)
            pending.clear()
            self._drain_host_ema()

        host_it = iter(self._progress(self.datamodule.train_loader(epoch), f'train e{epoch}'))
        # Host-loader time: seconds this (single-core) host spends producing
        # batches — parquet read, decode, collate, transport encode — as a
        # fraction of the epoch. Compute dispatch is async, so any host
        # fraction under ~1.0 still keeps the chip fed; sustained values
        # near 1.0 mean the loader, not the device, sets the step time.
        t_host = 0.0
        th0 = time.time()
        nxt = next(host_it, None)
        t_host += time.time() - th0
        dev = self._stage_batch(*nxt) if nxt is not None else None
        # Host-side mirror of state.step for the EMA start gate: reading
        # int(self.state.step) per step would block on the just-dispatched
        # step and collapse the transfer pipeline back to one deep.
        ema_step0 = int(self.state.step) if self._host_ema is not None and dev is not None else 0
        while dev is not None:
            state, metrics = self._jit_train(self.state, dev, step_rng)
            self.state = state
            last = self.max_steps_per_epoch and n + 1 >= self.max_steps_per_epoch
            th0 = time.time()
            nxt = None if last else next(host_it, None)
            t_host += time.time() - th0
            dev = self._stage_batch(*nxt) if nxt is not None else None
            if self._host_ema is not None:
                self._enqueue_host_ema(ema_step0 + n)
            pending.append(metrics)
            if len(pending) >= max(1, self.metric_fetch_every):
                drain()
            n += 1
        drain()
        self._release_ring()
        if not losses:
            raise ValueError('Empty training epoch - no batches produced.')
        loss = float(robust_fetch(jnp.mean(jnp.stack(losses))))
        elapsed = time.time() - t0
        out = {
            'train_loss': loss,
            'train_steps_per_sec': n / max(elapsed, 1e-9),
            'lr_step': int(self.state.step),
            # The actual learning-rate VALUE, not just the step counter —
            # the reference's LRMonitor callback role (scripts/config/
            # training/callbacks/lr_monitor.yaml): this is what lets a run's
            # metrics.jsonl show the plateau controller reducing the LR.
            'lr': self.current_lr(),
            'host_loader_frac': round(t_host / max(elapsed, 1e-9), 4),
        }
        self.metrics_logger.log(out, step=epoch)
        self.metrics_logger.log_confusion(cmat, epoch, prefix=f'{TRAIN}_all')
        return out

    def current_lr(self) -> float:
        """Effective learning rate of the most recent optimizer update,
        recomputed host-side (no device fetch). 'expdecay' re-evaluates the
        warmup/decay schedule at the applied-optimizer-step count (micro
        steps / accumulation factor — gradient accumulation holds the LR
        across the k micro-steps of one update, so the count matches what
        optax's inner schedule saw); 'plateau' is the base LR times the
        controller's current scale. Reference role: the LearningRateMonitor
        callback (scripts/config/training/callbacks/lr_monitor.yaml)."""
        if self.plateau is not None:
            return float(self.lr * self.plateau.scale)
        if self.scheduler != 'expdecay':
            return float(self.lr)
        k = max(1, self.accumulate_grad_batches)
        # exp_warmup_schedule evaluates at count+1; the most recent update
        # had 0-based count (applied_steps - 1), i.e. 1-based step = applied.
        step = max(int(self.state.step) // k, 1)
        if step <= self.warmup_steps:
            return float(self.lr * step / self.warmup_steps)
        return float(self.lr * math.exp(-(step - self.warmup_steps) / self.tau))

    def _release_ring(self) -> None:
        """Release the staging ring's device references: without this the
        last ``stage_ring`` staged batches stay pinned in HBM through the
        eval matrix and checkpointing (and, after an eval-transport matrix
        pass, through the whole next train epoch). Block first — a
        still-inflight transfer guards its pooled host buffer via this
        same list."""
        if getattr(self, '_ring_inflight', None):
            for j, d in enumerate(self._ring_inflight):
                if d is not None:
                    jax.block_until_ready(d)
                    self._ring_inflight[j] = None

    def _enqueue_host_ema(self, step_before: int) -> None:
        """CPU-offloaded mirror of the in-graph EMA update (same semantics:
        frozen at the init copy until ema_start_step, then exponential).

        The fold itself is deferred to the metric drain: a per-step
        ``device_get`` here would block on the just-dispatched step, pinning
        the staging pipeline to one transfer in flight and making the
        ``metric_fetch_every``/``stage_ring`` knobs inert. Instead the step's
        param refs start a non-blocking D2H copy and queue for
        ``_drain_host_ema`` — the per-step EMA recurrence is applied there
        in order, bit-identical to the eager update."""
        k = max(1, self.accumulate_grad_batches)
        # Mirror the in-graph EMA's accumulation gating (train/step.py):
        # fold only on micro-steps where MultiSteps applied the optimizer
        # (params are unchanged on the other k-1, and folding there would
        # compound the decay to ema_decay^k), and count ema_start_step in
        # OPTIMIZER steps. step_before and opt_state restore together, so
        # the modulo stays aligned across resume.
        if (step_before + 1) % k != 0:
            return
        if step_before // k < self.ema_start_step:
            return
        # The train step DONATES the state, so holding self.state.params refs
        # across the next dispatch would leave deleted arrays in the queue —
        # snapshot into fresh (non-donated) device buffers first. One jitted
        # async dispatch; params are small next to the activations.
        if self._ema_snapshot_fn is None:
            self._ema_snapshot_fn = jax.jit(
                lambda p: jax.tree_util.tree_map(jnp.copy, p)
            )
        params = self._ema_snapshot_fn(self.state.params)
        for leaf in jax.tree_util.tree_leaves(params):
            copy_async = getattr(leaf, 'copy_to_host_async', None)
            if copy_async is not None:
                copy_async()
        self._ema_pending.append(params)
        # Bound the queue's HBM footprint (each entry pins a param-tree
        # copy): fold entries older than the pipeline depth eagerly — their
        # async D2H finished steps ago, so this blocks on nothing.
        while len(self._ema_pending) > max(2, self.stage_ring):
            self._fold_host_ema(self._ema_pending.pop(0))

    def _fold_host_ema(self, params) -> None:
        d = self.ema_decay
        host = jax.device_get(params)

        def fold(e, p):
            # In place into the owned EMA buffers: a tree_map allocating
            # 2-3 fresh arrays per leaf per optimizer step pays the
            # sandboxed host's ~12 MB/s first-touch page-fault tax.
            # device_get/seeded leaves can be READ-ONLY numpy views — copy
            # once on first touch; the owned buffer is reused thereafter.
            if not e.flags.writeable:
                e = np.array(e)
            np.multiply(e, d, out=e)
            p = np.asarray(p)
            if p.flags.writeable:
                np.multiply(p, 1.0 - d, out=p)
                e += p
            else:
                e += (1.0 - d) * p
            return e

        self._host_ema = jax.tree_util.tree_map(fold, self._host_ema, host)

    def _drain_host_ema(self) -> None:
        for params in self._ema_pending:
            self._fold_host_ema(params)
        self._ema_pending.clear()

    # ------------------------------------------------------------------
    def _eval_params(self):
        if self.ema_decay is None or not self.eval_with_ema:
            return self.state.params
        if self._host_ema is not None:
            # One explicit H2D transfer per eval/predict pass; returning the
            # host numpy tree directly would re-upload the full parameter
            # set on EVERY jitted call (once per batch per signal subset).
            if self.mesh is not None:
                from ..parallel.mesh import replicate

                return replicate(self.mesh, self._host_ema)
            return jax.device_put(self._host_ema)
        if self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def _run_eval(self, loader, subsets: tuple[tuple[str, ...], ...] = (), batch_size: int | None = None):
        """ONE pass over a loader: each batch is read from parquet and
        transferred to device once, then evaluated under the full modality
        set plus every requested signal subset. The presence-mask eval graph
        makes the subsets free of reloads and retraces (the reference
        re-runs the whole loader per subset, trainer/main.py:188-224).
        Returns ``{None: (loss, cmat), subset: (loss, cmat), ...}``."""
        keys: list = [None, *subsets]
        losses: dict = {k: [] for k in keys}
        cmats = {k: np.zeros((self.num_classes, self.num_classes), np.int64) for k in keys}
        params = self._eval_params()

        def presence(key, x, B):
            if key is None:
                return None
            masks = {k: np.full((B,), k in key, dtype=bool) for k in x}
            if self.mesh is not None:
                import jax as _jax

                if _jax.process_count() > 1:
                    # B counts PROCESS-LOCAL padded rows; the jitted eval
                    # consumes the GLOBAL batch, so the masks must be
                    # assembled the same way the batch itself is.
                    from ..parallel.mesh import global_batch_from_local

                    return global_batch_from_local(self.mesh, masks)
            return masks

        # Same software pipeline as train_epoch, including the deferred
        # drain (round-3 fixed the train loop but left eval with a per-batch
        # fetch, which bounded eval to ONE transfer in flight — the host
        # could not stage batch n+2 until every subset of batch n had been
        # fetched): dispatch every subset's eval on the current batch
        # (async), stage the next batch's H2D transfer under that compute,
        # and only fetch every ``eval_fetch_every`` batches. Lossless eval
        # batches are fresh loader arrays (no pooled host slots, no reuse
        # guard); under ``eval_transport`` the codes live in pooled ring
        # slots, so reuse takes the same block-on-prior-transfer guard as
        # the train ring (slots are namespaced per transport, so a trainer
        # whose TRAIN transport also pools the ring never collides).
        # Pending results are tiny (loss scalar + [C,C] cmat + preds).
        def stage(nxt):
            if nxt is None:
                return None
            x, y, _ = self._pad_batch(*nxt, self._batch_target(nxt[1].shape[0], batch_size))
            slot_idx = None
            if self.eval_transport is not None:
                from ..ops.q8_transport import encode_batch, encode_batch_q16

                enc = {'q16': encode_batch_q16, 'q8': encode_batch}[self.eval_transport]
                ring, slot_idx = self._ring_slot()
                x = enc(x, slot=ring.setdefault(('eval', self.eval_transport), {}))
            dev = self._device_batch(x, y)
            if slot_idx is not None:
                self._ring_inflight[slot_idx] = dev
            return dev, x, y.shape[0]

        pending: list = []

        def drain():
            for key, out in pending:
                cmat = robust_fetch(out['cmat']).astype(np.int64)
                # Weight each batch's mean loss by its scored-epoch count
                # (the cmat total): an unweighted mean of batch means lets
                # a 1-night final partial batch count as much as a full
                # batch, biasing val_loss — and early stopping / best-
                # checkpoint selection with it. The reference's Lightning
                # on_epoch reduction is sample-weighted the same way.
                losses[key].append((float(robust_fetch(out['loss'])), int(cmat.sum())))
                cmats[key] += cmat
            pending.clear()

        host_it = iter(loader)
        staged = stage(next(host_it, None))
        n = 0
        while staged is not None:
            batch, x_host, B = staged
            pending.extend(
                (key, self._jit_eval(params, self.state.batch_stats, batch, presence(key, x_host, B)))
                for key in keys
            )
            staged = stage(next(host_it, None))
            n += 1
            if n % max(1, self.eval_fetch_every) == 0:
                drain()
        drain()
        self._release_ring()
        def wmean(pairs):
            total = sum(n for _, n in pairs)
            if not pairs or total == 0:
                return float('nan')
            return float(sum(l * n for l, n in pairs) / total)

        return {k: (wmean(losses[k]), cmats[k]) for k in keys}

    def _subset_matrix(self, ds_name: str, mode: str) -> list[tuple[str, ...]]:
        """Signal subsets to evaluate per dataset (reference
        trainer/main.py:188-224)."""
        if not (self.unified and self.eval_subsets):
            return []
        valid = set(self.model.valid_signals)
        cols = set(self.datamodule.columns)
        subsets: list[tuple[str, ...]] = []
        if ECG in cols and ECG in valid:
            subsets.append((ECG,))
            ecg_thx_ok = THX in cols and THX in valid
            if mode == VAL:
                if ecg_thx_ok and ds_name in (SHHS, MESA):
                    subsets.append((ECG, THX))
            elif ecg_thx_ok:
                subsets.append((ECG, THX))
        if PPG in cols and PPG in valid and ds_name in (MESA, CFS, CCSHS, CHAT):
            subsets.append((PPG,))
            if THX in cols and THX in valid and ds_name == MESA:
                subsets.append((PPG, THX))
        return subsets

    def evaluate(self, mode: str = VAL, epoch: int | None = None) -> dict[str, float]:
        """Full eval matrix; returns flat metrics incl. ``{mode}_loss``."""
        epoch = self.current_epoch if epoch is None else epoch
        loaders = self.datamodule.val_loaders() if mode == VAL else self.datamodule.test_loaders()
        eval_bs = getattr(
            self.datamodule, 'val_batch_size' if mode == VAL else 'test_batch_size', None
        )
        results: dict[str, float] = {}
        # Per-loader wall times (instrumentation: the eval matrix re-forwards
        # the val set once per loader with all subsets sharing the pass —
        # these say what fraction of an epoch the matrix costs on a
        # transfer-bound host). Logged to metrics.jsonl, NOT returned:
        # returned metrics must be comparable across equivalent runs.
        timings: dict[str, float] = {}
        t_eval0 = time.time()
        for ds_name, loader in loaders:
            # Identify the combined loader by NAME: when the combined fps
            # list is empty, val_loaders() skips it and index 0 would be a
            # per-dataset loader mislabeled as the global val_loss.
            is_combined = mode == VAL and ds_name == 'all'
            subsets = () if is_combined else tuple(self._subset_matrix(ds_name, mode))
            stats = self._run_eval(loader, subsets, batch_size=eval_bs)
            timings[f'{mode}_eval_seconds_{ds_name}'] = round(time.time() - t_eval0, 3)
            t_eval0 = time.time()
            loss, cmat = stats[None]
            if is_combined:
                results[f'{mode}_loss'] = loss
            else:
                results[f'{mode}_loss_{ds_name}'] = loss
            self.metrics_logger.log_confusion(cmat, epoch, prefix=f'{mode}_{ds_name}')
            for subset in subsets:
                sig_prefix = '_'.join(subset)
                loss_s, cmat_s = stats[subset]
                results[f'{mode}_{sig_prefix}_loss_{ds_name}'] = loss_s
                self.metrics_logger.log_confusion(cmat_s, epoch, prefix=f'{mode}_{sig_prefix}_{ds_name}')
        if mode == VAL and self.shadow_eval_transport is not None:
            # One extra pass over the val loaders under the shadow transport
            # (no signal subsets — only the selection metric is at stake).
            # The aggregation mirrors the primary val_loss exactly: the
            # combined loader when present, else the per-dataset mean.
            saved = self.eval_transport
            self.eval_transport = self.shadow_eval_transport
            t_shadow = time.time()
            try:
                combined = None
                per_ds = []
                for ds_name, loader in self.datamodule.val_loaders():
                    loss, _ = self._run_eval(loader, (), batch_size=eval_bs)[None]
                    if ds_name == 'all':
                        combined = loss
                    else:
                        per_ds.append(loss)
            finally:
                self.eval_transport = saved
            if combined is not None or per_ds:
                timings[f'{mode}_loss_{self.shadow_eval_transport}'] = float(
                    combined if combined is not None else np.mean(per_ds)
                )
            timings[f'{mode}_shadow_eval_seconds'] = round(time.time() - t_shadow, 3)
        if mode == VAL and f'{mode}_loss' not in results:
            # No combined loader (e.g. census-only, which the combined list
            # excludes): early stopping / checkpoint selection still need a
            # global val_loss — use the per-dataset mean.
            per_ds = [v for k, v in results.items() if k.startswith(f'{mode}_loss_')]
            if per_ds:
                results[f'{mode}_loss'] = float(np.mean(per_ds))
                logger.warning(
                    'No combined val loader; val_loss is the mean of the '
                    'per-dataset val losses.'
                )
        self.metrics_logger.log({**results, **timings}, step=epoch)
        return results

    # ------------------------------------------------------------------
    def fit(self, resume_from: str | None = None) -> dict[str, float]:
        from .checkpointing import CheckpointManager

        # Remote-attached devices: keep the D2H reply stream warm through
        # the multi-minute train-step compile (utils.start_d2h_heartbeat —
        # an idle stream is reaped orchestrator-side and the first metric
        # fetch then blocks forever). No-op on local CPU backends.
        if jax.default_backend() not in ('cpu',):
            from ..utils import start_d2h_heartbeat

            start_d2h_heartbeat()

        ckpt = CheckpointManager(os.path.join(self.log_dir, 'checkpoints'))
        start_epoch = 0
        if resume_from:
            start_epoch = self.restore(resume_from, ckpt)
        if self.reset_early_stopping:
            self.early_stopping.reset()
        last_val: dict[str, float] = {}
        for epoch in range(start_epoch, self.epochs):
            self.current_epoch = epoch
            train_metrics = self.train_epoch(epoch)
            val_metrics = self.evaluate(VAL, epoch)
            last_val = val_metrics
            # A run with no validation data at all (no val loaders -> no
            # 'val_loss' key) is not a diverged run: train the full epoch
            # budget with early stopping disabled, as the reference does
            # when the monitor is absent. Only a PRESENT non-finite
            # val_loss means divergence.
            has_val = 'val_loss' in val_metrics
            val_loss = val_metrics.get('val_loss', float('nan'))
            logger.info(
                f'epoch {epoch}: train_loss={train_metrics["train_loss"]:.4f} val_loss={val_loss:.4f}'
            )
            if self.plateau is not None and np.isfinite(val_loss):
                scale = self.plateau.update(val_loss)
                self.state = _set_lr_scale(self.state, scale)
            # Update early stopping BEFORE checkpointing: the checkpoint
            # sidecar serializes the early-stop state, and saving the
            # pre-update best/wait means a resumed run restores a stale
            # best — a later worse epoch would then pass `is_best` and
            # OVERWRITE the true best checkpoint (and patience counting
            # would lose one epoch per resume). is_best is judged against
            # the best BEFORE this epoch folds in.
            is_best = val_loss <= self.early_stopping.best
            should_stop = (
                has_val and np.isfinite(val_loss) and self.early_stopping.update(val_loss)
            )
            ckpt.save(self, epoch, val_loss, is_best=is_best)
            if not has_val:
                continue
            if not np.isfinite(val_loss):
                # Lightning EarlyStopping check_finite role: a diverged run
                # (NaN/inf monitor) must stop, not burn the epoch budget.
                logger.warning(
                    f'Stopping at epoch {epoch}: non-finite val_loss ({val_loss}).'
                )
                break
            if should_stop:
                logger.info(f'Early stopping at epoch {epoch} (best val_loss {self.early_stopping.best:.4f}).')
                break
        return last_val

    def predict(self, loader) -> dict[str, np.ndarray]:
        """Prediction pass emitting ECG-only / ECG+THX / all-modality
        hypnograms plus labels (reference predict_step,
        trainer/main.py:226-240), via presence masks on one compiled graph."""
        params = self._eval_params()
        outputs: dict[str, list[np.ndarray]] = {'labels': [], 'preds': []}
        cols = set(self.datamodule.columns)
        want_ecg = ECG in cols
        want_ecg_thx = want_ecg and THX in cols
        for x, y in loader:
            outputs['labels'].append(np.asarray(y))
            # Pad partial batches to the mesh's data axis (ignore rows);
            # predictions are trimmed back to the real rows below.
            x, y_pad, B = self._pad_batch(x, y, self._batch_target(y.shape[0], None))
            Bp = y_pad.shape[0]
            batch = self._device_batch(x, y_pad)  # one transfer, all variants
            out = self._jit_eval(params, self.state.batch_stats, batch, None)
            outputs['preds'].append(robust_fetch(out['preds'])[:B])
            if want_ecg:
                present = {k: np.full((Bp,), k == ECG, bool) for k in x}
                out = self._jit_eval(params, self.state.batch_stats, batch, present)
                outputs.setdefault(f'preds_{ECG}', []).append(robust_fetch(out['preds'])[:B])
            if want_ecg_thx:
                present = {k: np.full((Bp,), k in (ECG, THX), bool) for k in x}
                out = self._jit_eval(params, self.state.batch_stats, batch, present)
                outputs.setdefault(f'preds_{ECG}_{THX}', []).append(robust_fetch(out['preds'])[:B])
        return {k: np.concatenate(v, axis=0) for k, v in outputs.items()}

    def restore(self, path: str, manager=None) -> int:
        from .checkpointing import CheckpointManager

        manager = manager or CheckpointManager(os.path.join(self.log_dir, 'checkpoints'))
        return manager.restore(self, path)

    def export(self, folder: str, config: dict) -> None:
        """Write the deployable checkpoint folder (config.yaml + weights) —
        the format ``api.load_model`` and the PyTorch reference consume."""
        from ..checkpoint import save_checkpoint_folder

        variables = {'params': jax.device_get(self._eval_params())}
        if self.state.batch_stats is not None:
            variables['batch_stats'] = jax.device_get(self.state.batch_stats)
        save_checkpoint_folder(folder, config, variables, torch_compat=True)


def _set_lr_scale(state: TrainState, scale: float) -> TrainState:
    """Return a new TrainState whose injected ``lr_scale`` hyperparam is
    replaced (functional rebuild of the ``optax.InjectHyperparamsState``
    node — no in-place mutation of optimizer internals)."""
    import optax

    inject_types = tuple(
        t
        for t in (
            getattr(optax, 'InjectHyperparamsState', None),
            getattr(optax, 'InjectStatefulHyperparamsState', None),
        )
        if t is not None
    )
    found = 0

    def rebuild(node):
        nonlocal found
        if isinstance(node, inject_types):
            if 'lr_scale' in node.hyperparams:
                found += 1
                hyperparams = {**node.hyperparams, 'lr_scale': jnp.asarray(scale, jnp.float32)}
                return node._replace(hyperparams=hyperparams)
            return node._replace(inner_state=rebuild(node.inner_state))
        if isinstance(node, tuple):
            rebuilt = [rebuild(o) for o in node]
            # NamedTuple states (MultiStepsState etc.) vs plain chain tuples.
            return type(node)(*rebuilt) if hasattr(node, '_fields') else tuple(rebuilt)
        if isinstance(node, list):
            return [rebuild(o) for o in node]
        return node

    new_opt_state = rebuild(state.opt_state)
    if not found:
        raise ValueError('No lr_scale hyperparam in the optimizer state (plateau scheduler not active?)')
    return state.replace(opt_state=new_opt_state)
