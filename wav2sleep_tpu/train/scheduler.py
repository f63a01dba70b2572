"""Learning-rate schedules.

``exp_warmup_schedule`` mirrors the reference's ExpWarmUpScheduler
(src/wav2sleep/trainer/scheduler.py:7-32): linear warm-up to ``lr_max`` then
``exp(-(step - warmup)/tau)`` decay. The reference's torch scheduler computes
the LR for optimizer-step ``k`` (1-based) as ``last_epoch + 1``; optax calls
the schedule with a 0-based update count, so we evaluate at ``count + 1`` —
resume-correctness comes for free since the count lives in the optimizer
state (checkpointed), the same fix the reference makes by using
``last_epoch`` instead of ``_step_count``.

``ReduceLROnPlateau`` (scripts/config/training/scheduler/decay.yaml) is a
host-side controller: pair ``plateau_controller`` with an
``optax.inject_hyperparams`` optimizer and scale the LR between epochs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def exp_warmup_schedule(lr_max: float, warmup_steps: int, tau: float):
    """Linear warm-up then exponential decay (reference parity)."""

    def schedule(count):
        step = count + 1
        warm = lr_max * step / warmup_steps
        decay = lr_max * jnp.exp(-(step - warmup_steps) / tau)
        return jnp.where(step <= warmup_steps, warm, decay)

    return schedule


@dataclass
class PlateauController:
    """Host-side ReduceLROnPlateau (mode=min), matching torch defaults used
    by the reference config (factor 0.1, patience 2, threshold 1e-5).

    ``min_lr`` is a floor on the EFFECTIVE learning rate (torch semantics:
    ``new_lr = max(old_lr * factor, min_lr)``) — the controller tracks a
    multiplicative *scale*, so the floor is applied as ``min_lr /
    base_lr``; pass the schedule's base LR via ``base_lr``."""

    factor: float = 0.1
    patience: int = 2
    threshold: float = 1e-5
    min_lr: float = 0.0
    base_lr: float = 1.0

    best: float = float('inf')
    num_bad_epochs: int = 0
    scale: float = 1.0

    def update(self, metric: float) -> float:
        """Feed the monitored metric; returns the current LR scale."""
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                min_scale = self.min_lr / self.base_lr if self.base_lr > 0 else 0.0
                self.scale = max(self.scale * self.factor, min_scale)
                self.num_bad_epochs = 0
        return self.scale

    def state_dict(self) -> dict:
        return {'best': self.best, 'num_bad_epochs': self.num_bad_epochs, 'scale': self.scale}

    def load_state_dict(self, state: dict) -> None:
        self.best = state['best']
        self.num_bad_epochs = state['num_bad_epochs']
        self.scale = state['scale']
