"""Modality dropout (SignalMasker) as a pure jittable transform.

Functional re-design of the reference masker (src/wav2sleep/trainer/masker.py:5-51):
per-night Bernoulli channel dropout with per-signal probabilities, with a
guarantee that at least one channel survives — when a night's channels are
all missing-or-dropped, one surviving channel is resampled one-hot from the
``backups`` list (or from available channels weighted by keep-probability).

The reference raises on degenerate nights (all signals missing / no backup
available); under ``jit`` value-dependent raising is impossible, so those
rows deterministically keep their original availability instead (a strictly
safer fallback), and ``validate_batch`` provides the eager-mode check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float('-inf')


def validate_batch(signals: dict) -> None:
    """Eager-mode validation mirroring the reference's error conditions."""
    import numpy as np

    missing = np.stack([np.isinf(np.asarray(x)[:, 0]) for x in signals.values()], axis=-1)
    if missing.all(axis=-1).any():
        raise ValueError('Found batch element with all signals unavailable.')


class SignalMasker:
    """Callable masker: ``masker(rng, signals) -> masked signals``.

    Args:
        dropouts: per-signal drop probability (e.g. ABD .7, THX .7, ECG .5,
            PPG .1 — scripts/config/inputs/cardiorespiratory/all.yaml).
        backups: signals eligible for guaranteed-survivor resampling.
    """

    def __init__(self, dropouts: dict[str, float], backups: list[str] | None = None):
        for name, p in dropouts.items():
            if p < 0.0 or p > 1.0:
                raise ValueError(f'channel_dropout={p} for {name} is not a valid probability.')
        self.channel_dropouts = dict(dropouts)
        self.backup_channels = list(backups) if backups is not None else None

    def __call__(self, rng: jax.Array, signals: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
        names = list(signals.keys())
        some_x = signals[names[0]]
        B = some_x.shape[0]
        dtype = some_x.dtype

        z_cols = [jnp.isinf(signals[n][:, 0]) for n in names]  # True = missing
        z_BC = jnp.stack(z_cols, axis=-1)
        p = jnp.asarray([self.channel_dropouts.get(n, 0.0) for n in names], dtype=jnp.float32)

        # Backup sampling weights per row.
        if self.backup_channels is not None:
            onehot_w = jnp.stack(
                [(~z) if n in self.backup_channels else jnp.zeros(B, bool) for n, z in zip(names, z_cols)],
                axis=-1,
            ).astype(jnp.float32)
        else:
            onehot_w = ((~z_BC).astype(jnp.float32)) * (1.0 - p)[None, :]

        rng_keep, rng_backup = jax.random.split(rng)
        keep_BC = jax.random.bernoulli(rng_keep, (1.0 - p)[None, :], shape=(B, len(names)))

        # One-hot survivor per row from the backup distribution.
        has_backup = onehot_w.sum(axis=-1) > 0
        logits = jnp.where(onehot_w > 0, jnp.log(jnp.maximum(onehot_w, 1e-30)), -jnp.inf)
        # Guard fully -inf rows (no backup) with uniform logits; result unused.
        safe_logits = jnp.where(has_backup[:, None], logits, 0.0)
        survivor = jax.random.categorical(rng_backup, safe_logits, axis=-1)
        survivor_BC = jax.nn.one_hot(survivor, len(names), dtype=bool)

        all_zero = jnp.logical_or(z_BC, ~keep_BC).all(axis=-1)
        use_survivor = all_zero & has_backup
        m_BC = jnp.where(use_survivor[:, None], survivor_BC, keep_BC)
        # No backup available: keep original availability untouched.
        m_BC = jnp.where((all_zero & ~has_backup)[:, None], ~z_BC, m_BC)

        out = {}
        for i, n in enumerate(names):
            drop = ~m_BC[:, i]
            out[n] = jnp.where(drop[:, None], jnp.asarray(NEG_INF, dtype), signals[n])
        return out


def invert_signals(rng: jax.Array, signals: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
    """Random polarity flip with p=0.5, independently per signal per night
    (reference trainer/main.py:342-353; improves lead-reversal robustness)."""
    out = {}
    keys = jax.random.split(rng, len(signals))
    for key, (name, x_BT) in zip(keys, signals.items()):
        flip = jax.random.bernoulli(key, 0.5, shape=(x_BT.shape[0], 1))
        sign = jnp.where(flip, -1.0, 1.0).astype(x_BT.dtype)
        out[name] = x_BT * sign
    return out
