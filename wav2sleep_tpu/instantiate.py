"""Hydra-style ``_target_`` instantiation for model configs.

Checkpoint folders carry the architecture as a Hydra-format ``config.yaml``
whose ``_target_`` strings name the *reference's* torch classes
(reference api.py:85-91 re-instantiates them with hydra). We honour that
exact serialization format — including the original
``wav2sleep.models.*`` target names — but construct the JAX models instead,
so a reference checkpoint folder loads unmodified. No hydra dependency.
"""

from __future__ import annotations

from typing import Any, Callable

from .models import (
    MultiModalAttentionEmbedder,
    SequenceCNN,
    SignalEncoders,
    SleepPPGNet,
    Wav2Sleep,
    as_signal_map,
)


def _build_signal_encoders(**kw):
    kw['signal_map'] = as_signal_map(kw['signal_map'])
    kw.pop('input_dim', None)  # torch-only arg
    return SignalEncoders(**kw)


_TARGETS: dict[str, Callable] = {}


def _register(cls_or_fn, *names):
    for name in names:
        _TARGETS[name] = cls_or_fn


_register(
    lambda **kw: Wav2Sleep(**kw),
    'wav2sleep.models.wav2sleep.Wav2Sleep',
    'wav2sleep_tpu.models.wav2sleep.Wav2Sleep',
)
_register(
    _build_signal_encoders,
    'wav2sleep.models.wav2sleep.SignalEncoders',
    'wav2sleep_tpu.models.wav2sleep.SignalEncoders',
)
_register(
    lambda **kw: MultiModalAttentionEmbedder(**kw),
    'wav2sleep.models.wav2sleep.MultiModalAttentionEmbedder',
    'wav2sleep_tpu.models.wav2sleep.MultiModalAttentionEmbedder',
)
_register(
    lambda **kw: SequenceCNN(**kw),
    'wav2sleep.models.wav2sleep.SequenceCNN',
    'wav2sleep_tpu.models.wav2sleep.SequenceCNN',
)
_register(
    lambda **kw: SleepPPGNet(**kw),
    'wav2sleep.models.ppgnet.SleepPPGNet',
    'wav2sleep_tpu.models.ppgnet.SleepPPGNet',
)


def _build_masker(**kw):
    from .train.masker import SignalMasker

    return SignalMasker(**kw)


_register(
    _build_masker,
    'wav2sleep.trainer.masker.SignalMasker',
    'wav2sleep_tpu.train.masker.SignalMasker',
)


def model_family(cfg: dict) -> str:
    """'wav2sleep' or 'ppgnet' from a model config dict."""
    target = cfg.get('_target_', '')
    return 'ppgnet' if 'ppgnet' in target.lower() else 'wav2sleep'


def instantiate(cfg: Any):
    """Recursively instantiate a Hydra-style config node."""
    if isinstance(cfg, dict):
        if '_target_' in cfg:
            target = cfg['_target_']
            if target not in _TARGETS:
                raise ValueError(f'Unknown _target_: {target}. Known: {sorted(_TARGETS)}')
            kwargs = {}
            for k, v in cfg.items():
                if k in ('_target_', '_partial_'):
                    continue
                if isinstance(v, str) and '${' in v:
                    raise ValueError(
                        f'Unresolved interpolation {v!r} for key {k!r}; '
                        'checkpoint configs must be fully resolved.'
                    )
                kwargs[k] = instantiate(v)
            return _TARGETS[target](**kwargs)
        return {k: instantiate(v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [instantiate(v) for v in cfg]
    return cfg
