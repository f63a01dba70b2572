"""Checkpoint serialization.

Two formats:
- Reference-compatible: ``config.yaml`` + ``state_dict.pth`` (read via
  wav2sleep_tpu.convert; written via ``export_torch_state_dict`` so
  checkpoints trained here remain loadable by the PyTorch reference).
- JAX-native: ``config.yaml`` + ``params.npz`` (flattened path->array), used
  when torch isn't available. Training state (opt state, EMA, PRNG, step)
  uses Orbax — see wav2sleep_tpu/train/loop.py.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import yaml

_SEP = '|'


def _flatten(tree: dict, prefix=()) -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[_SEP.join(prefix + (k,))] = np.asarray(v)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params_npz(path: str, variables: dict) -> None:
    np.savez(path, **_flatten(variables))


def load_params_npz(path: str) -> dict:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


_TARGET_TO_REFERENCE = {
    'wav2sleep_tpu.models.wav2sleep.Wav2Sleep': 'wav2sleep.models.wav2sleep.Wav2Sleep',
    'wav2sleep_tpu.models.wav2sleep.SignalEncoders': 'wav2sleep.models.wav2sleep.SignalEncoders',
    'wav2sleep_tpu.models.wav2sleep.MultiModalAttentionEmbedder': 'wav2sleep.models.wav2sleep.MultiModalAttentionEmbedder',
    'wav2sleep_tpu.models.wav2sleep.SequenceCNN': 'wav2sleep.models.wav2sleep.SequenceCNN',
    'wav2sleep_tpu.models.ppgnet.SleepPPGNet': 'wav2sleep.models.ppgnet.SleepPPGNet',
}


def reference_compatible_config(cfg: Any) -> Any:
    """Rewrite ``_target_`` names to the reference's module paths so the
    exported ``config.yaml`` instantiates under BOTH implementations
    (our instantiate registry accepts either spelling)."""
    if isinstance(cfg, dict):
        out = {k: reference_compatible_config(v) for k, v in cfg.items() if k != 'remat'}
        if '_target_' in out:
            out['_target_'] = _TARGET_TO_REFERENCE.get(out['_target_'], out['_target_'])
        return out
    if isinstance(cfg, list):
        return [reference_compatible_config(v) for v in cfg]
    return cfg


def save_checkpoint_folder(folder: str, config: dict, variables: dict, torch_compat: bool = True) -> None:
    """Write a deployable checkpoint folder (the format ``load_model`` and the
    reference's ``api.load_model`` consume)."""
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, 'config.yaml'), 'w') as f:
        yaml.safe_dump(config, f, sort_keys=False)
    if torch_compat:
        try:
            export_torch_state_dict(os.path.join(folder, 'state_dict.pth'), variables, config)
            return
        except ImportError:
            pass
    save_params_npz(os.path.join(folder, 'params.npz'), variables)


def export_torch_state_dict(path: str, variables: dict, config: dict | None = None) -> None:
    """Convert flax variables back into a PyTorch ``state_dict.pth``.

    Inverse of wav2sleep_tpu.convert.convert_state_dict — keeps checkpoints
    trained on TPU loadable by the upstream PyTorch implementation.
    """
    import torch

    from .convert import tree_shapes  # noqa: F401  (documentation cross-ref)

    family = 'wav2sleep'
    if config is not None and 'ppgnet' in str(config.get('_target_', '')).lower():
        family = 'ppgnet'

    flat_params = _flatten(variables.get('params', {}))
    flat_stats = _flatten(variables.get('batch_stats', {}))
    batch_norm_bases = {key.rsplit(_SEP, 1)[0] for key in flat_stats}
    sd: dict[str, Any] = {}
    for key, w in flat_params.items():
        w = np.asarray(w)
        parts = key.split(_SEP)
        leaf, parent = parts[-1], parts[-2] if len(parts) > 1 else ''
        base = key.rsplit(_SEP, 1)[0]
        value = _to_torch_value(key, w)
        # ConvLayerNorm/ConvRMSNorm store affine as [1, C, 1] in torch; batch
        # norm (has running stats) and transformer LayerNorms keep [C].
        if leaf in ('scale', 'bias') and parent == 'norm' and base not in batch_norm_bases:
            value = value.reshape(1, -1, 1)
        sd[_to_torch_key(key, family)] = torch.from_numpy(np.ascontiguousarray(value))
    for key, w in flat_stats.items():
        torch_key = _rename_structural(key.split(_SEP), family)
        leaf = torch_key[-1]
        name = 'running_mean' if leaf == 'mean' else 'running_var'
        sd['.'.join(torch_key[:-1]) + '.' + name] = torch.from_numpy(np.asarray(w))
        # torch also tracks num_batches_tracked; default zeros keeps
        # load_state_dict(strict=True) happy only if present.
        nb_key = '.'.join(torch_key[:-1]) + '.num_batches_tracked'
        if nb_key not in sd:
            sd[nb_key] = torch.tensor(0, dtype=torch.int64)
    torch.save(sd, path)


def _to_torch_value(key: str, w: np.ndarray) -> np.ndarray:
    parts = key.split(_SEP)
    leaf, parent = parts[-1], parts[-2] if len(parts) > 1 else ''
    if leaf == 'kernel':
        if w.ndim == 3:  # conv [k, in, out] -> [out, in, k]
            return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))
        return np.ascontiguousarray(w.T)  # dense [in, out] -> [out, in]
    del parent
    return np.ascontiguousarray(w)


def _rename_structural(parts: list[str], family: str) -> list[str]:
    out = []
    for p in parts:
        if p == 'GroupNorm_0':
            # ConvGroupNorm nests the actual norm one level deeper in torch
            # ('<x>.norm.norm.weight'); flax auto-named it GroupNorm_0
            # (inverse of convert._convert_entry's group-norm rule).
            out.append('norm')
        elif p.startswith('encoders_'):
            out += ['encoders', p[len('encoders_') :]]
        elif p.startswith('cnn_'):
            out += ['cnn', p[len('cnn_') :]]
        elif p.startswith('layers_'):
            out += ['layers', p[len('layers_') :]]
        elif p.startswith('blocks_'):
            out += ['dilated_convs', p[len('blocks_') :]]
        elif p.startswith('convs_'):
            out += ['conv_layers', p[len('convs_') :]]
        elif family == 'ppgnet' and p.startswith('conv_block_'):
            out += ['conv_block', 'model', p[len('conv_block_') :]]
        elif family == 'ppgnet' and p.startswith('dilated_'):
            out += ['dilated_convs', p[len('dilated_') :]]
        elif family == 'ppgnet' and p == 'dense':
            out += ['dense', 'linear']
        else:
            out.append(p)
    return out


def _to_torch_key(key: str, family: str) -> str:
    parts = _rename_structural(key.split(_SEP), family)
    leaf = parts[-1]
    parent = parts[-2] if len(parts) > 1 else ''
    base = parts[:-1]
    if leaf == 'register_tokens':
        return '.'.join(parts)
    if parent == 'in_proj':
        # ours: .../self_attn/in_proj/{kernel,bias} -> torch packed attrs
        name = 'in_proj_weight' if leaf == 'kernel' else 'in_proj_bias'
        return '.'.join(base[:-1]) + '.' + name
    if parent == 'embedder' and leaf == 'embedding':
        return '.'.join(base) + '.weight'
    if leaf == 'kernel':
        return '.'.join(base) + '.weight'
    if leaf == 'scale':
        return '.'.join(base) + '.weight'
    if leaf == 'bias':
        return '.'.join(base) + '.bias'
    return '.'.join(parts)
