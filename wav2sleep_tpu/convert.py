"""PyTorch checkpoint -> JAX parameter conversion.

The reference distributes models as ``config.yaml`` + ``state_dict.pth``
(src/wav2sleep/log.py:63-83, api.py:85-95, hub.py:38-64). This module maps
those PyTorch ``state_dict`` keys onto the flax parameter trees produced by
``wav2sleep_tpu.models`` so released checkpoints run with numerical parity.

Layout conversions:
- Conv1d weight ``[out, in, k]``   -> kernel ``[k, in, out]``  (transpose 2,1,0)
- Linear weight ``[out, in]``      -> kernel ``[in, out]``      (transpose)
- ConvLayerNorm/RMS weight [1,C,1] -> scale ``[C]``
- BatchNorm running stats          -> the ``batch_stats`` collection
- nn.MultiheadAttention packed ``in_proj_weight`` [3F, F] -> in_proj kernel
  ``[F, 3F]`` (our attention splits q/k/v after one fused matmul, same math).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

_DENSE_PARENTS = {'linear', 'linear1', 'linear2', 'out_proj', 'classifier', 'dense', 'in_proj'}
_NORM_PARENTS = {'norm', 'norm1', 'norm2', 'output_norm'}

_REWRITES_WAV2SLEEP = [
    (re.compile(r'(^|\.)encoders\.([^.]+)\.'), r'\1encoders_\2.'),
    (re.compile(r'(^|\.)cnn\.(\d+)\.'), r'\1cnn_\2.'),
    (re.compile(r'(^|\.)transformer_encoder\.layers\.(\d+)\.'), r'\1transformer_encoder.layers_\2.'),
    (re.compile(r'(^|\.)dilated_convs\.(\d+)\.'), r'\1blocks_\2.'),
    (re.compile(r'(^|\.)conv_layers\.(\d+)\.'), r'\1convs_\2.'),
]

_REWRITES_PPGNET = [
    (re.compile(r'^conv_block\.model\.(\d+)\.'), r'conv_block_\1.'),
    (re.compile(r'^dilated_convs\.(\d+)\.'), r'dilated_\1.'),
    (re.compile(r'(^|\.)conv_layers\.(\d+)\.'), r'\1convs_\2.'),
    (re.compile(r'^dense\.linear\.'), r'dense.'),
]


def _rewrite(key: str, family: str) -> str:
    rules = _REWRITES_WAV2SLEEP if family == 'wav2sleep' else _REWRITES_PPGNET
    for pat, repl in rules:
        key = pat.sub(repl, key)
    return key


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _convert_entry(key: str, w: np.ndarray, family: str):
    """Return (collection, path, array) for one torch state_dict entry."""
    key = _rewrite(key, family)
    parts = key.split('.')
    leaf = parts[-1]
    parent = parts[-2] if len(parts) > 1 else ''

    # Torch module attribute 'model.' prefixes never exist in our trees.
    if leaf == 'num_batches_tracked':
        return 'skip', (), None

    if leaf == 'register_tokens':
        return 'params', tuple(parts), w

    if leaf == 'in_proj_weight':
        return 'params', tuple(parts[:-1]) + ('in_proj', 'kernel'), w.T
    if leaf == 'in_proj_bias':
        return 'params', tuple(parts[:-1]) + ('in_proj', 'bias'), w

    if parent == 'embedder' and leaf == 'weight':
        return 'params', tuple(parts[:-1]) + ('embedding',), w

    # Group norm nests one more level in torch (ConvGroupNorm.norm holds the
    # actual nn.GroupNorm): '<x>.norm.norm.weight' -> '<x>/norm/GroupNorm_0/
    # scale' (flax auto-names the nested module GroupNorm_0; parts[:-2]
    # already ends with the outer 'norm').
    if len(parts) >= 3 and parts[-2] == 'norm' and parts[-3] == 'norm':
        base = tuple(parts[:-2]) + ('GroupNorm_0',)
        if leaf == 'weight':
            return 'params', base + ('scale',), w
        if leaf == 'bias':
            return 'params', base + ('bias',), w

    if parent in _NORM_PARENTS:
        base = tuple(parts[:-1])
        if leaf == 'weight':
            return 'params', base + ('scale',), w.reshape(-1) if w.ndim == 3 else w
        if leaf == 'bias':
            return 'params', base + ('bias',), w.reshape(-1) if w.ndim == 3 else w
        if leaf == 'running_mean':
            return 'batch_stats', base + ('mean',), w
        if leaf == 'running_var':
            return 'batch_stats', base + ('var',), w

    if leaf == 'weight':
        if parent in ('conv', 'downsample'):
            return 'params', tuple(parts[:-1]) + ('kernel',), np.transpose(w, (2, 1, 0))
        if parent in _DENSE_PARENTS:
            return 'params', tuple(parts[:-1]) + ('kernel',), w.T
        raise ValueError(f'Unrecognised weight entry: {key} (shape {w.shape})')
    if leaf == 'bias':
        return 'params', tuple(parts), w

    raise ValueError(f'Unrecognised state_dict entry: {key} (shape {w.shape})')


def convert_state_dict(state_dict: dict[str, Any], family: str = 'wav2sleep') -> dict:
    """Convert a torch ``state_dict`` into flax ``variables``.

    Args:
        state_dict: mapping of torch parameter names to arrays/tensors.
        family: 'wav2sleep' or 'ppgnet' (key-layout differs slightly).

    Returns:
        ``{'params': ..., 'batch_stats': ...}`` nested plain-dict tree
        (batch_stats only present when the checkpoint has running stats).
    """
    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        w = np.asarray(getattr(value, 'numpy', lambda: value)() if hasattr(value, 'numpy') else value)
        dest, path, arr = _convert_entry(key, np.asarray(w, dtype=np.float32), family)
        if dest == 'skip':
            continue
        _set(params if dest == 'params' else batch_stats, path, arr)
    variables = {'params': params}
    if batch_stats:
        variables['batch_stats'] = batch_stats
    return variables


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a ``state_dict.pth`` into numpy arrays (torch CPU required)."""
    import torch

    sd = torch.load(path, map_location='cpu', weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def tree_shapes(tree, prefix=()) -> dict[tuple, tuple]:
    """Flatten a nested dict tree into {path: shape} for validation."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def check_compatible(converted: dict, expected: dict) -> None:
    """Raise with a readable diff if converted variables don't match the
    model's expected structure (from ``jax.eval_shape(model.init, ...)``)."""
    got = tree_shapes(converted)
    want = tree_shapes(expected)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatched = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    if missing or extra or mismatched:
        lines = []
        if missing:
            lines.append('Missing in checkpoint: ' + ', '.join('/'.join(p) for p in missing[:10]))
        if extra:
            lines.append('Unexpected in checkpoint: ' + ', '.join('/'.join(p) for p in extra[:10]))
        if mismatched:
            lines.append(
                'Shape mismatches: '
                + ', '.join(f"{'/'.join(k)}: {got[k]} vs {want[k]}" for k in mismatched[:10])
            )
        raise ValueError('Checkpoint/model structure mismatch:\n' + '\n'.join(lines))
