"""Quantized input transports: mu-law int8 (train) and linear int16 (eval).

The training step is transfer-bound on hosts where the device link is slow
relative to compute (see docs/design.md "Training performance"): at B=4 the
bf16 batch is ~25 MiB while the step computes in ~270 ms. This transport
ships each (night, signal) row as int8 mu-law codes against the row's own
peak — 1 byte/sample, half of bf16 — and reconstructs on device inside the
jitted train step, before the polarity-flip / modality-dropout
augmentations (mu-law is symmetric, so flipping after decode equals
flipping before encode).

Contract (shared with native/src/mulaw8.cpp):
    peak  = max |x| over finite samples of the row
    code  = round(sign(x) * 127 * log(1 + 255*|x|/peak) / log(256))
    x_hat = sign(code) * peak * (256^(|code|/127) - 1) / 255
A fully non-finite row (the -inf missing-modality sentinel,
src/wav2sleep/data/dataset.py:170-173 in the reference) ships as
(codes=0, peak=0, present=False) and decodes back to -inf. A MIXED row
(finite data plus non-finite samples) raises: the per-sample sentinel
cannot survive a 1-byte code, and the parquet training path never
produces one (short-night padding is 0.0 post-normalization; -inf only
appears as whole missing-modality rows).

Encoded batches are pytrees ``{signal: (codes[B,T] i8, peak[B] f32,
present[B] bool)}`` — every leaf is batch-leading, so the data-parallel
batch shardings apply unchanged.
"""

from __future__ import annotations

import math

import numpy as np

_LOG256 = math.log(256.0)
_CODES = 127

_np_thresholds: np.ndarray | None = None


def _thresholds_f32() -> np.ndarray:
    """t-domain rounding boundaries, bit-identical to the C++ kernel's."""
    global _np_thresholds
    if _np_thresholds is None:
        k = np.arange(1, _CODES + 1, dtype=np.float64)
        _np_thresholds = np.exp2((k - 0.5) * 8.0 / _CODES).astype(np.float32)
    return _np_thresholds


def encode_row_numpy(x: np.ndarray, out: np.ndarray | None = None):
    """Encode one row; returns (codes i8, peak f32, present bool).

    Matches the native kernel code-for-code: the rounding decision is a
    float32 threshold comparison, not a float64 log round-trip.
    """
    x = np.asarray(x, np.float32)
    finite = np.isfinite(x)
    if out is None:
        out = np.empty(x.shape, np.int8)
    if not finite.any():
        out[:] = 0
        return out, np.float32(0.0), False
    if not finite.all():
        # A per-sample -inf sentinel cannot survive the 1-byte transport
        # (it would encode as a full-scale code and decode as +/-peak,
        # turning padding into confident garbage). Rows must be fully
        # finite or fully non-finite; reject mixed rows loudly.
        raise ValueError(
            'q8 transport row mixes finite data with non-finite samples; '
            'the -inf sentinel is only supported for whole rows.'
        )
    # Single f32 divide, matching the C++ kernel (255.0f / peak): a
    # double-precision divide rounded to f32 can differ by one ULP and
    # flip threshold-adjacent codes between backends.
    peak = np.float32(np.abs(x).max())
    scale = np.float32(255.0) / (peak if peak > 0 else np.float32(1.0))
    a = np.abs(x) * scale
    t = (1.0 + np.minimum(a, np.float32(255.0))).astype(np.float32)
    k = np.searchsorted(_thresholds_f32(), t, side='right').astype(np.int8)
    np.negative(k, out=out, where=np.signbit(x))
    np.copyto(out, k, where=~np.signbit(x))
    return out, np.float32(peak), True


def _native_encoder():
    from ..native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, 'w2s_mulaw8_encode_f32'):
        return None
    return lib


def encode_batch(
    x: dict[str, np.ndarray],
    slot: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] | None = None,
) -> dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Encode a host batch ``{signal: f32 [B, T]}`` into the q8 transport.

    ``slot`` is an optional pooled-output dict (same tree, pre-allocated
    int8/f32/bool buffers) reused across steps to avoid fresh large
    allocations; it is created/resized on demand.
    """
    lib = _native_encoder()
    out: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    if slot is None:
        slot = {}
    for name, arr in x.items():
        arr = np.ascontiguousarray(arr, np.float32)
        B = arr.shape[0]
        bufs = slot.get(name)
        if bufs is None or bufs[0].shape != arr.shape:
            bufs = (
                np.empty(arr.shape, np.int8),
                np.empty((B,), np.float32),
                np.empty((B,), bool),
            )
            slot[name] = bufs
        codes, peaks, present = bufs
        if lib is not None:
            import ctypes

            pk = ctypes.c_float()
            for b in range(B):
                ok = lib.w2s_mulaw8_encode_f32(
                    arr[b], arr.shape[1], codes[b], ctypes.byref(pk)
                )
                if ok < 0:
                    raise ValueError(
                        'q8 transport row mixes finite data with non-finite '
                        'samples; the -inf sentinel is only supported for '
                        'whole rows.'
                    )
                peaks[b] = pk.value
                present[b] = bool(ok)
        else:
            for b in range(B):
                _, peaks[b], present[b] = encode_row_numpy(arr[b], out=codes[b])
        out[name] = (codes, peaks, present)
    return out


_Q16_CODES = 32767


def encode_batch_q16(
    x: dict[str, np.ndarray],
    slot: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] | None = None,
) -> dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Linear int16 transport: codes = round(x / peak * 32767) per row.

    Half the bytes of f32 at ~peak/65534 absolute error (the z-scored
    parquet rows peak at a few sigma, so ~1e-4) — near-lossless where the
    mu-law q8 rung is a measured quality tax. Same pytree contract and
    -inf whole-row sentinel rules as ``encode_batch``; same ``slot``
    buffer pooling. Encoding is one vectorized numpy pass over [B, T]
    (no native kernel needed: no per-sample transcendentals).
    """
    out: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    if slot is None:
        slot = {}
    for name, arr in x.items():
        arr = np.ascontiguousarray(arr, np.float32)
        B = arr.shape[0]
        bufs = slot.get(name)
        if bufs is None or bufs[0].shape != arr.shape:
            bufs = (
                np.empty(arr.shape, np.int16),
                np.empty((B,), np.float32),
                np.empty((B,), bool),
            )
            slot[name] = bufs
        codes, peaks, present = bufs
        # Pooled [B, T] scratch (one f32 + one bool per signal): this runs
        # on the eval staging hot path of a host where fresh large
        # allocations page-fault at ~12 MB/s, so every full-size temporary
        # is chained in place through these two buffers.
        scratch = slot.get(('_scratch16', name))
        if scratch is None or scratch[0].shape != arr.shape:
            scratch = (np.empty(arr.shape, np.float32), np.empty(arr.shape, bool))
            slot[('_scratch16', name)] = scratch
        f32s, finite = scratch
        np.isfinite(arr, out=finite)
        row_all = finite.all(axis=1)
        if (finite.any(axis=1) & ~row_all).any():
            raise ValueError(
                'q16 transport row mixes finite data with non-finite '
                'samples; the -inf sentinel is only supported for whole rows.'
            )
        np.copyto(present, row_all)
        np.abs(arr, out=f32s)
        peaks[:] = f32s.max(axis=1, where=finite, initial=np.float32(0.0))
        # f32 peak * (32767/peak) can exceed 32767 by a ULP; an unclipped
        # rint would wrap the int16 to -32768 (full-scale sign flip).
        scale = np.float32(_Q16_CODES) / np.maximum(peaks, np.float32(1e-30))
        np.multiply(arr, scale[:, None], out=f32s)
        np.rint(f32s, out=f32s)
        np.clip(f32s, -_Q16_CODES, _Q16_CODES, out=f32s)
        if not row_all.all():
            f32s[~row_all] = 0.0
        codes[:] = f32s
        out[name] = (codes, peaks, present)
    return out


def dequant_q8(codes, peak, present):
    """Device-side decode (jittable). Missing rows decode to -inf columns
    (the cross-layer missing-modality sentinel)."""
    import jax.numpy as jnp

    c = codes.astype(jnp.float32)
    mag = jnp.expm1(jnp.abs(c) * (_LOG256 / _CODES)) * (1.0 / 255.0)
    x = jnp.sign(c) * mag * peak[:, None]
    return jnp.where(present[:, None], x, -jnp.inf)


def dequant_q16(codes, peak, present):
    """Device-side linear int16 decode (jittable); -inf for missing rows."""
    import jax.numpy as jnp

    x = codes.astype(jnp.float32) * (peak * (1.0 / _Q16_CODES))[:, None]
    return jnp.where(present[:, None], x, -jnp.inf)


def dequant_batch(x: dict) -> dict:
    """Decode an encoded batch pytree back to ``{signal: f32 [B, T]}``.

    Dispatches per signal on the (static under trace) code dtype: int8 is
    the mu-law rung, int16 the linear rung.
    """

    def _one(codes, peak, present):
        if codes.dtype == 'int8':
            return dequant_q8(codes, peak, present)
        return dequant_q16(codes, peak, present)

    return {k: _one(*v) for k, v in x.items()}


def is_encoded_batch(x: dict) -> bool:
    return bool(x) and all(isinstance(v, tuple) and len(v) == 3 for v in x.values())
