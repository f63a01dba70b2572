"""Streaming EDF -> hypnogram inference pipeline (the production hot path).

Built for TPU-VM serving: the host does the minimum possible work per night
(int16 channel extraction + one fused scale pass + one gather/lerp resample,
all into pooled, page-warm buffers — fresh large allocations fault at
~12 MB/s on sandboxed VMs), per-recording z-score normalization and bf16
casting happen on-device inside the jitted forward, and host decode overlaps
device compute through a prefetch thread.

This is the engine behind ``bench.py`` and the high-throughput alternative
to the parquet-cached ``api.predict_on_folder`` path.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Callable, Iterable, Iterator

import numpy as np

from .data.edf import EdfFile, channel_norm_affine, get_column_match
from .data.preprocessing import resample_uniform
from .settings import COLS_TO_SAMPLES_PER_EPOCH

logger = logging.getLogger(__name__)


class NightDecoder:
    """EDF -> model-grid decoder with pooled buffers (single-threaded).

    Uses the fused C++ kernel (native/src/edf_decode.cpp: strided int16
    gather + affine + lerp straight off the memmap, one pass) when the
    native library is available; pooled-numpy otherwise.
    """

    def __init__(self, signals: list[str], max_length_hours: float = 10.0, use_native: bool = True):
        from .data.preprocessing import signal_target_grid
        from . import native

        self.signals = list(signals)
        self.max_length_hours = max_length_hours
        self._raw_pool: dict[int, np.ndarray] = {}
        self._lib = native.get_lib() if use_native else None
        self._grids = {
            col: np.ascontiguousarray(signal_target_grid(col, max_length_hours), dtype=np.float64)
            for col in self.signals
        }

    def _raw_buffer(self, n: int) -> np.ndarray:
        buf = self._raw_pool.get(n)
        if buf is None:
            buf = np.empty(n, dtype=np.float32)
            self._raw_pool[n] = buf
        return buf

    def decode_into(self, fp: str, out: dict[str, np.ndarray]) -> dict[str, bool]:
        """Decode + resample each signal of one night into caller-owned
        slices ``out[col]`` (each of length spe*epochs). Missing signals are
        filled with ``-inf``. Returns {col: present}."""
        present: dict[str, bool] = {}
        with EdfFile(fp) as f:
            labels = f.labels()
            units_map = {c.label: c.unit for c in f.header.channels}
            for col in self.signals:
                actual = get_column_match(col, labels, units_map=units_map, raise_error=False)
                if actual is None:
                    out[col].fill(-np.inf)
                    present[col] = False
                    continue
                ch = f.channel(actual)
                _, scale, offset = channel_norm_affine(col, ch.unit, ch.physical_min, ch.physical_max)
                fs = f.sampling_freq(actual)
                grid = self._grids[col]
                dst = out[col]
                if self._lib is not None and dst.flags.c_contiguous:
                    records = f._records  # [n_records, stride] int16 memmap
                    self._lib.w2s_decode_resample(
                        records,
                        f.header.n_records,
                        records.shape[1],
                        int(f._offsets[ch.index]),
                        ch.samples_per_record,
                        float(ch.digital_min),
                        float(ch.bitvalue),
                        float(ch.physical_min),
                        float(scale),
                        float(offset),
                        float(fs),
                        grid,
                        len(grid),
                        dst,
                    )
                else:
                    n = f.n_samples(actual)
                    raw = f.read_physical(actual, dtype=np.float32, out=self._raw_buffer(n))
                    if scale != 1.0:
                        raw *= np.float32(scale)
                    if offset != 0.0:
                        raw += np.float32(offset)
                    resample_uniform(raw, fs, col, self.max_length_hours, out=dst)
                present[col] = True
        return present


def make_streaming_forward(model, precision: str = 'bfloat16', normalize: str | bool = 'zscore') -> Callable:
    """Jitted forward: in-graph normalization (+bf16 cast), argmax hypnogram.

    ``normalize='zscore'`` matches the host per-recording z-score (std
    ddof=1, eps 1e-6); ``'causal'`` runs the Pallas causal-EMA kernel
    per modality (the streaming/real-time path — ~128 Msamples/s on a v5e
    chip); ``False``/``'none'`` assumes pre-normalized inputs. Missing
    (``-inf``) channels pass through untouched into the model's
    missing-modality masking.
    """
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if precision == 'bfloat16' else jnp.float32
    if normalize is True:
        normalize = 'zscore'

    @jax.jit
    def forward(variables, x):
        def zscore(v):
            missing = jnp.isinf(v[:, :1])
            safe = jnp.where(jnp.isinf(v), 0.0, v)
            mu = jnp.mean(safe, axis=-1, keepdims=True)
            n = v.shape[-1]
            std = jnp.sqrt(jnp.sum(jnp.square(safe - mu), axis=-1, keepdims=True) / (n - 1))
            z = (safe - mu) / jnp.maximum(std, 1e-6)
            return jnp.where(missing, -jnp.inf, z).astype(dtype)

        def causal(col, v):
            from .settings import CAUSAL_NORM_BASELINE_TAU_SECONDS, CAUSAL_NORM_TAU_SECONDS
            from .ops.pallas_ema import ema_normalize_pallas

            missing = jnp.isinf(v[:, :1])
            safe = jnp.where(jnp.isinf(v), 0.0, v)
            z = ema_normalize_pallas(
                safe,
                sampling_freq=COLS_TO_SAMPLES_PER_EPOCH[col] / 30.0,
                tau_seconds=CAUSAL_NORM_TAU_SECONDS,
                baseline_tau_seconds=CAUSAL_NORM_BASELINE_TAU_SECONDS,
            )
            return jnp.where(missing, -jnp.inf, z).astype(dtype)

        if normalize == 'zscore':
            x = {k: zscore(v) for k, v in x.items()}
        elif normalize == 'causal':
            x = {k: causal(k, v) for k, v in x.items()}
        else:
            x = {k: v.astype(dtype) for k, v in x.items()}
        return jnp.argmax(model.apply(variables, x), axis=-1).astype(jnp.int32)

    return forward


class StreamingPipeline:
    """Double-buffered EDF->hypnogram pipeline over a file list."""

    def __init__(
        self,
        model,
        variables,
        signals: list[str],
        batch_size: int = 8,
        max_length_hours: float = 10.0,
        precision: str = 'bfloat16',
        normalize: bool = True,
        prefetch: int = 2,
    ):
        self.signals = list(signals)
        self.batch_size = batch_size
        self.max_length_hours = max_length_hours
        self.forward = make_streaming_forward(model, precision=precision, normalize=normalize)
        self.variables = variables
        self.decoder = NightDecoder(self.signals, max_length_hours)
        S = int(max_length_hours * 120)
        # Double-buffered page-warm host batch buffers.
        self._nbuf = max(2, prefetch)
        self._bufs = [
            {
                col: np.empty((batch_size, COLS_TO_SAMPLES_PER_EPOCH[col] * S), np.float32)
                for col in self.signals
            }
            for _ in range(self._nbuf)
        ]

    def warmup(self):
        import jax

        batch = {k: v for k, v in self._bufs[0].items()}
        for col in self.signals:
            batch[col].fill(0.0)
        jax.block_until_ready(self.forward(self.variables, batch))

    def run(self, fps: list[str]) -> Iterator[tuple[str, np.ndarray]]:
        """Yield (filepath, hypnogram[int32, S]) for each night."""
        import jax.numpy as jnp

        q: queue.Queue = queue.Queue(maxsize=self._nbuf - 1)
        stop = threading.Event()

        def producer():
            try:
                slot = 0
                for start in range(0, len(fps), self.batch_size):
                    if stop.is_set():
                        return
                    chunk = fps[start : start + self.batch_size]
                    buf = self._bufs[slot]
                    slot = (slot + 1) % self._nbuf
                    for i, fp in enumerate(chunk):
                        self.decoder.decode_into(fp, {c: buf[c][i] for c in self.signals})
                    for i in range(len(chunk), self.batch_size):
                        for c in self.signals:
                            buf[c][i] = buf[c][len(chunk) - 1]
                    # H2D copy happens here (fast tunnel), freeing the host
                    # buffer slot once jnp owns device memory.
                    dev = {c: jnp.asarray(buf[c]) for c in self.signals}
                    q.put(('ok', chunk, dev))
                q.put(('done', None, None))
            except Exception as e:  # noqa: BLE001
                q.put(('err', e, None))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                kind, chunk, dev = q.get()
                if kind == 'done':
                    return
                if kind == 'err':
                    raise chunk
                preds = np.asarray(self.forward(self.variables, dev))
                for i, fp in enumerate(chunk):
                    yield fp, preds[i]
        finally:
            stop.set()
