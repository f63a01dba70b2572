"""Per-night parquet dataset -> numpy tensors.

Host-side equivalent of the reference's torch ``ParquetDataset``
(src/wav2sleep/data/dataset.py:25-199) with identical semantics:

- one item = one night; per-column dropna -> float32 array,
- all present signals must agree on recording length (in 30 s epochs),
- truncation to ``max_length_hours``,
- per-recording z-score (eps 1e-6) or causal EMA normalization,
- missing columns padded with ``-inf`` at the correct per-signal length,
- 5-class labels mapped through ``INTEGER_LABEL_MAPS`` with unscored -> -1.

Outputs are numpy (host) arrays; batching for the TPU happens in
``collate`` / ``batch_iterator`` which produce fixed-shape stacks.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Dict, Iterator

import numpy as np
import pandas as pd

from ..settings import (
    CAUSAL_NORM_BASELINE_TAU_SECONDS,
    CAUSAL_NORM_MIN_SIGMA,
    CAUSAL_NORM_TAU_SECONDS,
    COLS_TO_SAMPLES_PER_EPOCH,
    IGNORE_LABEL,
    INTEGER_LABEL_MAPS,
    LABEL,
    NORM_OUTLIER_THRESHOLD,
)
from ..ops.ema_norm import causal_rolling_normalize, causal_rolling_normalize_f32
from ..utils import stop_aware_put

logger = logging.getLogger(__name__)

NightItem = tuple[Dict[str, np.ndarray], np.ndarray]


def try_read_parquet(fp: str, columns: list[str] | None = None, max_retries: int = 3) -> pd.DataFrame:
    """Read parquet with retries for flaky network filesystems
    (reference dataset.py:190-199)."""
    last_error = None
    for _ in range(max_retries + 1):
        try:
            return pd.read_parquet(fp, columns=columns)
        except Exception as e:  # noqa: BLE001 - deliberate: any IO flake retries
            logger.error(f'Failed to read parquet {fp=} - {e}')
            last_error = e
    raise ValueError(f'Failed to read parquet {fp=}') from last_error


def zscore_normalize(signals: Dict[str, np.ndarray], eps: float = 1e-6) -> Dict[str, np.ndarray]:
    """Global per-recording z-score (reference dataset.py:75-87)."""
    out: Dict[str, np.ndarray] = {}
    for k, x in signals.items():
        if x.size == 0 or not np.isfinite(x).all():
            out[k] = x
            continue
        mu = np.mean(x)
        std = np.std(x, ddof=1) if x.size > 1 else 0.0
        std = std if std > eps else eps
        out[k] = ((x - mu) / std).astype(x.dtype)
    return out


def causal_normalize(signals: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Causal EMA normalization per signal (reference dataset.py:89-130)."""
    out: Dict[str, np.ndarray] = {}
    for k, x in signals.items():
        if x.size == 0 or not np.isfinite(x).all():
            out[k] = x
            continue
        if k not in COLS_TO_SAMPLES_PER_EPOCH:
            logger.warning(f'Unknown signal {k}, skipping causal normalization')
            out[k] = x
            continue
        sampling_freq = COLS_TO_SAMPLES_PER_EPOCH[k] / 30.0
        if x.dtype == np.float32:
            # Fused native path: writes f32 directly, no f64 temporaries
            # (bit-identical to the generic path + f32 cast).
            out[k] = causal_rolling_normalize_f32(
                x,
                sampling_freq=sampling_freq,
                tau_seconds=CAUSAL_NORM_TAU_SECONDS,
                outlier_threshold_sigma=NORM_OUTLIER_THRESHOLD,
                baseline_tau_seconds=CAUSAL_NORM_BASELINE_TAU_SECONDS,
                min_sigma=CAUSAL_NORM_MIN_SIGMA,
            )
            continue
        out[k] = np.asarray(
            causal_rolling_normalize(
                x,
                sampling_freq=sampling_freq,
                tau_seconds=CAUSAL_NORM_TAU_SECONDS,
                outlier_threshold_sigma=NORM_OUTLIER_THRESHOLD,
                baseline_tau_seconds=CAUSAL_NORM_BASELINE_TAU_SECONDS,
                min_sigma=CAUSAL_NORM_MIN_SIGMA,
            ),
            dtype=x.dtype,
        )
    return out


class ParquetDataset:
    """Map-style dataset over per-night parquet files."""

    def __init__(
        self,
        parquet_fps: list[str],
        columns: list[str],
        num_classes: int = 4,
        require_labels: bool = True,
        max_length_hours: int | None = None,
        causal: bool = False,
    ):
        self.files = list(parquet_fps)
        self.columns = list(columns)
        for col in self.columns:
            if col not in COLS_TO_SAMPLES_PER_EPOCH:
                raise ValueError(f'Column {col} unrecognised.')
        self.map = INTEGER_LABEL_MAPS[num_classes]
        self.num_classes = num_classes
        self.require_labels = require_labels
        # Fractional hours are allowed (tests/streaming use short recordings).
        self.max_length_epochs = (
            1_000_000 if max_length_hours is None else int(round(max_length_hours * 60 * 2))
        )
        self.causal = causal
        # Column subsets to read, probed lazily per file (the schema of an
        # ingested parquet is static; re-reading the footer every epoch
        # would add an I/O round-trip per item on the 1-core host).
        self._want_cols: Dict[str, list] = {}

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> NightItem:
        fp = self.files[idx]
        # Read only the requested columns (+LABEL): ingested parquet can
        # hold the full 6-signal set incl. the 4096-samples/epoch EOG pair,
        # several times the bytes an ECG-only run needs per night. The
        # schema probe reads footer metadata only; absent columns still go
        # through the -inf padding below.
        from .utils import get_parquet_cols

        want = self._want_cols.get(fp)
        if want is None:
            try:
                avail = set(get_parquet_cols(fp))
                want = [c for c in self.columns if c in avail]
                if LABEL in avail:
                    want.append(LABEL)
            except Exception:  # noqa: BLE001 - schema probe flake: full read retries
                want = []
            self._want_cols[fp] = want
        df = try_read_parquet(fp, columns=want or None)
        signal_dict: Dict[str, np.ndarray] = {}
        cols_to_pad: list[str] = []
        recording_epochs: int | None = None
        for col in self.columns:
            if col in df.columns:
                x = df[col].dropna().to_numpy(dtype=np.float32)
                if np.isinf(x).any():
                    raise ValueError(f'{fp=} has inf. values for {col=}')
                epochs = x.shape[0] // COLS_TO_SAMPLES_PER_EPOCH[col]
                if recording_epochs is None:
                    recording_epochs = epochs
                elif recording_epochs != epochs:
                    raise ValueError(
                        f'Signals disagree on recording length: {recording_epochs} != {epochs} epochs for {fp=}'
                    )
                keep = COLS_TO_SAMPLES_PER_EPOCH[col] * min(epochs, self.max_length_epochs)
                signal_dict[col] = x[:keep]
            else:
                cols_to_pad.append(col)
        if recording_epochs is None:
            raise ValueError(f'No relevant columns found in {fp=}. {self.columns=}')
        if self.causal:
            signal_dict = causal_normalize(signal_dict)
        else:
            signal_dict = zscore_normalize(signal_dict)
        kept_epochs = min(recording_epochs, self.max_length_epochs)
        for col in cols_to_pad:
            sig_len = COLS_TO_SAMPLES_PER_EPOCH[col] * kept_epochs
            signal_dict[col] = np.full((sig_len,), -np.inf, dtype=np.float32)
        if self.require_labels or LABEL in df.columns:
            labels = df[LABEL].dropna().map(self.map)
            labels = labels.fillna(IGNORE_LABEL).to_numpy(dtype=np.float32)
            if labels.shape[0] != recording_epochs:
                raise ValueError(f'{labels.shape=} != {recording_epochs=} for {fp=}')
            labels = labels[: self.max_length_epochs]
        else:
            labels = np.full((kept_epochs,), IGNORE_LABEL, dtype=np.float32)
        return signal_dict, labels


def collate(items: list[NightItem]) -> tuple[Dict[str, np.ndarray], np.ndarray]:
    """Stack nights into fixed-shape batch arrays (all nights in a batch must
    share the same epoch count, which ingestion guarantees)."""
    signals = {k: np.stack([item[0][k] for item in items]) for k in items[0][0]}
    labels = np.stack([item[1] for item in items])
    return signals, labels


def pad_or_truncate_item(item: NightItem, target_epochs: int) -> NightItem:
    """Pad (zeros signal / -1 labels) or truncate a night to ``target_epochs``
    so ragged nights can share one static XLA shape."""
    signals, labels = item
    out_signals = {}
    for col, x in signals.items():
        spe = COLS_TO_SAMPLES_PER_EPOCH[col]
        target = spe * target_epochs
        if x.shape[0] >= target:
            out_signals[col] = x[:target]
        else:
            # Missing modalities (all--inf) keep the -inf sentinel; so does
            # a ZERO-length channel (a 0-epoch night) — it has no real
            # samples, so every padded epoch is beyond the night, and 0.0
            # would present an absent channel as real zero-valued signal.
            pad_value = -np.inf if (x.size == 0 or np.isinf(x[:1]).any()) else 0.0
            out = np.full((target,), pad_value, dtype=x.dtype)
            out[: x.shape[0]] = x
            out_signals[col] = out
    if labels.shape[0] >= target_epochs:
        out_labels = labels[:target_epochs]
    else:
        out_labels = np.full((target_epochs,), IGNORE_LABEL, dtype=labels.dtype)
        out_labels[: labels.shape[0]] = labels
    return out_signals, out_labels


def batch_iterator(
    dataset: ParquetDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    num_threads: int = 2,
    pad_to_epochs: int | None = None,
    prefetch: int = 2,
) -> Iterator[tuple[Dict[str, np.ndarray], np.ndarray]]:
    """Threaded, prefetching batch iterator (pyarrow reads release the GIL).

    The reference uses torch DataLoader worker processes
    (datamodule.py:226-240); on TPU-VM hosts threads + pyarrow get the same
    overlap without pickling overhead.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    batches = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
    if drop_last:
        batches = [b for b in batches if len(b) == batch_size]

    def load_batch(idxs) -> tuple[Dict[str, np.ndarray], np.ndarray]:
        items = [dataset[int(i)] for i in idxs]
        if pad_to_epochs is not None:
            items = [pad_or_truncate_item(it, pad_to_epochs) for it in items]
        return collate(items)

    if num_threads <= 1:
        for idxs in batches:
            yield load_batch(idxs)
        return

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put(item) -> bool:
        # Stop-aware: an abandoned generator (consumer breaks early) must
        # release a producer blocked on the bounded queue.
        return stop_aware_put(q, stop, item)

    def producer():
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # Sliding submission window: submitting every batch up front would
        # let workers run arbitrarily far ahead of the consumer (the queue
        # only bounds COMPLETED-AND-DEQUEUED batches, not completed futures)
        # — an epoch's worth of collated full-night batches can OOM the
        # host. The window bounds completed-but-unconsumed batches to
        # ~num_threads + prefetch.
        window = max(num_threads + prefetch, 1)
        pending: deque = deque()
        it = iter(batches)
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            try:
                while not stop.is_set():
                    while len(pending) < window:
                        idxs = next(it, None)
                        if idxs is None:
                            break
                        pending.append(pool.submit(load_batch, idxs))
                    if not pending:
                        put(('done', None))
                        return
                    fut = pending.popleft()
                    try:
                        item = ('ok', fut.result())
                    except Exception as e:  # noqa: BLE001
                        put(('err', e))
                        return
                    if not put(item):
                        return
            finally:
                for fut in pending:
                    fut.cancel()

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            kind, payload = q.get()
            if kind == 'done':
                return
            if kind == 'err':
                raise payload
            yield payload
    finally:
        stop.set()
