"""Multi-dataset data module for training.

Equivalent of the reference SleepDataModule (src/wav2sleep/data/datamodule.py):

- train set = union of each dataset's ``train/`` partition under
  ``<data_location>/<dataset>/<split>/*.parquet``,
- val loaders: loader 0 combines all val datasets (census excluded to avoid
  duplicates, reference :204-207), then one loader per dataset with an
  index -> name map for metric labelling,
- per-dataset test loaders,
- ``.issues.parquet`` exclusion, PPG-only file filtering by parquet schema,
- epoch-seeded shuffling (seed + epoch),
- optional parallel rsync staging NFS -> local scratch with a free-space
  check (reference :36-82, 285-358).
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from ..settings import CENSUS, PPG, TEST, TRAIN, VAL
from .. import settings
from ..data.dataset import ParquetDataset, batch_iterator
from ..data.utils import get_parquet_cols, get_parquet_fps

logger = logging.getLogger(__name__)


def _exclude_issues(fps: list[str]) -> list[str]:
    return [fp for fp in fps if not fp.endswith('.issues.parquet')]


def shard_train_files(fps: list[str], seed: int, n_hosts: int, host: int) -> list[str]:
    """Deterministic per-host shard of the train file list for one epoch.

    All hosts shuffle the GLOBAL list with the same seed, truncate to a
    multiple of ``n_hosts`` (so every host yields the SAME number of
    batches — unequal counts would deadlock the collectives in the jitted
    step), and take a disjoint stride. The seed varies per epoch, so
    remainder nights rotate back in on later epochs. Without this, every
    host of a pod would feed the identical batch into
    ``global_batch_from_local`` and (n_hosts-1)/n_hosts of the global
    compute would process duplicate rows."""
    import numpy as np

    order = np.random.default_rng(seed).permutation(len(fps))
    n = (len(order) // n_hosts) * n_hosts
    if n == 0:
        raise ValueError(
            f'{len(fps)} train nights cannot be sharded over {n_hosts} hosts.'
        )
    return [fps[i] for i in order[host:n:n_hosts]]


def get_parquet_fps_for_dataset(
    data_location: str,
    dataset: str,
    split: str,
    columns: list[str],
    exclude_issues: bool = True,
    max_nights: int | None = None,
) -> list[str]:
    """Parquet files for one (dataset, split), with schema-based filtering
    for PPG-only column sets (reference datamodule.py:100-125)."""
    folder = os.path.join(data_location, dataset, split)
    if not os.path.isdir(folder):
        logger.info(f'No folder for {dataset=} {split=} at {folder}')
        return []
    fps = sorted(get_parquet_fps(folder))
    if exclude_issues:
        fps = _exclude_issues(fps)
    # When training PPG-only models, drop files without a PPG column to avoid
    # wasted loads (schema check is metadata-only).
    if columns == [PPG]:
        fps = [fp for fp in fps if PPG in get_parquet_cols(fp)]
    if max_nights is not None:
        fps = fps[:max_nights]
    return fps


@dataclass
class SleepDataModule:
    columns: list[str]
    data_location: str
    train_datasets: list[str] = field(default_factory=list)
    val_datasets: list[str] = field(default_factory=list)
    test_datasets: list[str] = field(default_factory=list)
    num_classes: int = 4
    max_nights: int = 1_000_000
    test: bool = False
    exclude_issues: bool = True
    batch_size: int = 16
    val_batch_size: int = 32
    test_batch_size: int = 32
    num_workers: int = 2
    drop_last: bool = False
    causal: bool = False
    seed: int = 42
    max_length_hours: int = settings.TRAINING_LENGTH_HOURS
    pad_to_epochs: int | None = None  # default: max_length_hours * 120
    sync_to_local: bool = False
    local_data_cache: str = '/scratch'
    max_parallel_rsyncs: int = 8

    def __post_init__(self):
        self.columns = list(self.columns)
        if self.pad_to_epochs is None:
            self.pad_to_epochs = int(round(self.max_length_hours * 120))
        if self.sync_to_local:
            self.data_location = stage_to_local(
                self.data_location,
                self.local_data_cache,
                max_parallel=self.max_parallel_rsyncs,
            )
        self._train_fps = []
        for ds in self.train_datasets:
            self._train_fps += self._fps(ds, TRAIN)
        # The combined val loader (named 'all') merges all val datasets
        # except census (its nights are drawn from the other datasets —
        # including it would duplicate). Consumers identify loaders by the
        # names val_loaders()/test_loaders() return, never by index (loaders
        # with no files are skipped).
        self._val_fps_combined = []
        self._val_fps_per_ds: list[tuple[str, list[str]]] = []
        for ds in self.val_datasets:
            fps = self._fps(ds, VAL)
            if ds != CENSUS:
                self._val_fps_combined += fps
            self._val_fps_per_ds.append((ds, fps))
        self._test_fps_per_ds: list[tuple[str, list[str]]] = []
        if self.test:
            for ds in self.test_datasets:
                self._test_fps_per_ds.append((ds, self._fps(ds, TEST)))

    def _fps(self, dataset: str, split: str) -> list[str]:
        return get_parquet_fps_for_dataset(
            self.data_location,
            dataset,
            split,
            self.columns,
            exclude_issues=self.exclude_issues,
            max_nights=self.max_nights,
        )

    def _make_dataset(self, fps: list[str]) -> ParquetDataset:
        return ParquetDataset(
            parquet_fps=fps,
            columns=self.columns,
            num_classes=self.num_classes,
            require_labels=True,
            max_length_hours=self.max_length_hours,
            causal=self.causal,
        )

    @property
    def num_train_nights(self) -> int:
        return len(self._train_fps)

    def train_loader(self, epoch: int = 0):
        """Shuffled train iterator; shuffle seeded by ``seed + epoch``
        (reference datamodule.py:226-229). On multi-process (TPU pod) runs
        each host loads a disjoint per-epoch shard — the contract
        ``global_batch_from_local`` assumes (parallel/mesh.py). Eval
        loaders stay unsharded: with replicated inputs the global eval
        batch duplicates every night n_hosts times, which leaves the
        count-ratio metrics (acc/kappa) and the weighted loss unchanged."""
        try:
            import jax

            n_hosts, host = jax.process_count(), jax.process_index()
        except Exception:
            n_hosts, host = 1, 0
        if n_hosts > 1:
            fps = shard_train_files(self._train_fps, self.seed + epoch, n_hosts, host)
            # Already globally shuffled inside the shard helper.
            return batch_iterator(
                self._make_dataset(fps),
                batch_size=self.batch_size,
                shuffle=False,
                drop_last=self.drop_last,
                num_threads=self.num_workers,
                pad_to_epochs=self.pad_to_epochs,
            )
        ds = self._make_dataset(self._train_fps)
        return batch_iterator(
            ds,
            batch_size=self.batch_size,
            shuffle=True,
            seed=self.seed + epoch,
            drop_last=self.drop_last,
            num_threads=self.num_workers,
            pad_to_epochs=self.pad_to_epochs,
        )

    def val_loaders(self):
        """[(name, loader)] — index 0 is the combined loader."""
        out = []
        sets = [('all', self._val_fps_combined)] + self._val_fps_per_ds
        for name, fps in sets:
            if not fps:
                continue
            ds = self._make_dataset(fps)
            out.append(
                (
                    name,
                    batch_iterator(
                        ds,
                        batch_size=self.val_batch_size,
                        shuffle=False,
                        num_threads=self.num_workers,
                        pad_to_epochs=self.pad_to_epochs,
                    ),
                )
            )
        return out

    def test_loaders(self):
        out = []
        for name, fps in self._test_fps_per_ds:
            if not fps:
                continue
            ds = self._make_dataset(fps)
            out.append(
                (
                    name,
                    batch_iterator(
                        ds,
                        batch_size=self.test_batch_size,
                        shuffle=False,
                        num_threads=self.num_workers,
                        pad_to_epochs=self.pad_to_epochs,
                    ),
                )
            )
        return out


def _tree_size(folder: str) -> int:
    total = 0
    for root, _, files in os.walk(folder):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _staged_bytes(src: str, dst: str) -> int:
    """Bytes of ``src`` already present at the SAME relative path in
    ``dst``, credited at most the source file's size. Only such bytes
    reduce what rsync still transfers — stale or unrelated destination
    content occupies space without being staging progress, so counting
    raw dst tree size would defeat the free-space guard."""
    credit = 0
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        for f in files:
            try:
                s = os.path.getsize(os.path.join(root, f))
                d = os.path.getsize(os.path.join(dst, rel, f))
            except OSError:
                continue
            credit += min(s, d)
    return credit


def _check_destination_space(src: str, dst: str) -> None:
    """Refuse to stage when the destination lacks room for the REMAINING
    bytes (reference datamodule.py:37-60). A partially-staged copy already
    occupies destination space AND reduces what rsync still has to
    transfer — counting the full source against the remaining free space
    would wrongly refuse to resume an interrupted stage."""
    total_src = _tree_size(src)
    remaining = max(total_src - _staged_bytes(src, dst) if os.path.isdir(dst) else total_src, 0)
    os.makedirs(dst, exist_ok=True)  # disk_usage needs an existing path
    usage = shutil.disk_usage(dst)
    if usage.free < remaining * 1.05:
        raise RuntimeError(
            f'Not enough space to stage {src} ({remaining / 1e9:.1f} GB '
            f'remaining of {total_src / 1e9:.1f} GB) '
            f'into {dst} ({usage.free / 1e9:.1f} GB free).'
        )


def _rsync_directory(src: str, dst: str) -> None:
    """Resumable rsync of one directory (reference datamodule.py:63-82)."""
    os.makedirs(dst, exist_ok=True)
    cmd = ['rsync', '-a', '--partial', '--inplace', src.rstrip('/') + '/', dst]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except FileNotFoundError:
        # rsync unavailable: plain copy fallback.
        shutil.copytree(src, dst, dirs_exist_ok=True)


def stage_to_local(data_location: str, local_cache: str, max_parallel: int = 8) -> str:
    """Parallel-stage the dataset tree from network storage to local scratch;
    returns the local root (reference datamodule.py:285-358)."""
    dst_root = os.path.join(local_cache, os.path.basename(data_location.rstrip('/')))
    _check_destination_space(data_location, dst_root)
    subdirs = [d for d in sorted(os.listdir(data_location)) if os.path.isdir(os.path.join(data_location, d))]
    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        futures = {
            pool.submit(_rsync_directory, os.path.join(data_location, d), os.path.join(dst_root, d)): d
            for d in subdirs
        }
        for fut in futures:
            fut.result()
    return dst_root
