"""NSRR dataset split registry.

The reference vendors 16,368 session-ID lines under
``src/wav2sleep/data/splits/<dataset>/<split>.txt`` (reference data/nsrr.py:9-17).
Those ID lists are third-party data, so this package resolves them from (in
order): the ``WAV2SLEEP_SPLITS`` env var, a local ``splits/`` folder next to
this module, or a reference wav2sleep checkout. Use ``import_splits()`` once
to populate the local folder from an existing installation.
"""

from __future__ import annotations

import logging
import os
import shutil

from ..settings import KNOWN_DATASETS

logger = logging.getLogger(__name__)

_LOCAL_SPLITS = os.path.join(os.path.dirname(__file__), 'splits')


def splits_roots() -> list[str]:
    roots = []
    env = os.environ.get('WAV2SLEEP_SPLITS')
    if env:
        roots.append(env)
    roots.append(_LOCAL_SPLITS)
    ref = os.environ.get('W2S_REFERENCE_SRC', '/root/reference/src')
    roots.append(os.path.join(ref, 'wav2sleep', 'data', 'splits'))
    return roots


def get_split(dataset: str, split: str) -> list[str]:
    """Session IDs for (dataset, split); empty list when no list exists."""
    for root in splits_roots():
        fp = os.path.join(root, dataset, f'{split}.txt')
        if os.path.exists(fp):
            with open(fp, 'r') as f:
                return [line.strip() for line in f if line.strip()]
    logger.info(f"Couldn't find a split list for {dataset=}, {split=}")
    return []


def import_splits(source_dir: str, overwrite: bool = False) -> int:
    """Copy split ID lists from an existing wav2sleep checkout/installation
    into this package's local splits folder. Returns #files imported."""
    count = 0
    for ds in os.listdir(source_dir):
        src_ds = os.path.join(source_dir, ds)
        if not os.path.isdir(src_ds):
            continue
        for fn in os.listdir(src_ds):
            if not fn.endswith('.txt'):
                continue
            dst_ds = os.path.join(_LOCAL_SPLITS, ds)
            os.makedirs(dst_ds, exist_ok=True)
            dst = os.path.join(dst_ds, fn)
            if os.path.exists(dst) and not overwrite:
                continue
            shutil.copyfile(os.path.join(src_ds, fn), dst)
            count += 1
    return count


def get_dataset(fp: str) -> str:
    """Infer the source dataset of a filepath (reference data/nsrr.py:20-26)."""
    for ds in KNOWN_DATASETS:
        if ds in fp:
            return ds
    raise ValueError(f"Couldn't determine source dataset of {fp=}")
