#!/usr/bin/env python
"""Assemble the census-balanced val/test benchmark (Jones et al.).

Collects the 500+500 census sessions from every dataset's ingest folder into
``<folder>/census/{val,test}``; fails loudly if any session is missing, and
strips ``.issues`` from names so evaluation doesn't skip them (reference
preprocessing/2b_create_census_split.py).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from glob import glob

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def build_set(folder: str, split: str, all_parquet_fps: list[str], copy: bool = False) -> None:
    from wav2sleep_tpu.data.nsrr import get_split
    from wav2sleep_tpu.settings import CENSUS, TEST, VAL

    if split not in (VAL, TEST):
        raise ValueError(f'Split must be either {VAL} or {TEST}')
    session_ids = get_split(CENSUS, split)
    found = {}
    for fp in all_parquet_fps:
        session_id = os.path.basename(fp).replace('.parquet', '').replace('.issues', '')
        if session_id in session_ids:
            found[session_id] = fp
    if len(found) != len(session_ids):
        missing = set(session_ids).difference(found)
        print(len(missing), missing)
        raise ValueError(f'Found {len(found)} files, but expected {len(session_ids)}')
    print(f'Found all {len(found)} files necessary for {split} split. Linking...')
    for _session_id, fp in found.items():
        o_fp = os.path.join(folder, CENSUS, split, os.path.basename(fp).replace('.issues', ''))
        os.makedirs(os.path.dirname(o_fp), exist_ok=True)
        if os.path.exists(o_fp):
            continue
        if copy:
            shutil.copy2(fp, o_fp)
        else:
            os.symlink(os.path.abspath(fp), o_fp)


def main() -> None:
    from wav2sleep_tpu.settings import INGEST, TEST, VAL

    parser = argparse.ArgumentParser(prog='Census Split Builder')
    parser.add_argument('--folder', required=True, help='Location of processed NSRR datasets.')
    parser.add_argument('--copy', action='store_true', default=False)
    args = parser.parse_args()
    print('Globbing all ingested files...')
    all_parquet_fps = glob(f'{args.folder}/*/{INGEST}/*.parquet')
    print('Found', len(all_parquet_fps), 'files.')
    build_set(args.folder, VAL, all_parquet_fps, copy=args.copy)
    build_set(args.folder, TEST, all_parquet_fps, copy=args.copy)


if __name__ == '__main__':
    main()
