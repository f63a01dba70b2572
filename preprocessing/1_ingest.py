#!/usr/bin/env python
"""Ingest an NSRR dataset: EDF + annotations -> per-night training parquet.

Thin CLI over ``wav2sleep_tpu.ingest`` (reference preprocessing/1_ingest.py).
Fan-out is multiprocess on this host, and ``--shard-hosts`` additionally
splits the work list across TPU-VM pod hosts (each host runs this script;
``jax.process_index`` picks its partition) — the Ray-cluster role.

Example:
    python preprocessing/1_ingest.py --folder /data/raw/mesa \\
        --output-folder /data/processed --columns ECG PPG ABD THX --max-parallel 16
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def parse_args():
    parser = argparse.ArgumentParser(prog='Dataset Processor', description='Process dataset.')
    parser.add_argument('--folder', required=True, help='Location of dataset (basename = dataset name).')
    parser.add_argument('--columns', nargs='+', default=None, help='Signals to process (e.g. ECG PPG ABD THX).')
    parser.add_argument('--max-parallel', default=1, type=int, help='Parallel worker processes.')
    parser.add_argument('--output-folder', required=True, help='Base output folder for processed datasets.')
    parser.add_argument('--overwrite', action='store_true', default=False)
    parser.add_argument('--shard-hosts', action='store_true', default=False,
                        help='Split the work list across TPU-VM pod hosts.')
    return parser.parse_args()


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    args = parse_args()
    from wav2sleep_tpu.ingest import prepare_dataset, process_files

    dataset = args.folder.rstrip('/').split('/')[-1]
    print(f'Processing {dataset=}...')
    fp_dict = prepare_dataset(folder=args.folder, output_folder=args.output_folder, dataset=dataset)
    process_files(
        fp_dict,
        max_parallel=args.max_parallel,
        overwrite=args.overwrite,
        columns=args.columns,
        shard_hosts=args.shard_hosts,
    )


if __name__ == '__main__':
    main()
