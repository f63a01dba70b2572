#!/usr/bin/env python
"""Repair EDFs whose signal headers carry a physical maximum of 0.0.

Some CHAT-dataset channels (CHIN, SNORE 2, ECG, ...) have physical_max=0.0,
which breaks range-based readers. This binary-patches the 256-byte-per-field
signal header region in a copy of the file: the unit field is marked
``BROKEN`` (so readers skip the channel) and the physical range is filled
with +/-3.28, then the copy is saved as ``*_fixed.edf`` after a read test.
Reference: preprocessing/0_fix_edfs.py.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
from glob import glob

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

HEADER_BYTES = 256


def _scan_broken_signals(filename: str) -> dict[str, tuple[int, int, int]]:
    """Map broken channel label -> (unit, phys_min, phys_max) byte offsets."""
    with open(filename, 'rb') as f:
        f.seek(252)
        nsigs = int(f.read(4).decode())
        labels = [f.read(16).decode() for _ in range(nsigs)]
        # Field layout per signal block: label 16, transducer 80, unit 8,
        # phys_min 8, phys_max 8, ...
        pmax_start = HEADER_BYTES + (16 + 80 + 8 + 8) * nsigs
        f.seek(pmax_start)
        fix_map: dict[str, tuple[int, int, int]] = {}
        for i in range(nsigs):
            pos = f.tell()
            pmax_val = f.read(8).decode()
            try:
                broken = float(pmax_val) == 0.0
            except ValueError:
                broken = False
            if broken:
                pos_unit = pos - 16 * nsigs  # unit field sits (8+8)*nsigs bytes earlier
                pos_min = pos - 8 * nsigs
                fix_map[labels[i]] = (pos_unit, pos_min, pos)
    return fix_map


def _patch_header(filename: str, fix_map: dict[str, tuple[int, int, int]], fill_val: float = 3.28) -> None:
    with open(filename, 'rb+') as f:
        for _label, (pos_unit, pos_min, pos_max) in fix_map.items():
            f.seek(pos_unit)
            f.write('BROKEN'.ljust(8).encode())
            f.seek(pos_min)
            f.write(f'{-fill_val:.2f}'.ljust(8).encode())
            f.seek(pos_max)
            f.write(f'{fill_val:.2f}'.ljust(8).encode())


def _try_read(fp: str) -> bool:
    from wav2sleep_tpu.data.edf import read_edf_header

    try:
        header = read_edf_header(fp)
        return header.n_records > 0
    except (ValueError, OSError) as e:
        print(f'Failed to read {fp} due to {e}')
        return False


def triage_edf_fp(filename: str, overwrite: bool = False) -> bool:
    """Returns True if a fixed copy was written."""
    fixed_filename = filename.replace('.edf', '_fixed.edf')
    if os.path.exists(fixed_filename) and not overwrite:
        return False
    fix_map = _scan_broken_signals(filename)
    if not fix_map:
        return False
    with tempfile.NamedTemporaryFile() as tmp_file:
        shutil.copyfile(filename, tmp_file.name)
        _patch_header(tmp_file.name, fix_map)
        if _try_read(tmp_file.name):
            shutil.copyfile(tmp_file.name, fixed_filename)
            return True
    return False


def main() -> None:
    parser = argparse.ArgumentParser(prog='Fix EDFs', description='Repair EDFs with broken physical ranges.')
    parser.add_argument('--folder', required=True, help='Dataset location (e.g. CHAT).')
    parser.add_argument('--overwrite', action='store_true', default=False)
    args = parser.parse_args()
    edf_fps = [fp for fp in glob(f'{args.folder}/**/*.edf', recursive=True) if not fp.endswith('_fixed.edf')]
    print(f'Found {len(edf_fps)} EDF files.')
    fixed = sum(triage_edf_fp(fp, overwrite=args.overwrite) for fp in edf_fps)
    print(f'Fixed {fixed} EDF files.')


if __name__ == '__main__':
    main()
