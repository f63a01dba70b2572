#!/usr/bin/env python
"""Upload a checkpoint folder to the Hugging Face Hub (reference parity:
scripts/upload_to_hub.py there)."""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main(argv=None) -> None:
    from wav2sleep_tpu.hub import MODEL_VARIANTS, upload_to_hub

    parser = argparse.ArgumentParser(description='Upload a wav2sleep checkpoint to the HF Hub.')
    parser.add_argument('--local-folder', required=True, help='Folder with config.yaml + state_dict.pth.')
    parser.add_argument('--repo-id', required=True, help='Target repo, e.g. username/wav2sleep.')
    parser.add_argument('--variant', choices=sorted(MODEL_VARIANTS), default=None,
                        help='Known variant name for model-card generation.')
    parser.add_argument('--private', action='store_true')
    parser.add_argument('--token', default=None, help='HF API token (defaults to cached login).')
    args = parser.parse_args(argv)
    url = upload_to_hub(
        local_folder=args.local_folder,
        repo_id=args.repo_id,
        variant_name=args.variant,
        private=args.private,
        token=args.token,
    )
    print(f'Uploaded to {url}')


if __name__ == '__main__':
    main()
