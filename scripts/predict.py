#!/usr/bin/env python
"""Inference CLI — delegates to the packaged implementation
(wav2sleep_tpu/cli/predict.py), kept for reference-parity invocation as
``python scripts/predict.py``."""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from wav2sleep_tpu.cli.predict import build_parser, main  # noqa: E402,F401

if __name__ == '__main__':
    main()
