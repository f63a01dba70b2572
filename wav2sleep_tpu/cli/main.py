"""Importable CLI entry point (reference keeps an older copy of the predict
CLI at src/wav2sleep/cli/main.py; here it simply delegates)."""

import os
import sys


def main(argv=None):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
    from scripts.predict import main as predict_main

    predict_main(argv)


if __name__ == '__main__':
    main()
