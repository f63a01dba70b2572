"""Importable CLI entry point (reference keeps an older copy of the predict
CLI at src/wav2sleep/cli/main.py; here it simply delegates to the packaged
predict CLI — no repo checkout required)."""

from .predict import main

if __name__ == '__main__':
    main()
