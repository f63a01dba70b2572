"""wav2sleep_tpu: TPU-native (JAX/XLA/Pallas) sleep-staging framework.

A ground-up rebuild of wav2sleep (Carter & Tarassenko, ML4H 2024) for TPU:
flax models compiled by XLA, pjit data-parallel training over device meshes,
Pallas/C++ kernels on the hot paths, and the same public API surface as the
reference (``load_model`` / ``predict_on_folder`` / ...).
"""

from .version import __version__

__all__ = [
    '__version__',
    'load_model',
    'prepare',
    'load_dataset',
    'predict',
    'save_predictions',
    'predict_on_folder',
]


def __getattr__(name):
    # Lazy import: keep `import wav2sleep_tpu` light and cycle-free.
    if name in (
        'load_model',
        'prepare',
        'load_dataset',
        'predict',
        'save_predictions',
        'predict_on_folder',
    ):
        from . import api

        return getattr(api, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
