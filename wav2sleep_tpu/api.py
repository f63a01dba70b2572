"""Public API for running wav2sleep-tpu on new data.

Surface-compatible with the reference (src/wav2sleep/api.py:53-327):
``load_model`` / ``prepare`` / ``load_dataset`` / ``predict`` /
``save_predictions`` / ``predict_on_folder`` with the same checkpoint folder
format (``config.yaml`` + ``state_dict.pth``), ``hf://`` URIs, parquet cache
layout and ``.preds.csv`` output format — but the model executes as a single
XLA-compiled JAX program on TPU, batches are padded onto static shape
buckets (no per-night recompiles), and preprocessing is the vectorized
numpy/C++ path.
"""

from __future__ import annotations

import logging
import os
import tempfile
from dataclasses import dataclass, field
from glob import glob
from pathlib import Path
from typing import Iterable, Optional, Tuple

import numpy as np
import pandas as pd
import yaml

from .convert import check_compatible, convert_state_dict, load_torch_state_dict
from .data.dataset import ParquetDataset, collate, pad_or_truncate_item
from .data.edf import load_edf_data
from .data.preprocessing import process_waveform_dataframe
from .hub import download_from_hub, is_hf_repo_id
from .instantiate import instantiate, model_family
from .settings import LABEL, PRED, TIMESTAMP

logger = logging.getLogger(__name__)

EPOCH_BUCKET = 120  # Pad night lengths to multiples of 1 h to bound recompiles.


@dataclass
class W2SModel:
    """A loaded model: flax module + converted variables + jit cache."""

    module: object
    variables: dict
    family: str
    config: dict
    precision: str = 'float32'
    _jit_cache: dict = field(default_factory=dict, repr=False)
    _device_variables: object = field(default=None, repr=False)

    @property
    def num_classes(self) -> int:
        if self.family == 'ppgnet':
            return self.module.n_classes
        return self.module.num_classes

    @property
    def valid_signals(self) -> list[str]:
        if self.family == 'ppgnet':
            return ['PPG']
        return self.module.valid_signals

    @property
    def causal(self) -> bool:
        if self.family == 'ppgnet':
            return False
        return self.module.signal_encoders.causal

    def _forward_fn(self):
        import jax

        key = 'fwd'
        if key not in self._jit_cache:
            module = self.module
            family = self.family

            def fwd(variables, x):
                if family == 'ppgnet':
                    (x_single,) = x.values()
                    return module.apply(variables, x_single)
                return module.apply(variables, x)

            self._jit_cache[key] = jax.jit(fwd)
        return self._jit_cache[key]

    def logits(self, x: dict[str, np.ndarray]) -> np.ndarray:
        """Per-epoch class logits ``[B, S, C]`` for a dict of ``[B, T]`` inputs."""
        import jax
        import jax.numpy as jnp

        if self._device_variables is None:
            # Transfer the weight tree ONCE: passing the host numpy tree to
            # the jitted forward would re-upload every parameter on every
            # batch (tens of MB/call through the device link).
            self._device_variables = jax.device_put(self.variables)
        dtype = jnp.bfloat16 if self.precision == 'bfloat16' else jnp.float32
        xb = {k: jnp.asarray(v, dtype=dtype) for k, v in x.items()}
        out = self._forward_fn()(self._device_variables, xb)
        return np.asarray(out, dtype=np.float32)

    def predict(self, x: dict[str, np.ndarray]) -> np.ndarray:
        """Most likely sleep stage per epoch, ``[B, S]``."""
        return np.argmax(self.logits(x), axis=-1)

    def __call__(self, x: dict[str, np.ndarray]) -> np.ndarray:
        return self.logits(x)


def load_model(
    folder: str,
    device: str = 'auto',
    compile: bool = False,  # noqa: A002 - reference API name
    revision: str | None = None,
    cache_dir: str | None = None,
    precision: str = 'float32',
) -> W2SModel:
    """Load a pretrained model from a checkpoint folder or Hugging Face Hub.

    The folder layout is the reference's deployable format
    (``config.yaml`` + ``state_dict.pth``, reference api.py:53-99); PyTorch
    weights are converted to JAX parameters on load.

    Args:
        folder: Local folder or ``hf://user/repo`` URI.
        device: kept for API parity ('auto' uses the default JAX device).
        compile: kept for API parity (forwards are always jit-compiled).
        precision: 'float32' (checkpoint parity) or 'bfloat16' (fast TPU path).
    """
    import jax

    if is_hf_repo_id(folder):
        folder = download_from_hub(folder, revision=revision, cache_dir=cache_dir)
    del device, compile

    config_fp = os.path.join(folder, 'config.yaml')
    if not os.path.exists(config_fp):
        raise FileNotFoundError(f'No config file found at {config_fp}. Has the model been downloaded?')
    with open(config_fp, 'r') as f:
        model_cfg = yaml.safe_load(f)
    module = instantiate(model_cfg)
    family = model_family(model_cfg)

    ckpt_path = os.path.join(folder, 'state_dict.pth')
    npz_path = os.path.join(folder, 'params.npz')
    if os.path.exists(ckpt_path):
        variables = convert_state_dict(load_torch_state_dict(ckpt_path), family=family)
    elif os.path.exists(npz_path):
        from .checkpoint import load_params_npz

        variables = load_params_npz(npz_path)
    else:
        raise FileNotFoundError(f'No state dict found at {ckpt_path}. Has the model been downloaded?')

    # Validate converted structure against the module's expected tree.
    example = _example_input(module, family)
    expected = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), example))
    check_compatible(variables, expected)

    if precision == 'bfloat16':
        import jax.numpy as jnp

        variables = jax.tree_util.tree_map(lambda a: np.asarray(a, dtype=jnp.bfloat16), variables)
    return W2SModel(module=module, variables=variables, family=family, config=model_cfg, precision=precision)


def _example_input(module, family: str):
    from .settings import COLS_TO_SAMPLES_PER_EPOCH

    if family == 'ppgnet':
        return np.zeros((1, module.INPUT_LENGTH), dtype=np.float32)
    return {
        sig: np.zeros((1, COLS_TO_SAMPLES_PER_EPOCH[sig] * 2), dtype=np.float32)
        for sig in module.valid_signals
    }


def prepare(
    input_folder: str,
    signals: Iterable[str],
    max_length_hours: int = 10,
    tmp_root_folder: str | None = None,
) -> str:
    """Preprocess EDF/CSV/Parquet into model-ready parquet files.

    Cache keyed by ``signals + max_length_hours`` under a temp root;
    per-file failures are logged and skipped (reference api.py:102-140).
    """
    if tmp_root_folder is None:
        tmp_root_folder = os.path.join(tempfile.gettempdir(), 'wav2sleep')
    logger.info(f'Preparing dataset from {input_folder}...')
    signals = list(signals)
    tmp_subfolder = os.path.join(tmp_root_folder, '_'.join(signals) + f'_{max_length_hours}h')
    fps = _get_supported_files(input_folder)
    logger.debug(f'Found {len(fps)} files in {input_folder}')
    for fp in fps:
        tmp_path = Path(tmp_subfolder) / Path(fp).relative_to(Path(fp).anchor).with_suffix('.parquet')
        if os.path.exists(tmp_path):
            logger.debug(f'Skipping {fp} because it already exists in {tmp_root_folder}')
            continue
        try:
            df = _load_file(fp, columns=signals)
            df = process_waveform_dataframe(df, signals, max_length_hours=max_length_hours)
        except (FileNotFoundError, ValueError, KeyError, pd.errors.ParserError) as e:
            logger.error(f'Failed to process {fp} due to {e}')
            continue
        os.makedirs(os.path.dirname(tmp_path), exist_ok=True)
        df.to_parquet(tmp_path)
    return tmp_subfolder


def load_dataset(
    parquet_folder: str,
    signals: Iterable[str],
    num_classes: int = 4,
    max_length_hours: Optional[int] = None,
    causal: bool = False,
) -> ParquetDataset:
    """Create a ``ParquetDataset`` from a folder of parquet files."""
    signals = list(signals)
    input_fps = sorted(_get_parquet_files(parquet_folder))
    if len(input_fps) == 0:
        raise ValueError(f'No parquet files found in {parquet_folder}.')
    return ParquetDataset(
        parquet_fps=input_fps,
        num_classes=num_classes,
        columns=signals,
        require_labels=False,
        max_length_hours=max_length_hours,
        causal=causal,
    )


def predict(
    model: W2SModel,
    dataset: ParquetDataset,
    device: str = 'auto',
    batch_size: int = 4,
    num_workers: int = 4,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Apply a model to a dataset; returns (predictions, labels-or-None).

    Nights are padded to 1 h epoch buckets and short batches padded to
    ``batch_size`` so the whole dataset reuses a handful of compiled graphs.
    """
    del device  # Single-process JAX: default device.
    predictions: list[np.ndarray] = []
    labels: list[np.ndarray] = []
    for i in range(0, len(dataset), batch_size):
        # Stream chunk-by-chunk: a 10 h 4-signal night is ~20 MB of host
        # arrays, so materializing a whole folder up front doesn't scale.
        chunk = [dataset[j] for j in range(i, min(i + batch_size, len(dataset)))]
        epochs = [len(it[1]) for it in chunk]
        if model.family == 'ppgnet':
            # SleepPPGNet requires its exact training length (models/
            # ppgnet.py INPUT_LENGTH, 1,200 epochs at 1,024 samples each) —
            # a shorter 1 h bucket would fail the encode shape check.
            from .settings import MEDIUM_FREQ_SAMPLES_PER_EPOCH

            bucket = model.module.INPUT_LENGTH // MEDIUM_FREQ_SAMPLES_PER_EPOCH
        else:
            bucket = int(np.ceil(max(epochs) / EPOCH_BUCKET) * EPOCH_BUCKET)
        padded = [pad_or_truncate_item(it, bucket) for it in chunk]
        n_pad = batch_size - len(padded)
        padded.extend([padded[-1]] * n_pad)  # Pad batch to static size.
        x, y = collate(padded)
        preds = model.predict(x)
        for j, night_epochs in enumerate(epochs):
            predictions.append(preds[j, :night_epochs])
            labels.append(y[j, :night_epochs])
    labels_arr: Optional[list[np.ndarray]] = labels
    if all((lab == -1).all() for lab in labels):
        labels_arr = None
    return predictions, labels_arr


def save_predictions(
    predictions,
    parquet_folder: str,
    output_folder: str,
    dataset: ParquetDataset,
    labels=None,
    overwrite: bool = False,
    max_length_hours: Optional[int] = None,
) -> None:
    """Write per-night ``<name>.preds.csv`` mirroring the input tree
    (reference api.py:193-220): 30 s timestamp index, datetime-aware."""
    del max_length_hours
    for idx, fp in enumerate(dataset.files):
        rel_path = Path(fp).relative_to(parquet_folder)
        out_fp = str(Path(output_folder) / rel_path.with_suffix('.preds.csv'))
        if os.path.exists(out_fp) and not overwrite:
            logger.warning(f'File {out_fp} exists. Skipping.')
            continue
        input_df = pd.read_parquet(fp)
        duration_epochs = int(len(predictions[idx]))
        start = input_df.index[0]
        output_index = pd.Index(np.arange(0, 60 * duration_epochs / 2, step=30) + 30.0, name=TIMESTAMP)
        if isinstance(input_df.index, pd.DatetimeIndex):
            output_index = start + pd.to_timedelta(output_index, unit='s')
        output_df = pd.DataFrame({PRED: np.asarray(predictions[idx][:duration_epochs])}, index=output_index)
        if labels is not None:
            output_df[LABEL] = np.asarray(labels[idx][:duration_epochs])
        os.makedirs(os.path.dirname(out_fp), exist_ok=True)
        output_df.to_csv(out_fp)


def predict_on_folder(
    input_folder: str,
    output_folder: str,
    *,
    model: Optional[W2SModel] = None,
    model_folder: Optional[str] = None,
    signals: Optional[Iterable[str]] = None,
    device: str = 'auto',
    batch_size: int = 4,
    num_workers: int = 4,
    preprocess: bool = True,
    max_length_hours: int = 10,
    overwrite: bool = False,
    compile: bool = False,  # noqa: A002 - reference API name
    return_tensors: bool = False,
    precision: str = 'float32',
    tmp_root_folder: str | None = None,
):
    """End-to-end: (optionally) preprocess a folder, run inference, save CSVs.

    Mirrors reference api.py:223-301 including signal-subset validation
    against ``model.valid_signals``.
    """
    if model is None:
        if model_folder is None:
            raise ValueError('Either `model` or `model_folder` must be provided.')
        model = load_model(model_folder, device=device, compile=compile, precision=precision)

    if signals is None:
        signals = list(model.valid_signals)
    else:
        signals = list(signals)
        valid = set(model.valid_signals)
        if not set(signals).issubset(valid):
            raise ValueError(f'Invalid signal subset: {signals}. Valid signals are: {sorted(valid)}')

    if preprocess:
        parquet_folder = prepare(
            input_folder=input_folder,
            signals=signals,
            max_length_hours=max_length_hours,
            tmp_root_folder=tmp_root_folder,
        )
    else:
        parquet_folder = input_folder

    ds = load_dataset(
        parquet_folder=parquet_folder,
        signals=signals,
        num_classes=model.num_classes,
        max_length_hours=max_length_hours,
        causal=model.causal,
    )
    preds, labels = predict(model=model, dataset=ds, device=device, batch_size=batch_size, num_workers=num_workers)
    save_predictions(
        predictions=preds,
        parquet_folder=parquet_folder,
        output_folder=output_folder,
        dataset=ds,
        labels=labels,
        overwrite=overwrite,
    )
    return (preds, labels) if return_tensors else None


# ---------- internal helpers ----------


def _get_supported_files(input_folder: str) -> list[str]:
    files = []
    for ext in ('edf', 'csv', 'parquet'):
        files.extend(glob(os.path.join(input_folder, f'**/*.{ext}'), recursive=True))
    return sorted(files)


def _get_parquet_files(folder: str) -> list[str]:
    return glob(os.path.join(folder, '**/*.parquet'), recursive=True)


def _load_file(fp: str, columns: list[str]) -> pd.DataFrame:
    if fp.endswith('.edf'):
        df, _metadata = load_edf_data(fp, columns=columns, convert_time=True, raise_on_missing=False)
        return df
    elif fp.endswith('.csv'):
        return pd.read_csv(fp, index_col=0, parse_dates=True)
    elif fp.endswith('.parquet'):
        return pd.read_parquet(fp)
    else:
        raise ValueError(f'Unsupported file extension for {fp}')
