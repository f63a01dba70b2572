from .dataset import ParquetDataset, batch_iterator, collate, try_read_parquet
from .edf import get_edf_end, get_edf_signals, get_edf_start, load_edf_data, read_edf_header
from .nsrr import get_dataset, get_split, import_splits
from .preprocessing import (
    CARDIO_RESP_COLS,
    EDF_COLS,
    NEURAL_COLS,
    TARGET_LABEL_INDEX,
    process_waveform_dataframe,
    resample_signal,
)
from .txt import parse_txt_annotations
from .utils import (
    convert_int_stage,
    convert_str_stage,
    get_parquet_cols,
    get_parquet_fps,
    interp_to_grid,
    interpolate_index,
)
from .xml import parse_xml_annotations

__all__ = [
    'ParquetDataset',
    'batch_iterator',
    'collate',
    'try_read_parquet',
    'load_edf_data',
    'read_edf_header',
    'get_edf_start',
    'get_edf_end',
    'get_edf_signals',
    'get_split',
    'get_dataset',
    'import_splits',
    'process_waveform_dataframe',
    'resample_signal',
    'parse_xml_annotations',
    'parse_txt_annotations',
    'interpolate_index',
    'interp_to_grid',
    'convert_int_stage',
    'convert_str_stage',
    'get_parquet_cols',
    'get_parquet_fps',
    'CARDIO_RESP_COLS',
    'NEURAL_COLS',
    'EDF_COLS',
    'TARGET_LABEL_INDEX',
]
