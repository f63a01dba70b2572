from .checkpointing import CheckpointManager
from .datamodule import SleepDataModule, get_parquet_fps_for_dataset, stage_to_local
from .loop import EarlyStopping, MetricsLogger, Trainer
from .masker import SignalMasker, invert_signals, validate_batch
from .metrics import confusion_matrix, cross_entropy_ignore_index
from .scheduler import PlateauController, exp_warmup_schedule
from .step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    parallelize_eval_step,
    parallelize_train_step,
)

__all__ = [
    'Trainer',
    'EarlyStopping',
    'MetricsLogger',
    'CheckpointManager',
    'SleepDataModule',
    'get_parquet_fps_for_dataset',
    'stage_to_local',
    'SignalMasker',
    'invert_signals',
    'validate_batch',
    'confusion_matrix',
    'cross_entropy_ignore_index',
    'PlateauController',
    'exp_warmup_schedule',
    'TrainState',
    'init_train_state',
    'make_optimizer',
    'make_train_step',
    'make_eval_step',
    'parallelize_train_step',
    'parallelize_eval_step',
]
