"""Cross-layer contract: column names, sampling geometry, label maps.

TPU-native rebuild of the constants layer of wav2sleep
(reference: src/wav2sleep/settings.py:1-57). Every other module imports from
here; this module imports nothing.
"""

# Output column names
PPG = 'PPG'
ECG = 'ECG'
ABD = 'ABD'
THX = 'THX'
EOG_L = 'EOG-L'
EOG_R = 'EOG-R'
LABEL = 'Stage'
TIMESTAMP = 'Timestamp'
SLEEP = 'Sleep'
PRED = 'Pred'

# Recording length in hours during training. One night = 1,200 sleep epochs of 30 s.
TRAINING_LENGTH_HOURS = 10
EPOCH_SECONDS = 30.0
EPOCHS_PER_HOUR = 120

# Samples per 30-second sleep epoch for each signal
# (reference: src/wav2sleep/settings.py:16-26).
LOW_FREQ_SAMPLES_PER_EPOCH = 256
MEDIUM_FREQ_SAMPLES_PER_EPOCH = 1024
HIGH_FREQ_SAMPLES_PER_EPOCH = 4096
COLS_TO_SAMPLES_PER_EPOCH = {
    ABD: LOW_FREQ_SAMPLES_PER_EPOCH,
    THX: LOW_FREQ_SAMPLES_PER_EPOCH,
    ECG: MEDIUM_FREQ_SAMPLES_PER_EPOCH,
    PPG: MEDIUM_FREQ_SAMPLES_PER_EPOCH,
    EOG_L: HIGH_FREQ_SAMPLES_PER_EPOCH,
    EOG_R: HIGH_FREQ_SAMPLES_PER_EPOCH,
}

# Causal (online EMA) normalization parameters
# (reference: src/wav2sleep/settings.py:28-32).
CAUSAL_NORM_TAU_SECONDS = 900.0  # Variance-tracking time constant (15 min).
NORM_OUTLIER_THRESHOLD = 4.0  # Sigma threshold for residual clipping.
CAUSAL_NORM_BASELINE_TAU_SECONDS = 120.0  # Baseline (mean) tracking time constant.
CAUSAL_NORM_MIN_SIGMA = 0.1  # Sigma floor against near-zero variance.

# PSG datasets
SHHS = 'shhs'
MESA = 'mesa'
CFS = 'cfs'
CHAT = 'chat'
CCSHS = 'ccshs'
MROS = 'mros'
WSC = 'wsc'
CENSUS = 'census'  # Census-balanced benchmark split (Jones et al.)

KNOWN_DATASETS = [SHHS, MESA, CFS, CHAT, CCSHS, MROS, WSC, CENSUS]

INGEST = 'ingest'  # Per-dataset staging folder for parquet before splitting.
TRAIN, VAL, TEST = 'train', 'val', 'test'

# Mappings from five-class sleep stages to integer labels per num_classes
# (reference: src/wav2sleep/settings.py:52-56). 4-class merges N1+N2 -> Light.
INTEGER_LABEL_MAPS = {
    4: {0: 0, 1: 1, 2: 1, 3: 2, 4: 3},
    5: {0: 0, 1: 1, 2: 2, 3: 3, 4: 4},
}

# Human-readable category names per class count (reference: src/wav2sleep/log.py:23-26).
SLEEP_STAGE_CATEGORIES = {
    4: ['Wake', 'N1+N2', 'N3', 'REM'],
    5: ['Wake', 'N1', 'N2', 'N3', 'REM'],
}

# Label value for unscored / ignored epochs.
IGNORE_LABEL = -1
