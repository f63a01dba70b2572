"""ParquetDataset semantics: normalization, -inf padding, label mapping."""

import numpy as np
import pandas as pd
import pytest

from wav2sleep_tpu.data.dataset import ParquetDataset, batch_iterator, collate, pad_or_truncate_item


def make_night(tmp_path, name='n1', epochs=8, cols=('ECG', 'THX'), labels=True, label_values=None):
    data = {}
    rng = np.random.default_rng(abs(hash(name)) % 2**32)
    n_label_rows = epochs
    length = {'ECG': 1024, 'PPG': 1024, 'ABD': 256, 'THX': 256, 'EOG-L': 4096, 'EOG-R': 4096}
    total = max(length[c] * epochs for c in cols)
    for c in cols:
        x = np.full(total, np.nan, dtype=np.float32)
        x[: length[c] * epochs] = rng.normal(size=length[c] * epochs) * 3 + 1
        data[c] = x
    if labels:
        lv = label_values if label_values is not None else rng.integers(0, 5, size=n_label_rows)
        stage = np.full(total, np.nan, dtype=np.float32)
        stage[:n_label_rows] = lv
        data['Stage'] = stage
    df = pd.DataFrame(data)
    fp = str(tmp_path / f'{name}.parquet')
    df.to_parquet(fp)
    return fp


def test_basic_item(tmp_path):
    fp = make_night(tmp_path, epochs=8, cols=('ECG', 'THX'), label_values=[0, 1, 2, 3, 4, 4, 0, 9 % 5])
    ds = ParquetDataset([fp], columns=['ECG', 'THX', 'PPG'], num_classes=4)
    signals, labels = ds[0]
    assert signals['ECG'].shape == (1024 * 8,)
    assert signals['THX'].shape == (256 * 8,)
    # Missing PPG padded with -inf at its own rate.
    assert signals['PPG'].shape == (1024 * 8,)
    assert np.isinf(signals['PPG']).all() and (signals['PPG'] < 0).all()
    # 4-class mapping: 0->0, 1->1, 2->1, 3->2, 4->3.
    np.testing.assert_array_equal(labels, [0, 1, 1, 2, 3, 3, 0, 3])
    # z-score normalization applied.
    assert abs(signals['ECG'].mean()) < 1e-3
    assert abs(signals['ECG'].std() - 1) < 1e-2


def test_five_class_labels(tmp_path):
    fp = make_night(tmp_path, epochs=4, cols=('EOG-L',), label_values=[0, 1, 2, 4])
    ds = ParquetDataset([fp], columns=['EOG-L'], num_classes=5)
    _, labels = ds[0]
    np.testing.assert_array_equal(labels, [0, 1, 2, 4])


def test_max_length_truncation(tmp_path):
    fp = make_night(tmp_path, epochs=240, cols=('THX',))
    ds = ParquetDataset([fp], columns=['THX'], max_length_hours=1)
    signals, labels = ds[0]
    assert signals['THX'].shape == (256 * 120,)
    assert labels.shape == (120,)


def test_length_mismatch_raises(tmp_path):
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            'ECG': rng.normal(size=1024 * 8).astype(np.float32),
            'THX': np.concatenate([rng.normal(size=256 * 4), np.full(1024 * 8 - 256 * 4, np.nan)]).astype(
                np.float32
            ),
            'Stage': np.concatenate([np.zeros(8), np.full(1024 * 8 - 8, np.nan)]).astype(np.float32),
        }
    )
    fp = str(tmp_path / 'bad.parquet')
    df.to_parquet(fp)
    ds = ParquetDataset([fp], columns=['ECG', 'THX'])
    with pytest.raises(ValueError, match='disagree'):
        ds[0]


def test_no_labels_dummy(tmp_path):
    fp = make_night(tmp_path, epochs=4, cols=('ECG',), labels=False)
    ds = ParquetDataset([fp], columns=['ECG'], require_labels=False)
    _, labels = ds[0]
    np.testing.assert_array_equal(labels, [-1, -1, -1, -1])


def test_unscored_label_is_ignore(tmp_path):
    # Ingestion writes unscored epochs as -1 (reference 1_ingest.py:132);
    # -1 is absent from the label map, so it maps to NaN -> fillna(-1) -> -1.
    fp = make_night(tmp_path, epochs=3, cols=('ECG',), label_values=[0, -1, 4])
    ds = ParquetDataset([fp], columns=['ECG'], num_classes=4)
    _, labels = ds[0]
    np.testing.assert_array_equal(labels, [0, -1, 3])


def test_causal_normalization_mode(tmp_path):
    fp = make_night(tmp_path, epochs=8, cols=('ECG',))
    ds = ParquetDataset([fp], columns=['ECG'], causal=True)
    signals, _ = ds[0]
    assert np.isfinite(signals['ECG']).all()


def test_collate_and_batch_iterator(tmp_path):
    fps = [make_night(tmp_path, name=f'n{i}', epochs=8, cols=('ECG',)) for i in range(5)]
    ds = ParquetDataset(fps, columns=['ECG'])
    batches = list(batch_iterator(ds, batch_size=2, shuffle=True, seed=0, num_threads=2))
    assert len(batches) == 3
    x, y = batches[0]
    assert x['ECG'].shape == (2, 1024 * 8)
    assert y.shape == (2, 8)


def test_pad_or_truncate(tmp_path):
    fp = make_night(tmp_path, epochs=8, cols=('ECG', 'PPG'))
    ds = ParquetDataset([fp], columns=['ECG', 'PPG', 'ABD'])
    item = ds[0]
    padded = pad_or_truncate_item(item, 10)
    assert padded[0]['ECG'].shape == (1024 * 10,)
    assert padded[0]['ABD'].shape == (256 * 10,)
    assert np.isinf(padded[0]['ABD']).all()  # -inf columns stay -inf when padded
    assert (padded[1][8:] == -1).all()
    truncated = pad_or_truncate_item(item, 4)
    assert truncated[0]['ECG'].shape == (1024 * 4,)
    assert truncated[1].shape == (4,)


def test_batch_iterator_bounded_lookahead(tmp_path):
    """An abandoned iterator must not keep loading the whole epoch: the
    producer's submission window bounds completed-but-unconsumed batches
    (submitting every batch up front let workers pile an epoch's collated
    batches into host RAM and left a thread loading after the consumer
    broke out)."""
    import time

    fps = [make_night(tmp_path, name=f'n{i}', epochs=2, cols=('ECG',)) for i in range(24)]
    ds = ParquetDataset(fps, columns=['ECG'], num_classes=4)
    calls = {'n': 0}
    orig = ParquetDataset.__getitem__

    def counting(self, i):
        calls['n'] += 1
        return orig(self, i)

    ParquetDataset.__getitem__ = counting
    try:
        it = batch_iterator(ds, batch_size=1, num_threads=2, prefetch=2)
        next(it)
        next(it)
        it.close()
        time.sleep(0.5)  # let any in-flight futures finish
        # window = threads + prefetch = 4; consumed 2. Everything the
        # producer may legitimately have touched is well under the epoch.
        assert calls['n'] <= 12, calls['n']
    finally:
        ParquetDataset.__getitem__ = orig
