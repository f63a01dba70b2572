"""Config composition tests (groups, interpolation, overrides)."""

import os

import pytest

from wav2sleep_tpu.config import ConfigError, compose

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'scripts', 'config')


def test_default_composition(monkeypatch):
    monkeypatch.setenv('WAV2SLEEP_DATA', '/data/x')
    cfg = compose(CONFIG_DIR, 'main', [])
    assert cfg['model']['_target_'].endswith('Wav2Sleep')
    assert cfg['model']['num_classes'] == 4
    assert cfg['model']['signal_encoders']['feature_dim'] == 128
    # ${inputs.signal_map} interpolation resolved.
    assert cfg['model']['signal_encoders']['signal_map'] == {
        'ABD': 'ABD', 'THX': 'THX', 'ECG': 'ECG', 'PPG': 'PPG'
    }
    assert cfg['data_location'] == '/data/x'
    assert cfg['datasets']['train'] == ['ccshs', 'cfs', 'chat', 'mesa', 'shhs', 'wsc']
    assert cfg['training']['optimizer']['lr'] == pytest.approx(1e-3)
    assert cfg['training']['scheduler']['name'] == 'expdecay'
    assert cfg['inputs']['masker']['dropouts']['ECG'] == 0.5


def test_group_overrides():
    cfg = compose(CONFIG_DIR, 'main', ['model=ppgnet', 'datasets=mesa', 'inputs=cardiorespiratory/ecg'])
    assert cfg['model']['_target_'].endswith('SleepPPGNet')
    assert cfg['datasets']['train'] == ['mesa']
    assert cfg['inputs']['signal_map'] == {'ECG': 'UNI'}
    assert 'masker' not in cfg['inputs']


def test_value_overrides_propagate_interpolation():
    cfg = compose(CONFIG_DIR, 'main', ['feature_dim=64', 'num_classes=5', 'causal=true'])
    assert cfg['model']['signal_encoders']['feature_dim'] == 64
    assert cfg['model']['num_classes'] == 5
    assert cfg['model']['signal_encoders']['causal'] is True


def test_nested_group_override():
    cfg = compose(CONFIG_DIR, 'main', ['training/scheduler=decay'])
    assert cfg['training']['scheduler']['name'] == 'plateau'


def test_debug_group_inherits():
    cfg = compose(CONFIG_DIR, 'main', ['debug=medium'])
    assert cfg['debug']['max_nights'] == 20
    assert cfg['debug']['level'] == 1


def test_bad_override_format():
    with pytest.raises(ConfigError):
        compose(CONFIG_DIR, 'main', ['not-an-override'])


def test_env_default(monkeypatch):
    monkeypatch.delenv('WAV2SLEEP_DATA', raising=False)
    cfg = compose(CONFIG_DIR, 'main', [])
    assert cfg['data_location'] == 'data'
