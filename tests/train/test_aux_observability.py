"""Aux observability parity: dirty-git warning (reference hydra git.yaml
callback), MLflow system-metrics hook (reference scripts/train.py:28-29),
and the job wall-time line (reference hydra TimerCallback)."""

import importlib.util
import logging
import os
import subprocess
import sys
import types

REPO = os.path.join(os.path.dirname(__file__), '..', '..')


def _load_train_cli():
    spec = importlib.util.spec_from_file_location(
        'train_cli_aux', os.path.join(REPO, 'scripts', 'train.py')
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _git(cwd, *args):
    subprocess.run(
        ['git', *args],
        cwd=cwd,
        check=True,
        capture_output=True,
        env={**os.environ, 'GIT_AUTHOR_NAME': 't', 'GIT_AUTHOR_EMAIL': 't@t',
             'GIT_COMMITTER_NAME': 't', 'GIT_COMMITTER_EMAIL': 't@t'},
    )


def test_warn_if_dirty_git(tmp_path, caplog):
    mod = _load_train_cli()
    repo = tmp_path / 'repo'
    repo.mkdir()
    _git(repo, 'init')
    (repo / 'a.txt').write_text('x')
    _git(repo, 'add', 'a.txt')
    _git(repo, 'commit', '-m', 'init')
    assert mod.warn_if_dirty_git(str(repo)) is False  # clean tree: no warning

    (repo / 'a.txt').write_text('modified')
    with caplog.at_level(logging.WARNING, logger='train'):
        assert mod.warn_if_dirty_git(str(repo)) is True
    assert any('dirty' in r.message for r in caplog.records)
    assert mod.warn_if_dirty_git(str(repo), debug=True) is False  # debug opt-out


def test_mlflow_system_metrics_enabled(tmp_path, monkeypatch):
    calls = []
    fake = types.ModuleType('mlflow')
    fake.enable_system_metrics_logging = lambda: calls.append('on')
    fake.log_metrics = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, 'mlflow', fake)
    monkeypatch.setenv('MLFLOW_TRACKING_URI', 'file://' + str(tmp_path / 'mlruns'))

    from wav2sleep_tpu.train.loop import MetricsLogger

    MetricsLogger(str(tmp_path / 'logs'), num_classes=4)
    assert calls == ['on']
