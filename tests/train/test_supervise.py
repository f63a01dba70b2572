"""train/supervise.py: stall detection + checkpoint-resume restarts.

Uses a fake train script so no TPU/JAX is involved: attempt 0 prints a few
lines then goes silent forever (a transport wedge); attempt 1 must be
launched with ``ckpt_path=last`` (the checkpoint dir exists by then) and
completes. Also pins: a clean non-zero exit is NOT retried.
"""

import json
import os
import sys
import textwrap

import pytest

from wav2sleep_tpu.train.supervise import SupervisedRunFailed, run_supervised

FAKE = textwrap.dedent(
    """
    import json, os, sys, time
    # argv: overrides... run_dir=...
    args = dict(a.split('=', 1) for a in sys.argv[1:])
    run_dir = args['run_dir']
    marker = os.path.join(run_dir, 'attempt_count')
    n = int(open(marker).read()) if os.path.exists(marker) else 0
    open(marker, 'w').write(str(n + 1))
    mode = args['mode']
    if mode == 'stall_then_ok' and n == 0:
        os.makedirs(os.path.join(run_dir, 'checkpoints', 'last'), exist_ok=True)
        print('epoch 0 done', flush=True)
        time.sleep(3600)  # wedge: no further output, never exits
    if mode == 'stall_then_ok':
        # Restart MUST resume: the supervisor appends ckpt_path=last.
        assert args.get('ckpt_path') == 'last', sys.argv
        print('resumed', flush=True)
    if mode == 'crash':
        print('boom', flush=True)
        sys.exit(3)
    if mode == 'transport_then_ok' and n == 0:
        os.makedirs(os.path.join(run_dir, 'checkpoints', 'last'), exist_ok=True)
        print('RuntimeError: device fetch failed: no reply after 2 '
              'fresh-buffer retries x 90s', flush=True)
        sys.exit(1)  # robust_fetch death: loud exit, log stays fresh
    if mode == 'transport_then_ok':
        assert args.get('ckpt_path') == 'last', sys.argv
    with open(os.path.join(run_dir, 'final_metrics.json'), 'w') as f:
        json.dump({'ok': 1.0, 'attempt': float(n)}, f)
    print('done', flush=True)
    """
)


@pytest.fixture()
def fake_script(tmp_path):
    fp = tmp_path / 'fake_train.py'
    fp.write_text(FAKE)
    return str(fp)


def test_stall_is_killed_and_resumed(fake_script, tmp_path):
    run_dir = str(tmp_path / 'run')
    log_fp = run_supervised(
        ['mode=stall_then_ok'],
        run_dir,
        # Generous vs the fake's instant first write: on the 1-core host a
        # loaded background compile can delay child startup by seconds, and
        # a too-tight timeout kills attempt 0 before it writes its
        # checkpoint (flaky assert on the resume leg).
        stall_timeout=10.0,
        poll=1.0,
        max_attempts=3,
        train_script=fake_script,
        post_kill_grace=0.1,
    )
    final = json.load(open(os.path.join(run_dir, 'final_metrics.json')))
    assert final == {'ok': 1.0, 'attempt': 1.0}  # attempt 1 finished it
    assert 'attempt1' in os.path.basename(log_fp)
    # Attempt 0's log survives for diagnosis and shows the pre-wedge output.
    a0 = open(os.path.join(run_dir, 'supervised_attempt0.log')).read()
    assert 'epoch 0 done' in a0


def test_clean_success_single_attempt(fake_script, tmp_path):
    run_dir = str(tmp_path / 'run')
    log_fp = run_supervised(
        ['mode=ok'], run_dir, stall_timeout=30.0, poll=0.5,
        train_script=fake_script, post_kill_grace=0.1,
    )
    assert 'attempt0' in os.path.basename(log_fp)
    assert json.load(open(os.path.join(run_dir, 'final_metrics.json')))['attempt'] == 0.0


def test_transport_death_is_retried_with_resume(fake_script, tmp_path):
    """A robust_fetch death (non-zero exit whose log carries 'device fetch
    failed') must be retried from the last checkpoint, unlike a real error."""
    run_dir = str(tmp_path / 'run')
    run_supervised(
        ['mode=transport_then_ok'], run_dir, stall_timeout=30.0, poll=0.5,
        max_attempts=3, train_script=fake_script, post_kill_grace=0.1,
    )
    final = json.load(open(os.path.join(run_dir, 'final_metrics.json')))
    assert final['attempt'] == 1.0


def test_real_error_is_not_retried(fake_script, tmp_path):
    run_dir = str(tmp_path / 'run')
    with pytest.raises(SupervisedRunFailed, match='rc=3'):
        run_supervised(
            ['mode=crash'], run_dir, stall_timeout=30.0, poll=0.5,
            train_script=fake_script, post_kill_grace=0.1,
        )
    assert open(os.path.join(run_dir, 'attempt_count')).read() == '1'
