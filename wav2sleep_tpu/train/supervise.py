"""Supervised training runs: stall detection + checkpoint-resume restarts.

SURVEY §5.3 (failure detection / fault tolerance). The reference delegates
this role to Lightning + SLURM requeue (a hung job is killed by the
scheduler's time limit and resubmitted with ``ckpt_path=last``); on
relay-attached TPUs the failure mode is sharper — the orchestrator-side
transport can silently stop returning device→host replies, leaving the
training process blocked in a fetch forever while its queues sit empty
(docs/design.md "Transport fault tolerance"). ``utils.robust_fetch``
survives per-request reply loss, but once the channel itself is dead only
a fresh process (fresh client, fresh connections) recovers.

``run_supervised`` runs ``scripts/train.py`` in a subprocess pinned to ONE
run directory (config key ``run_dir``), watches the child's combined
stdout/stderr file for liveness (tqdm writes every step, so silence means
a wedge — the timeout must exceed the worst cold-compile gap), and on
stall sends SIGABRT first (``PYTHONFAULTHANDLER=1`` in the child turns
that into an all-thread stack dump in the log) before SIGKILL. Each
restart appends ``ckpt_path=last`` when a checkpoint exists, so completed
epochs are never re-trained and every attempt appends to the same
``metrics.jsonl`` (epoch rows re-run after a mid-epoch wedge are
deduplicated by readers keying on ``step``; last row wins).
"""

from __future__ import annotations

import logging
import os
import signal
import subprocess
import sys
import time

logger = logging.getLogger(__name__)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class SupervisedRunFailed(RuntimeError):
    pass


def _terminate(child: subprocess.Popen, grace: float = 45.0) -> None:
    """SIGABRT (faulthandler stack dump) -> wait -> SIGKILL -> wait.

    The final wait is unconditional: a killed TPU process can linger
    holding the device tunnel for a while; reaping it before returning
    keeps the next attempt from wedging at import.
    """
    try:
        child.send_signal(signal.SIGABRT)
    except ProcessLookupError:
        return
    try:
        child.wait(timeout=grace)
        return
    except subprocess.TimeoutExpired:
        pass
    try:
        child.kill()
    except ProcessLookupError:
        pass
    child.wait()


def run_supervised(
    overrides: list[str],
    run_dir: str,
    *,
    stall_timeout: float = 900.0,
    max_attempts: int = 5,
    poll: float = 20.0,
    train_script: str | None = None,
    post_kill_grace: float = 30.0,
) -> str:
    """Drive ``scripts/train.py`` to completion under a stall watchdog.

    Returns the path of the per-attempt log file of the SUCCESSFUL attempt.
    Raises SupervisedRunFailed when every attempt stalls or exits non-zero
    (a non-zero exit with a live log is a real error — config typo, OOM —
    and is NOT retried: retrying it would loop max_attempts times to the
    same crash; only stalls are retried).
    """
    os.makedirs(run_dir, exist_ok=True)
    script = train_script or os.path.join(REPO, 'scripts', 'train.py')
    for attempt in range(max_attempts):
        argv = [sys.executable, script, *overrides, f'run_dir={run_dir}']
        ckpt = os.path.join(run_dir, 'checkpoints', 'last')
        if attempt > 0 and os.path.isdir(ckpt):
            argv.append('ckpt_path=last')
        log_fp = os.path.join(run_dir, f'supervised_attempt{attempt}.log')
        env = {**os.environ, 'PYTHONFAULTHANDLER': '1', 'PYTHONUNBUFFERED': '1'}
        logger.info('supervised attempt %d: %s (log %s)', attempt, ' '.join(argv[2:]), log_fp)
        with open(log_fp, 'wb') as logf:
            child = subprocess.Popen(argv, stdout=logf, stderr=subprocess.STDOUT, env=env)
            stalled = False
            while True:
                try:
                    rc = child.wait(timeout=poll)
                    break
                except subprocess.TimeoutExpired:
                    pass
                silent = time.time() - os.path.getmtime(log_fp)
                if silent > stall_timeout:
                    logger.warning(
                        'supervised attempt %d stalled (%.0fs of log silence) — '
                        'SIGABRT for stacks, then restart from last checkpoint',
                        attempt, silent,
                    )
                    _terminate(child)
                    stalled = True
                    rc = child.returncode
                    break
        if not stalled and rc == 0:
            return log_fp
        if not stalled:
            tail = open(log_fp, 'rb').read()[-4000:].decode(errors='replace')
            # A robust_fetch death ("device fetch failed: no reply ...") is a
            # transport failure, not a code error: the D2H channel died and
            # the process exited loudly after bounded retries. Retry it like
            # a stall — a fresh process gets fresh connections. (This path,
            # not log-silence, is how drain wedges surface: robust_fetch's
            # periodic warnings keep the log mtime fresh.)
            if 'device fetch failed' not in tail:
                raise SupervisedRunFailed(
                    f'train.py exited rc={rc} on attempt {attempt} (not a '
                    f'stall or transport failure; not retrying). Log tail:\n{tail}'
                )
            logger.warning(
                'supervised attempt %d died of a transport failure (rc=%s) — '
                'restarting from last checkpoint', attempt, rc,
            )
        # Stall path: give a lingering tunnel hold time to clear.
        time.sleep(post_kill_grace)
    raise SupervisedRunFailed(f'all {max_attempts} attempts stalled ({run_dir})')
