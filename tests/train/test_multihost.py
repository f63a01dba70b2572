"""Multi-host training path: 2 real processes under jax.distributed, each
contributing a process-local batch shard (the TPU-VM pod input pipeline,
reference role: Lightning DDP's per-rank loaders).

Two layers of coverage:
- ``test_two_process_distributed_train_step``: the raw jitted step over
  ``global_batch_from_local`` (round-2 vintage).
- ``test_two_process_trainer_fit``: the FULL ``Trainer.fit`` — datamodule
  per-process train-file sharding, staged local batches through
  ``global_batch_from_local`` (train/loop.py ``_device_batch``), the eval
  matrix, rank-zero-coordinated Orbax checkpointing on a shared directory,
  and restore — asserting the metrics match an equivalent single-process
  run (the reference's production path runs its full Lightning loop on
  every DDP rank, src/wav2sleep/trainer/main.py:41-46).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))

WORKER = r'''
import os, sys
import numpy as np
import jax

jax.config.update('jax_platforms', 'cpu')
# Generous handshake timeout: on this 1-core host a concurrent compile or
# test process can delay the second worker past the 300 s default.
jax.distributed.initialize(
    coordinator_address=os.environ['W2S_COORD'],
    num_processes=2,
    process_id=int(sys.argv[1]),
    initialization_timeout=600,
)
import jax.numpy as jnp

from wav2sleep_tpu import models as jm
from wav2sleep_tpu.parallel.mesh import (
    global_batch_from_local, make_mesh, replicate, warmup_collectives,
)
from wav2sleep_tpu.train.scheduler import exp_warmup_schedule
from wav2sleep_tpu.train.step import init_train_state, make_optimizer, make_train_step

pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
n_global = jax.device_count()

model = jm.Wav2Sleep(
    signal_encoders=jm.SignalEncoders(
        signal_map=jm.as_signal_map({'ECG': 'ECG'}), feature_dim=8, activation='gelu',
        norm='instance', chunk_causal=False, initial_channels=2, max_channels=4,
    ),
    epoch_mixer=jm.MultiModalAttentionEmbedder(feature_dim=8, layers=1, dim_ff=16, nhead=2, dropout=0.0),
    sequence_mixer=jm.SequenceCNN(feature_dim=8, num_layers=1, kernel_size=3, num_dilations=1, norm='layer', dropout=0.0),
    num_classes=4,
)
# Each process loads ITS OWN two nights (deterministic, process-dependent).
rng = np.random.default_rng(100 + pid)
local_x = {'ECG': rng.normal(size=(2, 1024 * 2)).astype(np.float32)}
local_y = rng.integers(0, 4, size=(2, 2)).astype(np.float32)

mesh = make_mesh(jax.devices(), data=n_global, model=1)
tx = make_optimizer(exp_warmup_schedule(1e-3, 10, 100), weight_decay=1e-4, grad_clip=1.0)
state = init_train_state(model, tx, {'ECG': local_x['ECG'][:1]}, jax.random.PRNGKey(0))
step = make_train_step(model, tx, num_classes=4, masker=None, flip_polarity=False)
with mesh:
    state = replicate(mesh, state)
    # Lockstep-aligned Gloo context creation BEFORE the first big compile:
    # on an oversubscribed host, import/compile skew between the two
    # processes otherwise blows the 30 s context-init deadline.
    warmup_collectives(mesh)
    batch = global_batch_from_local(mesh, (local_x, local_y))
    step = jax.jit(step)
    rng_dev = replicate(mesh, jax.random.PRNGKey(1))
    state, metrics = step(state, batch, rng_dev)
    loss = float(np.asarray(jax.device_get(metrics['loss'])))
    cmat = int(np.asarray(jax.device_get(metrics['cmat'])).sum())
print(f'RESULT {pid} {loss:.10f} {cmat}', flush=True)
'''


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO,
        JAX_PLATFORMS='cpu',
        XLA_FLAGS='--xla_force_host_platform_device_count=2 '
        # Gloo context init + collective ops default to a 30 s deadline;
        # on this oversubscribed 1-core host two workers' compile/dispatch
        # skew can exceed it even with the lockstep warmup barrier.
        '--xla_cpu_collective_timeout_seconds=600',
        W2S_COORD=f'localhost:{port}',
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, '.cache', 'jax'),
    )
    script = tmp_path / 'worker.py'
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith('RESULT')][-1]
        _, pid, loss, cmat = line.split()
        results[int(pid)] = (float(loss), int(cmat))
    assert set(results) == {0, 1}
    # Both processes see the same global loss, and the psum'd confusion
    # matrix counts every epoch of the GLOBAL batch (4 nights x 2 epochs).
    assert results[0][0] == results[1][0]
    assert results[0][1] == results[1][1] == 8


FIT_WORKER = r'''
import json, os, sys
import numpy as np
import jax

jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=os.environ['W2S_COORD'],
    num_processes=2,
    process_id=int(sys.argv[1]),
    initialization_timeout=600,
)
pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()

from tests.train.test_trainer_smoke import make_trainer
from wav2sleep_tpu.parallel.mesh import make_mesh

corpus = os.environ['W2S_CORPUS']
logdir = os.environ['W2S_LOGDIR']
mesh = make_mesh(jax.devices(), data=jax.device_count(), model=1)
tr = make_trainer(corpus, logdir, mesh=mesh, epochs=2, masker=None, flip_polarity=False)
final = tr.fit()
print('RESULT %d %s' % (pid, json.dumps(final)), flush=True)

# Restore the shared checkpoint into a FRESH trainer (all processes restore
# the same rank-zero-written files) and re-run the eval matrix.
tr2 = make_trainer(corpus, os.path.join(logdir, 'restored_%d' % pid), mesh=make_mesh(jax.devices(), data=jax.device_count(), model=1), epochs=2, masker=None, flip_polarity=False)
resume_epoch = tr2.restore(os.path.join(logdir, 'checkpoints', 'last'))
val = tr2.evaluate('val')
print('RESTORED %d %d %s' % (pid, resume_epoch, json.dumps(val)), flush=True)
'''


@pytest.mark.slow
def test_two_process_trainer_fit(tmp_path):
    """Full Trainer.fit in 2 jax.distributed processes: per-process train
    shards through global_batch_from_local, eval matrix, shared-directory
    checkpointing, restore — metrics must match an equivalent single-process
    run (same global batch composition)."""
    from tests.train.test_trainer_smoke import make_trainer, write_corpus

    corpus = tmp_path / 'corpus'
    corpus.mkdir()
    write_corpus(corpus)
    logdir = tmp_path / 'mhrun'

    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO,
        JAX_PLATFORMS='cpu',
        XLA_FLAGS='--xla_force_host_platform_device_count=2 '
        # Gloo context init + collective ops default to a 30 s deadline;
        # on this oversubscribed 1-core host two workers' compile/dispatch
        # skew can exceed it even with the lockstep warmup barrier.
        '--xla_cpu_collective_timeout_seconds=600',
        W2S_COORD=f'localhost:{port}',
        W2S_CORPUS=str(corpus),
        W2S_LOGDIR=str(logdir),
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, '.cache', 'jax'),
    )
    script = tmp_path / 'fit_worker.py'
    script.write_text(FIT_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    finals, restores = {}, {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith('RESULT')][-1]
        _, pid, payload = line.split(maxsplit=2)
        finals[int(pid)] = json.loads(payload)
        line = [ln for ln in out.splitlines() if ln.startswith('RESTORED')][-1]
        _, pid, epoch, payload = line.split(maxsplit=3)
        restores[int(pid)] = (int(epoch), json.loads(payload))

    assert set(finals) == {0, 1}
    # Metrics are device_get of the same replicated global arrays — both
    # processes must report identical values.
    assert finals[0] == finals[1]
    assert restores[0] == restores[1]

    # Equivalent single-process run: same GLOBAL batch composition — the
    # multi-host loader feeds [host-0 shard rows, host-1 shard rows] per
    # step (global_batch_from_local places process 0's local data on the
    # first mesh devices), emulated here by concatenating the two
    # deterministic per-host shards.
    single = make_trainer(corpus, tmp_path / 'single', epochs=2, masker=None, flip_polarity=False)
    dm = single.datamodule
    from wav2sleep_tpu.data.dataset import batch_iterator
    from wav2sleep_tpu.train.datamodule import shard_train_files

    def two_host_loader(epoch):
        its = [
            iter(
                batch_iterator(
                    dm._make_dataset(shard_train_files(dm._train_fps, dm.seed + epoch, 2, h)),
                    batch_size=dm.batch_size,
                    shuffle=False,
                    drop_last=dm.drop_last,
                    num_threads=1,
                    pad_to_epochs=dm.pad_to_epochs,
                )
            )
            for h in (0, 1)
        ]
        while True:
            try:
                (x0, y0), (x1, y1) = next(its[0]), next(its[1])
            except StopIteration:
                return
            yield (
                {k: np.concatenate([x0[k], x1[k]], axis=0) for k in x0},
                np.concatenate([y0, y1], axis=0),
            )

    dm.train_loader = two_host_loader
    final_single = single.fit()

    assert set(finals[0]) == set(final_single)
    for key, v in final_single.items():
        np.testing.assert_allclose(
            finals[0][key], v, rtol=2e-3, atol=2e-3,
            err_msg=f'metric {key} diverged between 2-process and single-process runs',
        )

    # Restore resumed past the final epoch and reproduced the eval matrix.
    resume_epoch, restored_val = restores[0]
    assert resume_epoch == 2
    np.testing.assert_allclose(
        restored_val['val_loss'], finals[0]['val_loss'], rtol=1e-5, atol=1e-6,
        err_msg='post-restore val_loss diverged from the final fit val_loss',
    )
