"""Multi-host training path: 2 real processes under jax.distributed, each
contributing a process-local batch shard (the TPU-VM pod input pipeline,
reference role: Lightning DDP's per-rank loaders)."""

import os
import socket
import subprocess
import sys

import numpy as np


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
from wav2sleep_tpu.parallel.mesh import global_batch_from_local, make_mesh, replicate
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
    batch = global_batch_from_local(mesh, (local_x, local_y))
    step = jax.jit(step)
    rng_dev = jax.device_put(jax.random.PRNGKey(1), jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    state, metrics = step(state, batch, rng_dev)
    loss = float(np.asarray(jax.device_get(metrics['loss'])))
    cmat = int(np.asarray(jax.device_get(metrics['cmat'])).sum())
print(f'RESULT {pid} {loss:.10f} {cmat}', flush=True)
'''


def test_two_process_distributed_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO,
        JAX_PLATFORMS='cpu',
        XLA_FLAGS='--xla_force_host_platform_device_count=2',
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
