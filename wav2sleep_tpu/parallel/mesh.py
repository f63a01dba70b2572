"""Device mesh + sharding helpers.

The reference's only model-parallelism is DDP over GPUs
(scripts/config/training/main.yaml:17-20, trainer/main.py:41-46). The TPU
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis: batches are
sharded across it, parameters are replicated, and XLA inserts the gradient
``psum`` over ICI automatically when the loss is jitted with these shardings.
A ``model`` axis is kept in the mesh signature for forward-compatibility
(it is size 1 for this model family — see SURVEY.md §2.7: TP/PP/EP are
intentionally not built).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'

# One-shot barrier ids for warmup_collectives (coordination-service barriers
# cannot be reused; all processes call the warmup at the same code points,
# so a per-process counter stays in lockstep).
import itertools as _itertools

_WARMUP_SEQ = _itertools.count()


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed on TPU-VM pods (multi-host training).

    The reference delegates process-group setup to Lightning/NCCL
    (SURVEY.md §5.8); on TPU pods ``jax.distributed.initialize()``
    auto-discovers coordinates from the TPU environment. No-ops on
    single-host/CI setups. Returns True if running multi-process.
    """
    import logging
    import os

    pod_env = any(
        os.environ.get(k) for k in ('TPU_WORKER_HOSTNAMES', 'JAX_COORDINATOR_ADDRESS', 'MEGASCALE_COORDINATOR_ADDRESS')
    )
    # The initialize attempt MUST come before any backend probe:
    # jax.process_count() initializes the local-only XLA backend, after
    # which jax.distributed.initialize() can never succeed — probing first
    # would permanently (and silently) demote every env-var-triggered
    # multi-host run to unsynced single-host training.
    if pod_env:
        try:
            jax.distributed.initialize()
        except Exception as e:  # Already initialized / backend already up.
            if jax.process_count() == 1:
                # The environment asked for multi-host but we ended up
                # single-process: surface it loudly — training would run
                # with no gradient sync and duplicated data.
                logging.getLogger(__name__).warning(
                    'Multi-host env vars are set but jax.distributed.'
                    f'initialize() failed ({e}) and only one process is '
                    'visible; continuing SINGLE-host. Call '
                    'maybe_initialize_distributed() before any other JAX '
                    'use if multi-host was intended.'
                )
            else:
                logging.getLogger(__name__).info(f'jax.distributed already initialized: {e}')
    return jax.process_count() > 1


def global_batch_from_local(mesh: Mesh, batch):
    """Assemble a globally-sharded batch from per-process local shards
    (multi-host input pipeline: each host loads its own nights)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), batch
    )


def make_mesh(devices=None, data: int | None = None, model: int = 1) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f'{data=} * {model=} != {n} devices')
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=(DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with the batch axis sharded over data."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh.

    Multi-process meshes take a collective-FREE path: ``jax.device_put``
    onto a sharding that spans non-addressable devices routes through
    ``multihost_utils.assert_equal`` — an immediate cross-process allgather
    per leaf. That is both slow (one collective per parameter) and fragile:
    it becomes the program's first collective, and if a peer process is
    still compiling its first graph (compile-cache skew between hosts),
    Gloo's 30 s context-init key-value exchange times out (observed:
    ``GetKeyValue() timed out with key: cpu:gloo/...``). The state being
    replicated is per-process identical by construction (seeded init or a
    restored checkpoint), so build the global array directly from local
    per-device copies instead — no communication at all.
    """
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
    import jax.numpy as jnp

    local = list(mesh.local_devices)

    def _rep(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            # Match device_put's scalar promotion (python int -> int32 etc.).
            x = jnp.asarray(x)
        x = np.asarray(x)
        shards = [jax.device_put(x, d) for d in local]
        return jax.make_array_from_single_device_arrays(x.shape, sharding, shards)

    return jax.tree_util.tree_map(_rep, tree)


def warmup_collectives(mesh: Mesh) -> None:
    """Establish the cross-process communicator for the full-mesh clique
    with one trivial barrier while the processes are still in lockstep.

    Gloo context initialization exchanges ranks through the coordination
    service with a hard 30 s deadline (not configurable from jax). If the
    program's first collective is the first *train step*, that deadline
    races against inter-process compile skew (one host hitting the
    persistent compile cache while another misses can skew dispatch by
    minutes). A sub-second barrier right after mesh/state setup creates the
    communicator when skew is milliseconds; XLA caches it process-wide, so
    later collectives — however skewed their compiles — reuse it. No-op on
    single-process runs.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    seq = next(_WARMUP_SEQ)
    # Gate on the coordination-service barrier FIRST: it has no 30 s limit
    # (we grant 10 min), so even on heavily oversubscribed hosts — where
    # mere imports and datamodule setup skew processes by minutes — every
    # process enters the Gloo context-init window within milliseconds of
    # the others. Barrier ids are one-shot in the coordination service,
    # hence the per-call sequence suffix (restore paths re-warm).
    try:
        from jax._src import distributed

        client = distributed.global_state.client
    except Exception:
        client = None
    if client is not None:
        client.wait_at_barrier(f'w2s_warmup_{seq}', timeout_in_ms=600_000)
    multihost_utils.sync_global_devices(f'w2s_collectives_warmup_{seq}')


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data:
        raise ValueError(f'{global_batch=} not divisible by data-parallel size {n_data}')
    return global_batch // n_data
