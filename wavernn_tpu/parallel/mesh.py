"""Device mesh + sharding story (replaces the reference's single-process
DataParallel, utils/__init__.py:22-36, with SPMD over a jax Mesh).

Design (SURVEY.md §2.2/§5): one logical mesh with a ``data`` axis spanning
hosts (DCN) x chips (ICI) and an optional ``model`` axis for GSPMD weight
sharding if a config ever exceeds one chip (these models don't — 4-11M
params — so the default layout is batch-sharded data parallel with fully
replicated parameters; gradient psums ride ICI, inserted by GSPMD from the
output shardings).

Utterance batches *and* generation fold batches both map onto the ``data``
axis: folds are embarrassingly parallel after their overlap warmup
(fatchord_version.py:293-340), so generation scales across chips with zero
mid-loop communication.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all visible devices on the
    data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def training_mesh(global_batch: int, devices=None) -> Mesh:
    """Production-training mesh: every device on the ``data`` axis.

    This is the in-path equivalent of the reference's in-loop DataParallel
    (utils/__init__.py:22-36 called from train_wavernn.py:116-117 and the
    three tacotron loops): the train CLIs call it unconditionally and run
    the same SPMD program on 1 chip or a pod slice.

    The reference asserts batch % n_gpus == 0 and dies; here the data axis
    is the LARGEST divisor of the global batch that fits the device count,
    so a batch that does not split evenly trains on fewer devices instead
    of crashing (with a warning) — the batch axis must divide exactly or
    GSPMD would pad unevenly across shards.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and global_batch % n != 0:
        n -= 1
    if n != len(devices):
        import warnings
        warnings.warn(
            f"global batch {global_batch} does not divide over "
            f"{len(devices)} devices; training data-parallel over {n}")
    return make_mesh(n_data=n, devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/fold) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in `batch` with its leading axis sharded on data."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def stage_batch(mesh: Mesh, batch):
    """Stage one training batch onto the mesh: numeric ndarray/jax-array
    elements get their leading (batch) axis sharded over ``data``; anything
    else (item-id lists, length lists) passes through untouched.

    Multi-host: each process holds only its per-host slice of the global
    batch (data/dataset.py shard slicing), so the global array is assembled
    from process-local shards — no cross-host data movement.
    """
    s = batch_sharding(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
            return jax.device_put(x, s)
        if isinstance(x, np.ndarray) and x.dtype.kind in "fiub":
            if multihost:
                return jax.make_array_from_process_local_data(s, x)
            return jax.device_put(x, s)
        return x

    if isinstance(batch, (tuple, list)):
        return type(batch)(put(x) for x in batch)
    return put(batch)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (jax.distributed).  No-op when single-process.

    Reads JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    (set by scripts/submit.sh) when arguments are omitted.

    On a CPU backend, cross-process collectives need an explicit transport;
    select gloo-over-TCP (the TPU backend ignores this and uses ICI/DCN).
    Exercised with real multiple processes in tests/test_multiprocess.py.
    """
    import os
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes is None or num_processes <= 1:
        return
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older jaxlib without pluggable CPU collectives
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_array(mesh: Mesh, full_array, spec: Optional[P] = None):
    """Assemble a globally-sharded jax.Array from a full (global-shape)
    host array that every process constructed identically (the seeded
    batcher guarantees this: both the vocoder split and the binned sampler
    derive from explicit seeds, data/dataset.py).

    Each process contributes only the shards its local devices own —
    the callback is evaluated per addressable shard, so no cross-process
    data movement happens here.
    """
    if spec is None:
        spec = P("data")
    sharding = NamedSharding(mesh, spec)
    full_array = np.asarray(full_array)
    return jax.make_array_from_callback(full_array.shape, sharding,
                                        lambda idx: full_array[idx])
