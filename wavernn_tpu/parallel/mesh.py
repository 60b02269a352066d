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
