"""Background-thread batch prefetching with device staging.

The reference keeps its accelerator fed with 2 DataLoader worker processes
(reference utils/dataset.py:54-60). The TPU-native equivalent is a daemon
thread that runs the numpy collate pipeline ahead of the training step and
eagerly stages arrays on device with ``jax.device_put``, so host-side
collate and H2D transfer overlap device compute without breaking JAX's
async dispatch.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import numpy as np

_DONE = object()


def _stage(batch):
    """device_put every ndarray in a (possibly nested) batch tuple."""
    import jax

    def put(x):
        if isinstance(x, np.ndarray) and x.dtype != object:
            return jax.device_put(x)
        return x

    if isinstance(batch, (tuple, list)):
        return type(batch)(put(x) for x in batch)
    return put(batch)


def prefetch(iterable: Iterable, size: int = 2,
             device_put: bool = True, stage=None) -> Iterator:
    """Iterate ``iterable`` on a daemon thread, ``size`` batches ahead.

    Producer exceptions re-raise at the consumer. The queue holds batches
    already staged on device (unless ``device_put=False``).  ``stage``
    overrides the default whole-batch ``jax.device_put`` — the SPMD train
    loops pass ``parallel.mesh.stage_batch`` so batches land pre-sharded on
    the mesh's data axis without breaking the prefetch overlap.
    """
    if stage is None:
        stage = _stage
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()

    def put(item):
        # bounded put that gives up when the consumer is gone — train loops
        # break out mid-epoch at session/step boundaries, and a plain
        # q.put would leave this thread blocked forever holding
        # device-staged batches (pinned HBM) for the life of the process
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterable:
                if not put(stage(batch) if device_put else batch):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            put(e)
            return
        put(_DONE)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while t.is_alive():  # drain so the producer sees the stop flag
            try:
                q.get_nowait()
            except queue.Empty:
                t.join(timeout=0.05)
