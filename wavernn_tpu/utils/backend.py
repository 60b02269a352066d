"""Backend selection helpers."""
from __future__ import annotations

from typing import Optional

import jax


def use_pallas_default(override: Optional[bool] = None) -> bool:
    """Resolve a tri-state use_pallas flag: None -> the persistent-weights
    Pallas kernels on a TPU backend, the portable scan elsewhere (the
    Mosaic kernels cannot run on CPU outside interpret mode)."""
    if override is None:
        return jax.default_backend() == "tpu"
    return bool(override)


def resolve_recurrence(value: str = "auto", mesh=None) -> str:
    """Resolve the training-recurrence flag (WaveRNNTrainConfig.recurrence):
    "auto" -> the Pallas training-recurrence kernels (ops/pallas_gru.py) on
    a single-chip TPU backend, the portable lax.scan elsewhere.  Under a
    device mesh the jit-of-sharded-batch train step stays on scan: GSPMD
    has no partitioning rule for an opaque pallas_call, so it would
    replicate the recurrence across the data axis instead of sharding it.
    Explicit "scan"/"pallas" pass through."""
    if value == "auto":
        on_tpu = jax.default_backend() == "tpu"
        return "pallas" if (on_tpu and mesh is None) else "scan"
    return value
