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
