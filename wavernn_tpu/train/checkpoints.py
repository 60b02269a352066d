"""Checkpoint system (reference utils/checkpoints.py:6-132).

Same scheme as the reference — paired weights/optim files, an always-
rewritten "latest" plus optional named snapshots, broken-pair detection,
create-if-missing restore with warm-start support — stored as flat .npz
archives of the parameter pytree (keys are '/'-joined tree paths), which
load instantly and need no framework at read time.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _key_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tree_to_flat(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        flat[_key_str(path)] = np.asarray(leaf)
    return flat


def flat_to_tree(flat: Dict[str, np.ndarray], like):
    """Rebuild a pytree with `like`'s structure from a flat dict."""
    import jax.numpy as jnp
    leaves_with_path = jax.tree_util.tree_leaves_with_path(like)
    new_leaves = []
    for path, leaf in leaves_with_path:
        k = _key_str(path)
        if k not in flat:
            raise KeyError(f"checkpoint missing key {k}")
        arr = flat[k]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {k}: "
                             f"{arr.shape} vs {np.shape(leaf)}")
        new_leaves.append(jnp.asarray(arr))
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_tree(path, tree):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(str(path), **tree_to_flat(tree))


def load_tree(path, like=None):
    with np.load(str(path)) as z:
        flat = {k: z[k] for k in z.files}
    if like is None:
        return flat
    return flat_to_tree(flat, like)


# -------------------------------------------------------------------------
# latest/named checkpoint scheme
# -------------------------------------------------------------------------

def save_checkpoint(model_name: str, workspace, params, opt_state, step: int,
                    name: Optional[str] = None, log=print, extra_meta=None):
    """Save latest (always) and optionally a named snapshot
    (checkpoints.py:29-76)."""
    if model_name == "voc":
        w_path, o_path = workspace.voc_latest_weights, workspace.voc_latest_optim
        named_w = workspace.get_voc_named_weights
        named_o = workspace.get_voc_named_optim
    elif model_name == "tts":
        w_path, o_path = workspace.tts_latest_weights, workspace.tts_latest_optim
        named_w = workspace.get_tts_named_weights
        named_o = workspace.get_tts_named_optim
    else:
        raise ValueError(model_name)

    meta = {"step": np.asarray(step)}
    if extra_meta:
        meta.update({k: np.asarray(v) for k, v in extra_meta.items()})
    save_tree(w_path, {"params": params, "meta": meta})
    save_tree(o_path, {"opt": opt_state})
    if name is not None:
        save_tree(named_w(name), {"params": params, "meta": meta})
        save_tree(named_o(name), {"opt": opt_state})
        log(f"Saved checkpoint {name}")


def restore_checkpoint(model_name: str, workspace, params, opt_state,
                       create_if_missing: bool = False,
                       init_weights_path: Optional[str] = None,
                       log=print) -> Tuple[Any, Any, int]:
    """Restore latest checkpoint; optionally create it (with warm-start
    weights and step reset, checkpoints.py:79-132).

    Returns (params, opt_state, step).
    """
    if model_name == "voc":
        w_path, o_path = workspace.voc_latest_weights, workspace.voc_latest_optim
    elif model_name == "tts":
        w_path, o_path = workspace.tts_latest_weights, workspace.tts_latest_optim
    else:
        raise ValueError(model_name)

    w_exists, o_exists = w_path.exists(), o_path.exists()
    if w_exists != o_exists:
        raise FileNotFoundError(
            f"Broken checkpoint pair: one of {w_path} / {o_path} is missing")

    if not w_exists:
        if not create_if_missing:
            raise FileNotFoundError(f"No checkpoint at {w_path}")
        if init_weights_path:
            loaded = load_tree(init_weights_path,
                               {"params": params, "meta": {"step": np.asarray(0)}})
            params = loaded["params"]
            log(f"Warm-started weights from {init_weights_path} (step reset)")
        save_checkpoint(model_name, workspace, params, opt_state, 0, log=log)
        return params, opt_state, 0

    loaded = load_tree(w_path, {"params": params, "meta": {"step": np.asarray(0)}})
    opt_loaded = load_tree(o_path, {"opt": opt_state})
    log(f"Restored checkpoint from {w_path}")
    return loaded["params"], opt_loaded["opt"], int(loaded["meta"]["step"])
