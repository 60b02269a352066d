"""Magnitude pruning with cubic sparsity schedule (reference
``notebooks/Pruning - Scratchpad.ipynb`` cells 3-4: PruneMask / Pruner).

Functional JAX version: a PruneSpec names which weight matrices to prune
and their gate-split counts (GRU: 3, LSTM: 4, Linear: 1); sparsity follows
  z(t) = Z * (1 - (1 - (t - t0)/S)^3)  clamped to [0, Z]
with masks recomputed every ``prune_every`` steps from weight magnitudes
(per gate split) and applied every step after t0.  Masks are plain pytrees
-> jit-friendly, checkpointable, and restart-safe (recompute from weights,
Pruner.restart semantics).

The pruned sample-loop path keeps masked weights dense in VMEM (zeros);
at the reference's 93.75% target a block-sparse VMEM layout is the follow-on
optimization.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class PruneSpec:
    """Which params to prune: list of (path, n_splits) where path addresses
    a 2D weight in the params pytree, e.g. ("rnn1", "wh") with 3 splits.

    Our GRU/LSTM weights are stored transposed (in, gates*h) relative to
    torch, so gate splits run along the LAST axis.
    """

    def __init__(self, entries: Sequence[Tuple[Tuple[str, ...], int]]):
        self.entries = list(entries)


def wavernn_prune_spec(prune_rnn_input: bool = True) -> PruneSpec:
    """The reference demo prunes the GRU weights (and optionally the input
    matrices) plus the FC layers."""
    entries = [
        (("rnn1", "wh"), 3),
        (("rnn2", "wh"), 3),
        (("fc1", "w"), 1),
        (("fc2", "w"), 1),
        (("fc3", "w"), 1),
    ]
    if prune_rnn_input:
        entries = [(("rnn1", "wi"), 3), (("rnn2", "wi"), 3)] + entries
    return PruneSpec(entries)


def sparsity_at(t, t0: int, S: int, Z: float):
    """Cubic schedule (Pruner.update_sparsity)."""
    z = Z * (1.0 - (1.0 - (t - t0) / S) ** 3)
    return jnp.clip(z, 0.0, Z)


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set(tree[path[0]], path[1:], value)
    return out


def mask_from_matrix(W, z, n_splits: int):
    """Per-gate-split magnitude mask (PruneMask.mask_from_matrix).

    W: (in, n_splits * h); split along the gate axis, zero the smallest
    z-fraction of each split."""
    in_dim, out_dim = W.shape
    h = out_dim // n_splits
    Ws = W.reshape(in_dim, n_splits, h)
    Wa = jnp.abs(jnp.swapaxes(Ws, 0, 1)).reshape(n_splits, -1)  # (splits, in*h)
    sorted_abs = jnp.sort(Wa, axis=-1)
    n = in_dim * h
    k = jnp.clip((n * z).astype(jnp.int32), 0, n - 1)  # kth smallest = thresh
    thr = sorted_abs[:, k][:, None] if jnp.ndim(k) == 0 else \
        jnp.take_along_axis(sorted_abs, k[:, None], axis=-1)
    M = (Wa >= thr).astype(W.dtype).reshape(n_splits, in_dim, h)
    return jnp.swapaxes(M, 0, 1).reshape(in_dim, out_dim)


def block_mask_from_matrix(W, z, n_splits: int, block=(8, 128)):
    """TPU-structured magnitude pruning: zero whole (sublane x lane)-aligned
    blocks by block L2 norm, per gate split.

    Unstructured masks (mask_from_matrix) keep the VMEM-resident weights
    dense-with-zeros in the sample kernel; block-aligned masks make the
    zero pattern skippable by a block-sparse kernel (SURVEY §7 item 8) and
    already vectorize cleanly on the VPU.
    """
    in_dim, out_dim = W.shape
    h = out_dim // n_splits
    br, bc = block
    assert in_dim % br == 0 and h % bc == 0, (W.shape, block)
    Ws = W.reshape(in_dim, n_splits, h)
    # (splits, in/br, br, h/bc, bc) -> block norms (splits, in/br, h/bc)
    Wb = jnp.swapaxes(Ws, 0, 1).reshape(n_splits, in_dim // br, br,
                                        h // bc, bc)
    norms = jnp.sqrt(jnp.sum(Wb * Wb, axis=(2, 4)))
    flat = norms.reshape(n_splits, -1)
    nblk = flat.shape[1]
    k = jnp.clip((nblk * z).astype(jnp.int32), 0, nblk - 1)
    snorm = jnp.sort(flat, axis=-1)
    thr = snorm[:, k][:, None] if jnp.ndim(k) == 0 else \
        jnp.take_along_axis(snorm, k[:, None], axis=-1)
    keep = (flat >= thr).astype(W.dtype).reshape(n_splits, in_dim // br, 1,
                                                 h // bc, 1)
    M = jnp.broadcast_to(keep, (n_splits, in_dim // br, br, h // bc, bc))
    M = M.reshape(n_splits, in_dim, h)
    return jnp.swapaxes(M, 0, 1).reshape(in_dim, out_dim)


def init_masks(params, spec: PruneSpec):
    return {"/".join(path): jnp.ones_like(_get(params, path))
            for path, _ in spec.entries}


@partial(jax.jit, static_argnames=("spec", "t0", "S", "Z", "block"))
def update_masks(params, spec_entries_key, t, spec: PruneSpec, t0: int,
                 S: int, Z: float, block=None):
    """Recompute all masks at sparsity z(t) (PruneMask.update_mask).

    block=None -> unstructured per-element masks (the notebook's scheme);
    block=(br, bc) -> TPU-structured whole-block masks
    (block_mask_from_matrix), which the block-sparse sample kernel can skip.
    A matrix whose dims don't tile by ``block`` falls back to unstructured.
    """
    z = sparsity_at(t.astype(jnp.float32), t0, S, Z)
    masks = {}
    for path, n_splits in spec.entries:
        W = _get(params, path)
        h = W.shape[1] // n_splits
        if block is None or h % block[1] != 0:
            masks["/".join(path)] = mask_from_matrix(W, z, n_splits)
            continue
        # leading block-tile-divisible row slab gets whole-block masks;
        # any ragged tail rows (e.g. rnn2's 32 aux input rows appended to
        # its 512 state rows) are pruned unstructured at the same z — the
        # sample kernel splits such matrices at the same row boundary, so
        # the slab's pattern still feeds the gather-free sparse schedule
        k = (W.shape[0] // block[0]) * block[0]
        if k == 0:
            masks["/".join(path)] = mask_from_matrix(W, z, n_splits)
            continue
        top = block_mask_from_matrix(W[:k], z, n_splits, block)
        if k < W.shape[0]:
            rest = mask_from_matrix(W[k:], z, n_splits)
            top = jnp.concatenate([top, rest], axis=0)
        masks["/".join(path)] = top
    return masks


def apply_masks(params, masks, spec: Optional[PruneSpec] = None):
    """W *= M for every pruned matrix (PruneMask.apply_mask).  The mask
    keys are '/'-joined param paths, so ``spec`` is optional."""
    keys = (["/".join(p) for p, _ in spec.entries] if spec is not None
            else sorted(masks))
    for key in keys:
        path = tuple(key.split("/"))
        params = _set(params, path, _get(params, path) * masks[key])
    return params


class Pruner:
    """Step-driven orchestration (reference Pruner): update masks every
    ``prune_every`` steps after t0, apply every step after t0."""

    def __init__(self, spec: PruneSpec, start_prune: int, prune_steps: int,
                 target_sparsity: float, prune_every: int = 500, block=None):
        self.spec = spec
        self.t0 = start_prune
        self.S = prune_steps
        self.Z = target_sparsity
        self.prune_every = prune_every
        self.block = tuple(block) if block is not None else None
        self.masks = None

    def init(self, params):
        self.masks = init_masks(params, self.spec)
        return self.masks

    def step(self, params, t: int):
        """Returns (possibly masked) params; call once per training step."""
        if self.masks is None:
            self.init(params)
        if t > self.t0 and t % self.prune_every == 0:
            self.masks = update_masks(params, None, jnp.asarray(t), self.spec,
                                      self.t0, self.S, self.Z, self.block)
        if t >= self.t0:
            params = apply_masks(params, self.masks, self.spec)
        return params

    def masks_for_step(self, params, t: int):
        """Mask pytree to hand a jitted train step for step ``t``, or None
        before pruning starts.  Host-side scheduling (t is the Python-side
        step mirror), mask recompute on device every ``prune_every``."""
        if t < self.t0:
            return None
        if self.masks is None:
            self.init(params)
        if t > self.t0 and t % self.prune_every == 0:
            self.masks = update_masks(params, None, jnp.asarray(t), self.spec,
                                      self.t0, self.S, self.Z, self.block)
        return self.masks

    def restart(self, params, t: int):
        """Recompute masks after resuming from a checkpoint
        (Pruner.restart)."""
        self.masks = update_masks(params, None, jnp.asarray(t), self.spec,
                                  self.t0, self.S, self.Z, self.block)
        return self.masks

    def num_pruned(self) -> int:
        if self.masks is None:
            return 0
        return int(sum(float((1 - m).sum()) for m in self.masks.values()))

    def total_params(self) -> int:
        if self.masks is None:
            return 0
        return int(sum(m.size for m in self.masks.values()))
