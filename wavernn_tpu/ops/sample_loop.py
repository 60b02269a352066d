"""Autoregressive WaveRNN sample loop as a compiled lax.scan.

The reference runs this loop in Python with per-step GRUCell calls
(fatchord_version.py:201-241) — here the whole T-step recurrence is one
compiled XLA while-loop.  All conditioning-side matmuls (mel/aux streams)
are hoisted out of the recurrence into big MXU GEMMs over (B, T, ·); the
loop body only computes the state-dependent matmuls.

A Pallas persistent-weights kernel for the same computation lives in
ops/pallas_gen.py; this scan version is the portable reference path and the
numerical oracle for it.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import WaveRNNConfig
from ..models.distribution import (
    sample_from_discretized_mix_logistic_with_noise,
    sample_raw_categorical_with_noise,
)


def _split_cond(params, mels_up, aux, voc: WaveRNNConfig, dtype=None):
    """Precompute every conditioning-dependent projection for all T steps.

    Returns per-step tensors (B, T, ·):
      i_cond   : [m_t, a1] @ I_w[1:] + I_b        (input-layer cond part)
      gi2_cond : a2 @ rnn2.wi[rnn:]                (GRU2 input cond part)
      f1_cond  : a3 @ fc1.w[rnn:] + fc1.b
      f2_cond  : a4 @ fc2.w[fc:] + fc2.b
    """
    a = voc.aux_dims
    a1 = aux[..., 0 * a:1 * a]
    a2 = aux[..., 1 * a:2 * a]
    a3 = aux[..., 2 * a:3 * a]
    a4 = aux[..., 3 * a:4 * a]

    I_w, I_b = params["I"]["w"], params["I"]["b"]
    i_cond = jnp.concatenate([mels_up, a1], axis=-1) @ I_w[1:] + I_b

    R = voc.rnn_dims
    gi2_cond = a2 @ params["rnn2"]["wi"][R:]
    f1_cond = a3 @ params["fc1"]["w"][R:] + params["fc1"]["b"]
    f2_cond = a4 @ params["fc2"]["w"][voc.fc_dims:] + params["fc2"]["b"]
    if dtype is not None:
        i_cond, gi2_cond, f1_cond, f2_cond = (
            t.astype(dtype) for t in (i_cond, gi2_cond, f1_cond, f2_cond))
    return i_cond, gi2_cond, f1_cond, f2_cond


def _gru_gates(gi, gh, h):
    H = h.shape[-1]
    # sigmoid(x) == 0.5*tanh(x/2)+0.5 — matches the pallas kernel exactly
    r = 0.5 * jnp.tanh(0.5 * (gi[..., :H] + gh[..., :H])) + 0.5
    z = 0.5 * jnp.tanh(0.5 * (gi[..., H:2 * H] + gh[..., H:2 * H])) + 0.5
    n = jnp.tanh(gi[..., 2 * H:] + r * gh[..., 2 * H:])
    return (1.0 - z) * n + z * h


@partial(jax.jit, static_argnames=("voc", "bits", "state_snapshot_at"))
def generate_scan_with_state(params, mels_up, aux, voc: WaveRNNConfig,
                             bits: int, key,
                             noise: Optional[tuple] = None,
                             init_state: Optional[tuple] = None,
                             state_snapshot_at: Optional[int] = None):
    """Sample loop with explicit RNN-state I/O.

    init_state: optional (h1, h2, x) to resume from (exact-seam fold
    handoff); state_snapshot_at: optional step index t — also return the
    (h1, h2, x) state as it stood *entering* step t.
    Returns (samples (B,T), snapshot_state).
    """
    B, T, _ = mels_up.shape
    R = voc.rnn_dims
    n_classes = voc.n_classes(bits)

    i_cond, gi2_cond, f1_cond, f2_cond = _split_cond(params, mels_up, aux, voc)

    I_wx = params["I"]["w"][0]          # (R,) — the sample-input row
    wi1, wh1 = params["rnn1"]["wi"], params["rnn1"]["wh"]
    bi1, bh1 = params["rnn1"]["bi"], params["rnn1"]["bh"]
    wi2_x = params["rnn2"]["wi"][:R]
    wh2 = params["rnn2"]["wh"]
    bi2, bh2 = params["rnn2"]["bi"], params["rnn2"]["bh"]
    f1_wx = params["fc1"]["w"][:R]
    f2_wx = params["fc2"]["w"][:voc.fc_dims]
    f3_w, f3_b = params["fc3"]["w"], params["fc3"]["b"]

    if noise is None:
        if voc.mode == "MOL":
            nr_mix = n_classes // 3
            k1, k2 = jax.random.split(key)
            u_mix = jax.random.uniform(k1, (T, B, nr_mix), minval=1e-5,
                                       maxval=1.0 - 1e-5)
            u_s = jax.random.uniform(k2, (T, B), minval=1e-5,
                                     maxval=1.0 - 1e-5)
            noise = (u_mix, u_s)
        else:
            noise = jax.random.uniform(key, (T, B, n_classes), minval=1e-9,
                                       maxval=1.0)

    def step(carry, inputs):
        t, (h1, h2, x), snap = carry
        if voc.mode == "MOL":
            ic, g2c, f1c, f2c, (um, us) = inputs
        else:
            ic, g2c, f1c, f2c, u = inputs
        if state_snapshot_at is not None:
            # capture the state *entering* step `state_snapshot_at`
            snap = jax.tree_util.tree_map(
                lambda s, n: jnp.where(t == state_snapshot_at, n, s),
                snap, (h1, h2, x))

        inp = ic + x[:, None] * I_wx                       # (B, R)
        h1 = _gru_gates(inp @ wi1 + bi1, h1 @ wh1 + bh1, h1)
        xr = inp + h1
        gi2 = xr @ wi2_x + g2c + bi2
        h2 = _gru_gates(gi2, h2 @ wh2 + bh2, h2)
        x2 = xr + h2
        hf = jax.nn.relu(x2 @ f1_wx + f1c)
        hf = jax.nn.relu(hf @ f2_wx + f2c)
        logits = hf @ f3_w + f3_b

        if voc.mode == "MOL":
            sample = sample_from_discretized_mix_logistic_with_noise(
                logits, um, us)
        else:
            sample = sample_raw_categorical_with_noise(logits, u)
        return (t + 1, (h1, h2, sample), snap), sample

    if init_state is None:
        h0 = jnp.zeros((B, R), mels_up.dtype)
        x0 = jnp.zeros((B,), mels_up.dtype)
        state0 = (h0, h0, x0)
    else:
        state0 = init_state
    snap0 = jax.tree_util.tree_map(jnp.zeros_like, state0)
    xs = (jnp.swapaxes(i_cond, 0, 1), jnp.swapaxes(gi2_cond, 0, 1),
          jnp.swapaxes(f1_cond, 0, 1), jnp.swapaxes(f2_cond, 0, 1), noise)
    (_, final, snap), samples = jax.lax.scan(
        step, (jnp.asarray(0, jnp.int32), state0, snap0), xs)
    return (jnp.swapaxes(samples, 0, 1),
            snap if state_snapshot_at is not None else final)


def generate_scan(params, mels_up, aux, voc: WaveRNNConfig, bits: int,
                  key, noise: Optional[tuple] = None):
    """Run the sample loop. mels_up/aux: (B, T, ·) upsampled conditioning.

    noise: optionally ((T,B,nr_mix),(T,B)) MOL uniforms or (T,B,n_classes)
    RAW uniforms for deterministic replay (parity tests).
    Returns samples (B, T) float32 in [-1, 1].
    """
    samples, _ = generate_scan_with_state(params, mels_up, aux, voc, bits,
                                          key, noise=noise)
    return samples
