"""Functional neural-net primitives with PyTorch-compatible semantics.

Everything is a pure function over parameter pytrees (nested dicts of
jnp arrays).  Gate math matches torch exactly so that reference checkpoints
(cuDNN GRU/LSTM weight layouts) import bit-for-bit:

  * GRU   (torch gate chunks [r, z, n], fatchord_version.py:117-119):
        r = sig(Wr x + br_i + Ur h + br_h)
        z = sig(Wz x + bz_i + Uz h + bz_h)
        n = tanh(Wn x + bn_i + r * (Un h + bn_h))
        h' = (1 - z) n + z h
  * LSTM  (torch gate chunks [i, f, g, o], tacotron.py:220-221)
  * Conv1d / Conv2d are NCW/NCHW like torch (tacotron.py:45, fatchord:77)
  * BatchNorm1d with running stats, momentum 0.1, eps 1e-5

Initializers mirror torch defaults (U(-1/sqrt(fan), 1/sqrt(fan))) so
from-scratch training behaves like the reference.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# --------------------------------------------------------------------------
# Linear
# --------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(kw, (in_dim, out_dim), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), bound, dtype)
    return p


def linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


# --------------------------------------------------------------------------
# Conv1d (NCW) / Conv2d (NCHW)
# --------------------------------------------------------------------------

def conv1d_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True,
                dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel)
    p = {"w": _uniform(kw, (out_ch, in_ch, kernel), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), bound, dtype)
    return p


def conv1d(p, x, stride: int = 1, padding: int = 0):
    """x: (N, C, W) -> (N, C_out, W_out); weights (O, I, K) torch layout."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def conv2d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int],
                bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel[0] * kernel[1])
    p = {"w": _uniform(kw, (out_ch, in_ch) + tuple(kernel), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), bound, dtype)
    return p


def conv2d(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    """x: (N, C, H, W) torch layout."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=tuple(stride), padding=tuple(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


# --------------------------------------------------------------------------
# BatchNorm1d over (N, C, W)
# --------------------------------------------------------------------------

def batchnorm_init(dim: int, dtype=jnp.float32):
    return {
        "scale": jnp.ones((dim,), dtype),
        "bias": jnp.zeros((dim,), dtype),
        "mean": jnp.zeros((dim,), dtype),   # running mean (state)
        "var": jnp.ones((dim,), dtype),     # running var (state)
    }


def batchnorm(p, x, training: bool, momentum: float = 0.1, eps: float = 1e-5):
    """Returns (y, new_params). x: (N, C, W).

    Statistics and normalization always compute in f32 (mixed-precision
    training feeds bf16 activations; running stats must not degrade), the
    output returns in x's dtype."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    if training:
        axes = (0, 2)
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
        n = x.shape[0] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_p = dict(p)
        new_p["mean"] = (1 - momentum) * p["mean"] + momentum * mean
        new_p["var"] = (1 - momentum) * p["var"] + momentum * unbiased
    else:
        mean, var = p["mean"], p["var"]
        new_p = p
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, :, None]) * inv[None, :, None]
    y = y * p["scale"][None, :, None] + p["bias"][None, :, None]
    return y.astype(in_dtype), new_p


# --------------------------------------------------------------------------
# GRU (torch gate order r, z, n)
# --------------------------------------------------------------------------

def gru_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    """torch.nn.GRU default init: all params U(-1/sqrt(h), 1/sqrt(h)).

    Layout: wi (in_dim, 3h) columns ordered [r|z|n]; wh (hidden, 3h).
    (torch stores (3h, in) rows [r;z;n] — we keep the transpose for
    right-matmuls on the MXU.)
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "wi": _uniform(k1, (in_dim, 3 * hidden), bound, dtype),
        "wh": _uniform(k2, (hidden, 3 * hidden), bound, dtype),
        "bi": _uniform(k3, (3 * hidden,), bound, dtype),
        "bh": _uniform(k4, (3 * hidden,), bound, dtype),
    }


def gru_cell(p, x, h):
    """One GRU step. x: (B, in), h: (B, H) -> h': (B, H)."""
    H = h.shape[-1]
    gi = x @ p["wi"] + p["bi"]
    gh = h @ p["wh"] + p["bh"]
    ir, iz, inn = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    hr, hz, hn = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(inn + r * hn)
    return (1.0 - z) * n + z * h


def gru(p, xs, h0=None, unroll: int = 8, engine: str = "scan"):
    """Full-sequence GRU via lax.scan. xs: (B, T, in) -> (B, T, H).

    The x-side matmul for the whole sequence is hoisted out of the scan so
    the MXU sees one big (B*T, in)x(in, 3H) GEMM; only the h-recurrence is
    sequential. unroll=8 amortizes the XLA while-loop bookkeeping across
    iterations — measured 30% faster for the ISOLATED forward recurrence
    on v5e (7.9 -> 5.5 us/step at B=32, H=512; unroll 16 regresses), which
    helps forward-only paths (GTA export, the scan generation twin). The
    full fwd+bwd train step is unchanged (interleaved A/B: 18.3 vs 18.4
    f32 steps/s) — autodiff's backward scans don't inherit the unroll and
    dominate there. Identical math either way.

    engine="pallas" ("pallas_interpret" on CPU) runs the recurrence as the
    persistent-weights training kernels (ops/pallas_gru.py, fwd + custom
    VJP) — same math, ~4x cheaper fwd+bwd than the scan under autodiff
    (XLA's backward scan re-materializes gates and re-reads weights every
    step). Used by training paths (WaveRNN core, Tacotron CBHG BiGRUs).
    """
    B, T, _ = xs.shape
    H = p["wh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), xs.dtype)
    if engine != "scan":
        from .kernel_common import gru_seq_chunk
        from .pallas_gru import gru_seq_tm
        xs = grad_barrier(xs)  # keep conv-stack backwards off the
        # transposed cotangent (kOutput refusion pathology — grad_barrier)
        gi_tm = jnp.swapaxes(xs @ p["wi"] + p["bi"], 0, 1)
        ck = gru_seq_chunk(B)
        ys_tm = gru_seq_tm(gi_tm, p["wh"], p["bh"], h0, ck,
                           engine == "pallas_interpret")
        ys = jnp.swapaxes(ys_tm, 0, 1)
        return ys, ys[:, -1]
    gi_all = xs @ p["wi"] + p["bi"]  # (B, T, 3H) — parallel over time

    def step(h, gi):
        gh = h @ p["wh"] + p["bh"]
        ir, iz, inn = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
        hr, hz, hn = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    hT, ys = jax.lax.scan(step, h0, jnp.swapaxes(gi_all, 0, 1),
                          unroll=unroll)
    return jnp.swapaxes(ys, 0, 1), hT


def bigru(p_fwd, p_bwd, xs, h0=None, lens=None, engine: str = "scan"):
    """Bidirectional GRU: concat(fwd, reversed(bwd(reversed(x)))).

    Two sequential scans. (A fused single-scan variant advancing both
    directions per step was measured SLOWER on v5e — 12.5 vs 11.0 ms at
    B=1/T=1024/H=128 — the XLA scan step at these widths is bounded by its
    body work, not fixed per-step overhead, so halving the step count
    while doubling the body buys nothing.)

    lens: optional (B,) true sequence lengths for right-padded batches.
    The forward pass needs nothing (output at t depends on [0..t] only),
    but a naive flip would make the backward GRU integrate the pad tail
    before reaching real text. With lens, each row is right-aligned (rolled
    by T - len) before the flip so the backward GRU consumes the true
    reversed sequence FIRST from h0 — valid positions then match a solo
    (unpadded) run exactly; pad positions are garbage the caller masks or
    ignores."""
    y_f, _ = gru(p_fwd, xs, h0, engine=engine)
    if lens is None:
        y_b, _ = gru(p_bwd, xs[:, ::-1, :], h0, engine=engine)
        return jnp.concatenate([y_f, y_b[:, ::-1, :]], axis=-1)
    T = xs.shape[1]
    roll_r = jax.vmap(lambda x, s: jnp.roll(x, s, axis=0))
    xs_b = roll_r(xs, T - lens)[:, ::-1, :]
    y_b, _ = gru(p_bwd, xs_b, h0, engine=engine)
    y_b = roll_r(y_b[:, ::-1, :], lens - T)
    return jnp.concatenate([y_f, y_b], axis=-1)


# --------------------------------------------------------------------------
# LSTM cell (torch gate order i, f, g, o)
# --------------------------------------------------------------------------

def lstm_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "wi": _uniform(k1, (in_dim, 4 * hidden), bound, dtype),
        "wh": _uniform(k2, (hidden, 4 * hidden), bound, dtype),
        "bi": _uniform(k3, (4 * hidden,), bound, dtype),
        "bh": _uniform(k4, (4 * hidden,), bound, dtype),
    }


def lstm_cell(p, x, state):
    """One LSTM step. state = (h, c)."""
    h, c = state
    H = h.shape[-1]
    g = x @ p["wi"] + p["bi"] + h @ p["wh"] + p["bh"]
    i = jax.nn.sigmoid(g[..., :H])
    f = jax.nn.sigmoid(g[..., H:2 * H])
    gg = jnp.tanh(g[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(g[..., 3 * H:])
    c = f * c + i * gg
    h = o * jnp.tanh(c)
    return h, c


# --------------------------------------------------------------------------
# Embedding
# --------------------------------------------------------------------------

def embedding_init(key, num: int, dim: int, dtype=jnp.float32):
    """torch.nn.Embedding default: N(0, 1)."""
    return {"table": jax.random.normal(key, (num, dim), dtype)}


def embedding(p, ids):
    return p["table"][ids]


# --------------------------------------------------------------------------
# misc
# --------------------------------------------------------------------------

@jax.custom_vjp
def grad_barrier(x):
    """Identity whose BACKWARD inserts an optimization barrier on the
    cotangent.

    Why: XLA may fuse a relayouting producer (e.g. the backward transpose
    of a (B, T, C)->(T, B, C) flip) INTO a consumer as a kOutput operand,
    recomputing the relayout for every consumer window read.  Measured on
    v5e: the depthwise upsample-conv backward consumed the time-major
    core's transposed cotangent that way and ran 42x its own cost estimate
    (~21 ms of a 33 ms train step).  Placing grad_barrier between the
    upsampler outputs and the time-major core forces the cotangent to
    materialize in a clean layout first: 33 -> 11.8 ms per step, gradients
    bit-identical (the barrier has no numeric effect)."""
    return x


def _grad_barrier_fwd(x):
    return x, None


def _grad_barrier_bwd(_, g):
    return (jax.lax.optimization_barrier(g),)


grad_barrier.defvjp(_grad_barrier_fwd, _grad_barrier_bwd)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ for 2D (out, in) or conv shapes."""
    if len(shape) == 2:
        fan_in, fan_out = shape[1], shape[0]
    else:
        rf = int(np.prod(shape[2:]))
        fan_in, fan_out = shape[1] * rf, shape[0] * rf
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return _uniform(key, shape, bound, dtype)


def dropout(key, x, rate: float, training: bool):
    if not training or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
