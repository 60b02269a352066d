"""Legacy DeepMind coarse/fine WaveRNN (reference models/deepmind_version.py).

Single 896-unit custom GRU whose hidden state is split into coarse/fine
halves, dual 256-way softmax heads, unconditional generation.  The gate
math follows the paper's masked-matrix formulation: one R matmul per step
split six ways; the fine sub-step conditions on the just-sampled coarse
value but reuses R(hidden) from before the coarse update (deepmind:116-119).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import layers as L


def init_deepmind(key, hidden_size: int = 896, quantisation: int = 256):
    split = hidden_size // 2
    k = jax.random.split(key, 7)
    return {
        "R": L.linear_init(k[0], hidden_size, 3 * hidden_size, bias=False),
        "O1": L.linear_init(k[1], split, split),
        "O2": L.linear_init(k[2], split, quantisation),
        "O3": L.linear_init(k[3], split, split),
        "O4": L.linear_init(k[4], split, quantisation),
        "I_coarse": L.linear_init(k[5], 2, 3 * split, bias=False),
        "I_fine": L.linear_init(k[6], 3, 3 * split, bias=False),
        "bias_u": jnp.zeros((hidden_size,)),
        "bias_r": jnp.zeros((hidden_size,)),
        "bias_e": jnp.zeros((hidden_size,)),
    }


def cell(p, prev_y, prev_hidden, current_coarse):
    """One training step (deepmind:37-72).

    prev_y: (B, 2) scaled previous [coarse, fine]; current_coarse: (B, 1).
    Returns (coarse logits, fine logits, new hidden)."""
    H = prev_hidden.shape[-1]
    split = H // 2

    R_h = L.linear(p["R"], prev_hidden)
    R_u, R_r, R_e = R_h[:, :H], R_h[:, H:2 * H], R_h[:, 2 * H:]

    cip = L.linear(p["I_coarse"], prev_y)
    Icu, Icr, Ice = cip[:, :split], cip[:, split:2 * split], cip[:, 2 * split:]

    fine_in = jnp.concatenate([prev_y, current_coarse], axis=1)
    fip = L.linear(p["I_fine"], fine_in)
    Ifu, Ifr, Ife = fip[:, :split], fip[:, split:2 * split], fip[:, 2 * split:]

    I_u = jnp.concatenate([Icu, Ifu], axis=1)
    I_r = jnp.concatenate([Icr, Ifr], axis=1)
    I_e = jnp.concatenate([Ice, Ife], axis=1)

    u = jax.nn.sigmoid(R_u + I_u + p["bias_u"])
    r = jax.nn.sigmoid(R_r + I_r + p["bias_r"])
    e = jnp.tanh(r * R_e + I_e + p["bias_e"])
    hidden = u * prev_hidden + (1.0 - u) * e

    hc, hf = hidden[:, :split], hidden[:, split:]
    out_coarse = L.linear(p["O2"], jax.nn.relu(L.linear(p["O1"], hc)))
    out_fine = L.linear(p["O4"], jax.nn.relu(L.linear(p["O3"], hf)))
    return out_coarse, out_fine, hidden


@partial(jax.jit, static_argnames=())
def forward_seq(p, coarse, fine):
    """Teacher-forced sequence forward for training (NB1-style).

    coarse/fine: (B, T+1) integer labels in [0, 255]; step t predicts
    (coarse[t+1], fine[t+1]) from scaled (coarse[t], fine[t]) and the
    scaled current coarse.  Returns (coarse_logits, fine_logits) (B, T, Q).
    """
    c_in = coarse[:, :-1].astype(jnp.float32) / 127.5 - 1.0
    f_in = fine[:, :-1].astype(jnp.float32) / 127.5 - 1.0
    c_cur = coarse[:, 1:].astype(jnp.float32) / 127.5 - 1.0
    B, T = c_in.shape
    H = p["bias_u"].shape[0]

    def step(hidden, xs):
        cy, fy, cc = xs
        prev_y = jnp.stack([cy, fy], axis=1)
        oc, of, hidden = cell(p, prev_y, hidden, cc[:, None])
        return hidden, (oc, of)

    h0 = jnp.zeros((B, H))
    xs = (jnp.swapaxes(c_in, 0, 1), jnp.swapaxes(f_in, 0, 1),
          jnp.swapaxes(c_cur, 0, 1))
    _, (ocs, ofs) = jax.lax.scan(step, h0, xs)
    return jnp.swapaxes(ocs, 0, 1), jnp.swapaxes(ofs, 0, 1)


@partial(jax.jit, static_argnames=("seq_len",))
def generate(p, seq_len: int, key, noise: Optional[Tuple] = None):
    """Unconditional generation (deepmind:75-165).

    Returns (signal int [-2^15, 2^15), coarse labels, fine labels), each
    (seq_len,).  noise: optional ((T, Q), (T, Q)) uniforms for replay.
    """
    H = p["bias_u"].shape[0]
    split = H // 2
    Q = p["O2"]["w"].shape[1]

    if noise is None:
        k1, k2 = jax.random.split(key)
        u_c = jax.random.uniform(k1, (seq_len, Q), minval=1e-9, maxval=1.0)
        u_f = jax.random.uniform(k2, (seq_len, Q), minval=1e-9, maxval=1.0)
    else:
        u_c, u_f = noise

    bcu, bfu = p["bias_u"][:split], p["bias_u"][split:]
    bcr, bfr = p["bias_r"][:split], p["bias_r"][split:]
    bce, bfe = p["bias_e"][:split], p["bias_e"][split:]

    def step(carry, us):
        hidden, out_c, out_f = carry
        u_ct, u_ft = us
        hc, hf = hidden[:, :split], hidden[:, split:]

        prev = jnp.stack([out_c / 127.5 - 1.0, out_f / 127.5 - 1.0],
                         axis=0)[None, :]
        cip = L.linear(p["I_coarse"], prev)
        Icu, Icr, Ice = (cip[:, :split], cip[:, split:2 * split],
                         cip[:, 2 * split:])

        R_h = L.linear(p["R"], hidden)
        Rcu, Rfu = R_h[:, :split], R_h[:, split:2 * split]
        Rcr, Rfr = R_h[:, 2 * split:3 * split], R_h[:, 3 * split:4 * split]
        Rce, Rfe = R_h[:, 4 * split:5 * split], R_h[:, 5 * split:]

        u = jax.nn.sigmoid(Rcu + Icu + bcu)
        r = jax.nn.sigmoid(Rcr + Icr + bcr)
        e = jnp.tanh(r * Rce + Ice + bce)
        hc = u * hc + (1.0 - u) * e

        oc = L.linear(p["O2"], jax.nn.relu(L.linear(p["O1"], hc)))
        g = -jnp.log(-jnp.log(u_ct))
        c_sample = jnp.argmax(jax.nn.log_softmax(oc[0]) + g).astype(jnp.float32)

        fine_in = jnp.concatenate([prev, (c_sample / 127.5 - 1.0)[None, None]],
                                  axis=1)
        fip = L.linear(p["I_fine"], fine_in)
        Ifu, Ifr, Ife = (fip[:, :split], fip[:, split:2 * split],
                         fip[:, 2 * split:])

        u = jax.nn.sigmoid(Rfu + Ifu + bfu)
        r = jax.nn.sigmoid(Rfr + Ifr + bfr)
        e = jnp.tanh(r * Rfe + Ife + bfe)
        hf = u * hf + (1.0 - u) * e

        of = L.linear(p["O4"], jax.nn.relu(L.linear(p["O3"], hf)))
        g = -jnp.log(-jnp.log(u_ft))
        f_sample = jnp.argmax(jax.nn.log_softmax(of[0]) + g).astype(jnp.float32)

        hidden = jnp.concatenate([hc, hf], axis=1)
        return (hidden, c_sample, f_sample), (c_sample, f_sample)

    h0 = jnp.zeros((1, H))
    _, (coarse, fine) = jax.lax.scan(
        step, (h0, jnp.float32(0.0), jnp.float32(0.0)), (u_c, u_f))
    signal = coarse * 256.0 + fine - 2 ** 15
    return signal, coarse, fine
