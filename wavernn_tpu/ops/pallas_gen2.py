"""Pallas sample-loop kernel v2: minimum-matmul-count step (EXPERIMENT).

Measured on v5e this is ~20% SLOWER than v1 (pallas_gen.py): the
autoregressive step is VPU/transcendental-bound, not matmul-issue-bound,
and v2 trades MXU matmuls for wide bf16->f32 stream adds on the VPU.  Kept
(and parity-tested) as documentation of the design space; v1 is the
production path.

v1 (pallas_gen.py) computes conditioning projections in-kernel: 11
sequential MXU matmuls per step.  Small-matmul issue latency (~0.5 us)
dominates the autoregressive step, so v2 pre-projects every conditioning
stream on the MXU *outside* the loop (huge parallel GEMMs over all T at
near-peak utilization) and streams the projected gate-space tensors in:

  in-kernel per step (6 matmuls, the true recurrent critical path):
    gi1 = gi1_cond[t] + x * wxw1            (VPU)
    gh1 = h1 @ wh1                          # 1
    h1  = gru_gates(gi1, gh1)
    inp = i_cond[t] + x * w_Ix  ; xr = inp + h1
    gi2 = gi2_cond[t] + x * wxw2 + h1 @ wi2x  # 2
    gh2 = h2 @ wh2                          # 3
    h2  = gru_gates(gi2, gh2) ; x2 = xr + h2
    hf  = relu(x2 @ w1x + f1_cond[t])       # 4
    hf  = relu(hf @ w2x + f2_cond[t])       # 5
    logits = hf @ w3 + b3                   # 6

Streams are bf16 (halves the HBM traffic); accumulation is f32.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import WaveRNNConfig

LOG_SCALE_MIN = float(math.log(1e-14))


def _gates(gi, gh, h):
    H = h.shape[-1]
    r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
    return (1.0 - z) * n + z * h


def _dot(a, w):
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _make_kernel(voc: WaveRNNConfig, bits: int, chunk: int, mol: bool,
                 use_prng: bool):
    R = voc.rnn_dims
    n_classes = voc.n_classes(bits)
    nr_mix = n_classes // 3 if mol else 0

    def kernel(seed_ref,
               i_cond_ref,    # (chunk, B, R)
               gi1_cond_ref,  # (chunk, B, 3R)
               gi2_cond_ref,  # (chunk, B, 3R)
               f1_cond_ref,   # (chunk, B, FC)
               f2_cond_ref,   # (chunk, B, FC)
               u_mix_ref, u_s_ref,
               w_Ix_ref, wxw1_ref, wxw2_ref,       # (1, R/3R/3R) f32
               wh1_ref, wi2x_ref, wh2_ref,         # (R, 3R) bf16
               bh1_ref, bh2_ref,                   # (1, 3R) f32
               w1x_ref, w2x_ref, w3_ref, b3_ref,
               out_ref,
               h1_ref, h2_ref, x_ref):
        step0 = pl.program_id(0) == 0

        @pl.when(step0)
        def _():
            h1_ref[:] = jnp.zeros_like(h1_ref)
            h2_ref[:] = jnp.zeros_like(h2_ref)
            x_ref[:] = jnp.zeros_like(x_ref)
            if use_prng:
                pltpu.prng_seed(seed_ref[0])

        def body(i, _):
            x = x_ref[:, 0:1]
            h1 = h1_ref[:]
            h2 = h2_ref[:]
            cd = wh1_ref.dtype

            gi1 = gi1_cond_ref[i].astype(jnp.float32) + x * wxw1_ref[:]
            gh1 = _dot(h1.astype(cd), wh1_ref[:]) + bh1_ref[:]
            h1 = _gates(gi1, gh1, h1)
            inp = i_cond_ref[i].astype(jnp.float32) + x * w_Ix_ref[:]
            xr = inp + h1

            gi2 = (gi2_cond_ref[i].astype(jnp.float32) + x * wxw2_ref[:]
                   + _dot(h1.astype(cd), wi2x_ref[:]))
            gh2 = _dot(h2.astype(cd), wh2_ref[:]) + bh2_ref[:]
            h2 = _gates(gi2, gh2, h2)
            x2 = xr + h2

            hf = jnp.maximum(_dot(x2.astype(cd), w1x_ref[:])
                             + f1_cond_ref[i].astype(jnp.float32), 0.0)
            hf = jnp.maximum(_dot(hf.astype(cd), w2x_ref[:])
                             + f2_cond_ref[i].astype(jnp.float32), 0.0)
            logits = _dot(hf.astype(cd), w3_ref[:]) + b3_ref[:]

            if mol:
                lp = logits[:, :nr_mix]
                u_mix = u_mix_ref[i]
                am = jnp.argmax(lp - jnp.log(-jnp.log(u_mix)), axis=-1)
                sel = (jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)
                       == am[:, None])
                means = jnp.sum(jnp.where(sel, logits[:, nr_mix:2 * nr_mix],
                                          0.0), axis=-1)
                log_s = jnp.maximum(
                    jnp.sum(jnp.where(sel, logits[:, 2 * nr_mix:], 0.0),
                            axis=-1), LOG_SCALE_MIN)
                u_s = u_s_ref[i]
                sample = means + jnp.exp(log_s) * (jnp.log(u_s)
                                                   - jnp.log(1.0 - u_s))
                sample = jnp.clip(sample, -1.0, 1.0)
            else:
                if use_prng:
                    # logical shift: random bits are SIGNED int32 (an
                    # arithmetic >> sign-fills -> negative u -> log NaN)
                    rb = jax.lax.shift_right_logical(
                        pltpu.prng_random_bits(logits.shape), 8)
                    u = rb.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
                else:
                    u = u_mix_ref[i]
                g = -jnp.log(-jnp.log(u))
                idx = jnp.argmax(logits + g, axis=-1)
                sample = 2.0 * idx.astype(jnp.float32) / (n_classes - 1.0) - 1.0

            h1_ref[:] = h1
            h2_ref[:] = h2
            out_ref[i, :] = sample
            x_ref[:, 0] = sample
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("voc", "bits", "chunk", "compute_dtype",
                                   "stream_dtype", "interpret"))
def generate_pallas_v2(params, mels_up, aux, voc: WaveRNNConfig, bits: int,
                       key, noise=None, chunk: int = 128,
                       compute_dtype=jnp.bfloat16,
                       stream_dtype=jnp.bfloat16, interpret: bool = False):
    """Drop-in replacement for generate_pallas with pre-projected streams."""
    from .sample_loop import _split_cond

    B, T, n_mels = mels_up.shape
    R, FC, A = voc.rnn_dims, voc.fc_dims, voc.aux_dims
    n_classes = voc.n_classes(bits)
    mol = voc.mode == "MOL"
    use_prng = (not mol) and noise is None
    nr_mix = n_classes // 3 if mol else (1 if noise is None else n_classes)

    # outside-the-loop MXU projections over all T
    i_cond, gi2a_cond, f1_cond, f2_cond = _split_cond(params, mels_up, aux,
                                                      voc)
    wi1 = params["rnn1"]["wi"]
    gi1_cond = i_cond @ wi1 + params["rnn1"]["bi"]
    wi2x = params["rnn2"]["wi"][:R]
    gi2_cond = i_cond @ wi2x + gi2a_cond + params["rnn2"]["bi"]

    T_pad = -(-T // chunk) * chunk

    def prep(s):
        s = jnp.pad(s, ((0, 0), (0, T_pad - T), (0, 0)))
        return jnp.swapaxes(s, 0, 1).astype(stream_dtype)

    streams = [prep(i_cond), prep(gi1_cond), prep(gi2_cond), prep(f1_cond),
               prep(f2_cond)]

    k_seed, k1, k2 = jax.random.split(key, 3)
    if mol:
        if noise is None:
            u_mix = jax.random.uniform(k1, (T_pad, B, nr_mix), minval=1e-5,
                                       maxval=1.0 - 1e-5)
            u_s = jax.random.uniform(k2, (T_pad, B), minval=1e-5,
                                     maxval=1.0 - 1e-5)
        else:
            u_mix, u_s = noise
            u_mix = jnp.pad(u_mix, ((0, T_pad - u_mix.shape[0]), (0, 0),
                                    (0, 0)), constant_values=0.5)
            u_s = jnp.pad(u_s, ((0, T_pad - u_s.shape[0]), (0, 0)),
                          constant_values=0.5)
    else:
        if noise is not None:
            u_mix = jnp.pad(noise, ((0, T_pad - noise.shape[0]), (0, 0),
                                    (0, 0)), constant_values=0.5)
        else:
            u_mix = jnp.zeros((T_pad, B, 1), jnp.float32)
        u_s = jnp.zeros((T_pad, B), jnp.float32)
    seed = jax.random.randint(k_seed, (1,), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)

    cd = compute_dtype
    w_Ix = params["I"]["w"][0:1]
    weights = [
        w_Ix.astype(jnp.float32),                       # (1, R)
        (w_Ix @ wi1).astype(jnp.float32),               # wxw1 (1, 3R)
        (w_Ix @ wi2x).astype(jnp.float32),              # wxw2 (1, 3R)
        params["rnn1"]["wh"].astype(cd),
        wi2x.astype(cd),
        params["rnn2"]["wh"].astype(cd),
        params["rnn1"]["bh"][None].astype(jnp.float32),
        params["rnn2"]["bh"][None].astype(jnp.float32),
        params["fc1"]["w"][:R].astype(cd),
        params["fc2"]["w"][:FC].astype(cd),
        params["fc3"]["w"].astype(cd),
        params["fc3"]["b"][None].astype(jnp.float32),
    ]

    n_grid = T_pad // chunk

    def stream_spec(width):
        return pl.BlockSpec((chunk, B, width), lambda t, s: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda t, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = ([stream_spec(R), stream_spec(3 * R), stream_spec(3 * R),
                 stream_spec(FC), stream_spec(FC),
                 stream_spec(nr_mix),
                 pl.BlockSpec((chunk, B), lambda t, s: (t, 0),
                              memory_space=pltpu.VMEM)]
                + [const_spec(w.shape) for w in weights])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk, B), lambda t, s: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, R), jnp.float32),
            pltpu.VMEM((B, R), jnp.float32),
            pltpu.VMEM((B, 128), jnp.float32),
        ],
    )

    kernel = _make_kernel(voc, bits, chunk, mol, use_prng)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_pad, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, *streams, u_mix, u_s, *weights)

    return jnp.swapaxes(out, 0, 1)[:, :T]
