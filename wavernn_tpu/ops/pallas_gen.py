"""Pallas TPU kernel: persistent-weights WaveRNN sample loop.

The entire autoregressive generation loop (fatchord_version.py:201-241) runs
inside ONE kernel launch:

  * every weight matrix lives in VMEM for the whole T-step loop (~4.2M
    params; bf16 fits comfortably in the 16MB budget) — zero per-step HBM
    weight traffic, which is what makes the reference's cuDNN GRUCell loop
    HBM-bound and this one compute-bound;
  * upsampled conditioning (mel + aux streams, 208 floats/step) and the
    sampling noise are streamed from HBM in CHUNK-step blocks via the
    sequential pallas grid — Mosaic double-buffers the block DMAs behind
    compute;
  * GRU state persists in VMEM scratch across grid steps;
  * MOL sampling (Gumbel mixture pick + inverse-CDF logistic) executes on
    the VPU in-kernel; RAW mode draws Gumbel noise from the on-core PRNG.

Layouts: conditioning and outputs are time-major (T, B, ·) so each inner
step reads/writes a contiguous (B, ·) tile.
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
    # sigmoid(x) == 0.5*tanh(x/2)+0.5: one transcendental kind for the VPU
    # (measured ~10% faster than mixed sigmoid/tanh lowering on v5e)
    r = 0.5 * jnp.tanh(0.5 * (gi[:, :H] + gh[:, :H])) + 0.5
    z = 0.5 * jnp.tanh(0.5 * (gi[:, H:2 * H] + gh[:, H:2 * H])) + 0.5
    n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
    return (1.0 - z) * n + z * h


def _dot(a, w):
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _make_kernel(voc: WaveRNNConfig, bits: int, chunk: int, n_mels: int,
                 mol: bool, use_prng: bool, with_state: bool = False,
                 snapshot_at=None):
    R = voc.rnn_dims
    FC = voc.fc_dims
    A = voc.aux_dims
    n_classes = voc.n_classes(bits)
    nr_mix = n_classes // 3 if mol else 0
    C_IN = n_mels + A  # x-independent input-layer columns

    def kernel(seed_ref,  # SMEM (1,)
               cond_ref,  # (chunk, B, n_mels + 4A)
               u_mix_ref, u_s_ref,  # MOL noise blocks (chunk,B,nr_mix),(chunk,B)
               w_Ic_ref, w_Ix_ref, b_I_ref,
               wi1_ref, wh1_ref, bi1_ref, bh1_ref,
               wi2x_ref, wi2a_ref, wh2_ref, bi2_ref, bh2_ref,
               w1x_ref, w1a_ref, b1_ref,
               w2x_ref, w2a_ref, b2_ref,
               w3_ref, b3_ref,
               *rest):
        if with_state:
            # (h1_0, h2_0, x_0) inputs then (samples, snap_h1, snap_h2,
            # snap_x) outputs then scratch
            (h1_0_ref, h2_0_ref, x_0_ref, out_ref, snap_h1_ref, snap_h2_ref,
             snap_x_ref, h1_ref, h2_ref, x_ref) = rest
        else:
            out_ref, h1_ref, h2_ref, x_ref = rest
        prog = pl.program_id(0)
        step0 = prog == 0

        @pl.when(step0)
        def _():
            if with_state:
                h1_ref[:] = h1_0_ref[:]
                h2_ref[:] = h2_0_ref[:]
                x_ref[:] = x_0_ref[:]
                snap_h1_ref[:] = jnp.zeros_like(snap_h1_ref)
                snap_h2_ref[:] = jnp.zeros_like(snap_h2_ref)
                snap_x_ref[:] = jnp.zeros_like(snap_x_ref)
            else:
                h1_ref[:] = jnp.zeros_like(h1_ref)
                h2_ref[:] = jnp.zeros_like(h2_ref)
                x_ref[:] = jnp.zeros_like(x_ref)
            if use_prng:
                pltpu.prng_seed(seed_ref[0])

        def body(i, _):
            cond = cond_ref[i]                        # (B, n_mels+4A)
            x = x_ref[:, 0:1]                         # (B, 1) f32
            h1 = h1_ref[:]
            h2 = h2_ref[:]
            if with_state and snapshot_at is not None:
                # record the state *entering* the global snapshot step
                @pl.when(prog * chunk + i == snapshot_at)
                def _():
                    snap_h1_ref[:] = h1_ref[:]
                    snap_h2_ref[:] = h2_ref[:]
                    snap_x_ref[:] = x_ref[:]

            cdtype = w_Ic_ref.dtype
            inp = (_dot(cond[:, :C_IN].astype(cdtype), w_Ic_ref[:])
                   + x * w_Ix_ref[:] + b_I_ref[:])
            gi1 = _dot(inp.astype(cdtype), wi1_ref[:]) + bi1_ref[:]
            gh1 = _dot(h1.astype(cdtype), wh1_ref[:]) + bh1_ref[:]
            h1 = _gates(gi1, gh1, h1)
            xr = inp + h1

            a2 = cond[:, C_IN: C_IN + A].astype(cdtype)
            gi2 = (_dot(xr.astype(cdtype), wi2x_ref[:]) + _dot(a2, wi2a_ref[:])
                   + bi2_ref[:])
            gh2 = _dot(h2.astype(cdtype), wh2_ref[:]) + bh2_ref[:]
            h2 = _gates(gi2, gh2, h2)
            x2 = xr + h2

            a3 = cond[:, C_IN + A: C_IN + 2 * A].astype(cdtype)
            hf = jnp.maximum(
                _dot(x2.astype(cdtype), w1x_ref[:]) + _dot(a3, w1a_ref[:])
                + b1_ref[:], 0.0)
            a4 = cond[:, C_IN + 2 * A: C_IN + 3 * A].astype(cdtype)
            hf = jnp.maximum(
                _dot(hf.astype(cdtype), w2x_ref[:]) + _dot(a4, w2a_ref[:])
                + b2_ref[:], 0.0)
            logits = _dot(hf.astype(cdtype), w3_ref[:]) + b3_ref[:]  # (B, n_classes)

            if mol:
                lp = logits[:, :nr_mix]
                u_mix = u_mix_ref[i]
                gumbel = lp - jnp.log(-jnp.log(u_mix))
                am = jnp.argmax(gumbel, axis=-1)                      # (B,)
                sel = (jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)
                       == am[:, None])
                means = jnp.sum(jnp.where(sel, logits[:, nr_mix:2 * nr_mix], 0.0),
                                axis=-1)
                log_s = jnp.sum(jnp.where(sel, logits[:, 2 * nr_mix:3 * nr_mix],
                                          0.0), axis=-1)
                log_s = jnp.maximum(log_s, LOG_SCALE_MIN)
                u_s = u_s_ref[i]
                sample = means + jnp.exp(log_s) * (jnp.log(u_s)
                                                   - jnp.log(1.0 - u_s))
                sample = jnp.clip(sample, -1.0, 1.0)
            else:
                if use_prng:
                    rb = pltpu.prng_random_bits(logits.shape)
                    u = (rb >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
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


@partial(jax.jit,
         static_argnames=("voc", "bits", "chunk", "compute_dtype", "interpret",
                          "state_snapshot_at"))
def generate_pallas_with_state(params, mels_up, aux, voc: WaveRNNConfig,
                               bits: int, key, noise=None, chunk: int = 128,
                               compute_dtype=jnp.bfloat16,
                               interpret: bool = False, init_state=None,
                               state_snapshot_at: int = 0):
    """Sample-loop kernel with RNN-state I/O (exact-seam fold handoff).

    init_state: optional (h1, h2, x) with x shape (B,) to resume from.
    Returns (samples (B, T), (snap_h1, snap_h2, snap_x)) where the snapshot
    is the state entering global step ``state_snapshot_at``.
    """
    return _generate_pallas_impl(params, mels_up, aux, voc, bits, key, noise,
                                 chunk, compute_dtype, interpret,
                                 with_state=True, init_state=init_state,
                                 state_snapshot_at=state_snapshot_at)


@partial(jax.jit,
         static_argnames=("voc", "bits", "chunk", "compute_dtype", "interpret"))
def generate_pallas(params, mels_up, aux, voc: WaveRNNConfig, bits: int, key,
                    noise=None, chunk: int = 128,
                    compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Run the persistent-weights sample loop. Mirrors generate_scan's API.

    mels_up: (B, T, n_mels); aux: (B, T, 4*aux_dims).
    Returns samples (B, T) float32.
    """
    return _generate_pallas_impl(params, mels_up, aux, voc, bits, key, noise,
                                 chunk, compute_dtype, interpret,
                                 with_state=False, init_state=None,
                                 state_snapshot_at=None)


def _generate_pallas_impl(params, mels_up, aux, voc, bits, key, noise, chunk,
                          compute_dtype, interpret, with_state, init_state,
                          state_snapshot_at):
    B, T, n_mels = mels_up.shape
    R, FC, A = voc.rnn_dims, voc.fc_dims, voc.aux_dims
    n_classes = voc.n_classes(bits)
    mol = voc.mode == "MOL"
    use_prng = (not mol) and noise is None
    nr_mix = n_classes // 3 if mol else (1 if noise is None else n_classes)

    T_pad = -(-T // chunk) * chunk
    cond = jnp.concatenate([mels_up, aux], axis=-1)          # (B, T, n_mels+4A)
    cond = jnp.pad(cond, ((0, 0), (0, T_pad - T), (0, 0)))
    cond = jnp.swapaxes(cond, 0, 1)                           # (T_pad, B, ·)

    k_seed, k1, k2 = jax.random.split(key, 3)
    if mol:
        if noise is None:
            u_mix = jax.random.uniform(k1, (T_pad, B, nr_mix), minval=1e-5,
                                       maxval=1.0 - 1e-5)
            u_s = jax.random.uniform(k2, (T_pad, B), minval=1e-5,
                                     maxval=1.0 - 1e-5)
        else:
            u_mix, u_s = noise
            u_mix = jnp.pad(u_mix, ((0, T_pad - u_mix.shape[0]), (0, 0), (0, 0)),
                            constant_values=0.5)
            u_s = jnp.pad(u_s, ((0, T_pad - u_s.shape[0]), (0, 0)),
                          constant_values=0.5)
    else:
        if noise is not None:  # streamed Gumbel uniforms (tests / replay)
            u_mix = jnp.pad(noise, ((0, T_pad - noise.shape[0]), (0, 0), (0, 0)),
                            constant_values=0.5)
        else:
            u_mix = jnp.zeros((T_pad, B, 1), jnp.float32)
        u_s = jnp.zeros((T_pad, B), jnp.float32)
    seed = jax.random.randint(k_seed, (1,), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)

    cd = compute_dtype
    w_I = params["I"]["w"]
    weights = [
        w_I[1:].astype(cd),                      # w_Ic (n_mels+A, R)
        w_I[0:1].astype(jnp.float32),            # w_Ix (1, R)
        params["I"]["b"][None].astype(jnp.float32),
        params["rnn1"]["wi"].astype(cd), params["rnn1"]["wh"].astype(cd),
        params["rnn1"]["bi"][None].astype(jnp.float32),
        params["rnn1"]["bh"][None].astype(jnp.float32),
        params["rnn2"]["wi"][:R].astype(cd), params["rnn2"]["wi"][R:].astype(cd),
        params["rnn2"]["wh"].astype(cd),
        params["rnn2"]["bi"][None].astype(jnp.float32),
        params["rnn2"]["bh"][None].astype(jnp.float32),
        params["fc1"]["w"][:R].astype(cd), params["fc1"]["w"][R:].astype(cd),
        params["fc1"]["b"][None].astype(jnp.float32),
        params["fc2"]["w"][:FC].astype(cd), params["fc2"]["w"][FC:].astype(cd),
        params["fc2"]["b"][None].astype(jnp.float32),
        params["fc3"]["w"].astype(cd),
        params["fc3"]["b"][None].astype(jnp.float32),
    ]

    n_grid = T_pad // chunk

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda t, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((chunk, B, n_mels + 4 * A), lambda t, s: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, B, nr_mix), lambda t, s: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, B), lambda t, s: (t, 0), memory_space=pltpu.VMEM),
    ] + [const_spec(w.shape) for w in weights]

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

    if not with_state:
        kernel = _make_kernel(voc, bits, chunk, n_mels, mol, use_prng)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T_pad, B), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, cond, u_mix, u_s, *weights)
        return jnp.swapaxes(out, 0, 1)[:, :T]

    # state-I/O variant: extra (h1_0, h2_0, x_0) inputs + snapshot outputs
    if init_state is None:
        h1_0 = jnp.zeros((B, R), jnp.float32)
        h2_0 = jnp.zeros((B, R), jnp.float32)
        x_0 = jnp.zeros((B,), jnp.float32)
    else:
        h1_0, h2_0, x_0 = init_state
    x_0_pad = jnp.zeros((B, 128), jnp.float32).at[:, 0].set(x_0)

    state_specs = [const_spec((B, R)), const_spec((B, R)),
                   const_spec((B, 128))]
    out_specs = (
        pl.BlockSpec((chunk, B), lambda t, s: (t, 0),
                     memory_space=pltpu.VMEM),
        const_spec((B, R)), const_spec((B, R)), const_spec((B, 128)),
    )
    grid_spec_state = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid,),
        in_specs=in_specs + state_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, R), jnp.float32),
            pltpu.VMEM((B, R), jnp.float32),
            pltpu.VMEM((B, 128), jnp.float32),
        ],
    )
    kernel = _make_kernel(voc, bits, chunk, n_mels, mol, use_prng,
                          with_state=True, snapshot_at=state_snapshot_at)
    out, s_h1, s_h2, s_x = pl.pallas_call(
        kernel,
        grid_spec=grid_spec_state,
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B), jnp.float32),
            jax.ShapeDtypeStruct((B, R), jnp.float32),
            jax.ShapeDtypeStruct((B, R), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, cond, u_mix, u_s, *weights, h1_0, h2_0, x_0_pad)
    return (jnp.swapaxes(out, 0, 1)[:, :T], (s_h1, s_h2, s_x[:, 0]))
