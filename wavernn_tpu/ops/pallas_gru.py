"""Pallas TPU kernels for the TRAINING GRU recurrence (fwd + custom VJP).

Why this exists: the reference's training hot path is cuDNN's fused GRU
over the 1375-sample vocoder window (train_wavernn.py:98-162 via
models/fatchord_version.py:154-159).  The XLA equivalent — `lax.scan`
over the h-recurrence with the input GEMMs hoisted (ops/layers.py:gru) —
has a fine forward (~2.4 us/step at B=32, H=512 on v5e) but autodiff's
backward scan costs ~8.7 us/step: every step re-reads the weights from
HBM and rematerializes gate activations, and each tiny elementwise stage
round-trips (B, 3H) tensors through HBM.  Measured: one isolated GRU at
(B=32, T=1375, H=512) bf16 is 3.3 ms fwd but 15.2 ms fwd+bwd — the
backward scan is ~4x the forward and dominates vocoder train MFU (~0.10
in round 4).

This module runs both directions as persistent-state Pallas kernels:

  * forward: weights (wh, bh) stay VMEM-resident across all T steps, h
    carries in VMEM scratch, the precomputed input-gate stream gi =
    x @ wi + bi is DMA'd in CHUNK-step blocks (Mosaic double-buffers
    behind compute).  Gate activations [r, z, n, hn] are saved to HBM as
    one packed (T, B, 4H) stream — trading ~0.5 ms of HBM traffic for
    the matmul-per-step the backward would otherwise spend
    rematerializing them.
  * backward: a reverse-grid kernel carrying dh in f32 VMEM scratch;
    ONE matmul per step (dgh @ wh^T) against the VMEM-resident
    transposed weights, all gate-gradient elementwise fused in-register.
    It emits the dgi/dgh streams; the weight gradients dWh = h_prev^T @
    dgh (and dWi outside) then run as ONE large MXU GEMM each at full
    batch-time parallelism instead of T rank-B updates.

Everything is TIME-MAJOR (T, B, ·): each inner step reads/writes a
contiguous sublane-major (B, ·) tile (see ops/pallas_gen.py layout
notes).  Callers keep the whole core stack time-major so no per-layer
(B, T) transposes appear (models/wavernn.py forward, recurrence=pallas).

The public op `gru_seq_tm` is a custom-VJP drop-in for the scan
recurrence with identical gate math (torch order [r, z, n],
ops/layers.py:164-200); parity vs the scan is tested in interpret mode
on CPU and on real silicon (tests/test_pallas_gru.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_common import dot as _dot, pick_chunk as _pick_chunk, sig as _sig


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _make_fwd_kernel(C: int, H: int, dt):
    def kernel(gi_ref, wh_ref, bh_ref, h0_ref, ys_ref, sv_ref, h_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_ref[:] = h0_ref[:]

        def body(i, _):
            h = h_ref[:]
            gh = _dot(h, wh_ref[:]) + bh_ref[:]          # f32 accum
            gi = gi_ref[i].astype(jnp.float32)
            r = _sig(gi[:, :H] + gh[:, :H])
            z = _sig(gi[:, H:2 * H] + gh[:, H:2 * H])
            hn = gh[:, 2 * H:]
            n = jnp.tanh(gi[:, 2 * H:] + r * hn)
            h_new = (1.0 - z) * n + z * h.astype(jnp.float32)
            ys_ref[i] = h_new.astype(dt)
            sv_ref[i] = jnp.concatenate([r, z, n, hn], axis=-1).astype(dt)
            h_ref[:] = h_new.astype(dt)
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    return kernel


def _fwd_impl(gi, wh, bh, h0, chunk: int, interpret: bool):
    """gi: (T, B, 3H) time-major input-gate stream (x @ wi + bi already
    applied).  Returns (ys (T, B, H), sv (T, B, 4H) packed [r|z|n|hn])."""
    T, B, G = gi.shape
    H = G // 3
    dt = gi.dtype
    C = _pick_chunk(T, chunk)
    T_pad = -(-T // C) * C
    if T_pad != T:
        gi = jnp.pad(gi, ((0, T_pad - T), (0, 0), (0, 0)))
    n_grid = T_pad // C

    def tspec(d):
        return pl.BlockSpec((C, B, d), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    ys, sv = pl.pallas_call(
        _make_fwd_kernel(C, H, dt),
        grid=(n_grid,),
        in_specs=[tspec(3 * H), cspec((H, 3 * H)), cspec((1, 3 * H)),
                  cspec((B, H))],
        out_specs=(tspec(H), tspec(4 * H)),
        out_shape=(jax.ShapeDtypeStruct((T_pad, B, H), dt),
                   jax.ShapeDtypeStruct((T_pad, B, 4 * H), dt)),
        scratch_shapes=[pltpu.VMEM((B, H), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gi, wh.astype(dt), bh[None].astype(jnp.float32), h0.astype(dt))
    return ys[:T], sv[:T]


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _make_bwd_kernel(C: int, H: int, T: int, n_grid: int, dt):
    def kernel(sv_ref, ysA_ref, ysB_ref, dys_ref, whT_ref, h0_ref, dhT_ref,
               dgi_ref, dgh_ref, dh0_ref, dh_ref):
        prog = pl.program_id(0)
        b = n_grid - 1 - prog                       # time-block index

        @pl.when(prog == 0)
        def _():
            dh_ref[:] = dhT_ref[:]

        # h_{t-1} for the block's FIRST step comes from the previous time
        # block's last row (streamed as the second ys view) or, for time
        # block 0, from h0
        bnd = jnp.where(b > 0, ysB_ref[C - 1].astype(jnp.float32),
                        h0_ref[:].astype(jnp.float32))

        def body(j, _):
            i = C - 1 - j
            dh = dh_ref[:]
            sv = sv_ref[i].astype(jnp.float32)
            r, z = sv[:, :H], sv[:, H:2 * H]
            n, hn = sv[:, 2 * H:3 * H], sv[:, 3 * H:]
            hp = jnp.where(i == 0, bnd,
                           ysA_ref[jnp.maximum(i - 1, 0)].astype(jnp.float32))
            dtot = dh + dys_ref[i].astype(jnp.float32)
            dz = dtot * (hp - n)
            dn = dtot * (1.0 - z)
            dpre_n = dn * (1.0 - n * n)
            dhn = dpre_n * r
            dpre_r = (dpre_n * hn) * r * (1.0 - r)
            dpre_z = dz * z * (1.0 - z)
            dgh = jnp.concatenate([dpre_r, dpre_z, dhn], axis=-1)
            dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
            dh_new = dtot * z + _dot(dgh.astype(dt), whT_ref[:])
            # zero-padded tail blocks (T not a chunk multiple) must pass
            # dh through untouched so the carry entering the REAL last
            # step equals dhT
            valid = (b * C + i) < T
            dh_ref[:] = jnp.where(valid, dh_new, dh)
            dgi_ref[i] = dgi.astype(dt)
            dgh_ref[i] = dgh.astype(dt)
            return 0

        jax.lax.fori_loop(0, C, body, 0)
        dh0_ref[:] = dh_ref[:]   # last grid step == time block 0 wins

    return kernel


def _bwd_impl(sv, ys, wh, h0, dys, dhT, chunk: int, interpret: bool):
    T, B, G4 = sv.shape
    H = G4 // 4
    dt = sv.dtype
    C = _pick_chunk(T, chunk)
    T_pad = -(-T // C) * C
    if T_pad != T:
        pad = ((0, T_pad - T), (0, 0), (0, 0))
        sv, ys, dys = jnp.pad(sv, pad), jnp.pad(ys, pad), jnp.pad(dys, pad)
    n_grid = T_pad // C

    def rspec(d):
        return pl.BlockSpec((C, B, d), lambda t: (n_grid - 1 - t, 0, 0),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # second ys view: one time block EARLIER (clamped at 0; block 0 uses h0)
    ysB_spec = pl.BlockSpec(
        (C, B, H), lambda t: (jnp.maximum(n_grid - 2 - t, 0), 0, 0),
        memory_space=pltpu.VMEM)

    dgi, dgh, dh0 = pl.pallas_call(
        _make_bwd_kernel(C, H, T, n_grid, dt),
        grid=(n_grid,),
        in_specs=[rspec(4 * H), rspec(H), ysB_spec, rspec(H),
                  cspec((3 * H, H)), cspec((B, H)), cspec((B, H))],
        out_specs=(rspec(3 * H), rspec(3 * H),
                   pl.BlockSpec((B, H), lambda t: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((T_pad, B, 3 * H), dt),
                   jax.ShapeDtypeStruct((T_pad, B, 3 * H), dt),
                   jax.ShapeDtypeStruct((B, H), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sv, ys, ys, dys, jnp.swapaxes(wh, 0, 1).astype(dt), h0.astype(dt),
      dhT.astype(jnp.float32))
    return dgi[:T], dgh[:T], dh0


# --------------------------------------------------------------------------
# custom-VJP op
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_seq_tm(gi, wh, bh, h0, chunk: int = 64, interpret: bool = False):
    """Time-major GRU recurrence: gi (T, B, 3H) = x @ wi + bi precomputed,
    wh (H, 3H), bh (3H,), h0 (B, H).  Returns ys (T, B, H).

    Gate math matches ops.layers.gru exactly (torch chunk order [r, z, n],
    n = tanh(gi_n + r * (wh_n h + bh_n))); the difference is execution:
    persistent-weights Pallas kernels for both directions with a custom
    VJP (see module docstring).  Differentiable in gi, wh, bh, h0."""
    ys, _ = _fwd_impl(gi, wh, bh, h0, chunk, interpret)
    return ys


def _gru_fwd(gi, wh, bh, h0, chunk, interpret):
    ys, sv = _fwd_impl(gi, wh, bh, h0, chunk, interpret)
    return ys, (sv, ys, wh, h0)


def _gru_bwd(chunk, interpret, res, dys):
    sv, ys, wh, h0 = res
    dhT = jnp.zeros_like(h0, dtype=jnp.float32)
    dgi, dgh, dh0 = _bwd_impl(sv, ys, wh, h0, dys, dhT, chunk, interpret)
    # weight/bias grads as ONE full-sequence MXU GEMM each (f32 accum):
    # h_prev = [h0; ys[:-1]] over time
    hprev = jnp.concatenate([h0[None].astype(ys.dtype), ys[:-1]], axis=0)
    T, B, H = ys.shape
    dwh = jax.lax.dot_general(
        hprev.reshape(T * B, H), dgh.reshape(T * B, 3 * H),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wh.dtype)
    dbh = jnp.sum(dgh.astype(jnp.float32), axis=(0, 1)).astype(wh.dtype)
    return (dgi, dwh, dbh, dh0.astype(h0.dtype))


gru_seq_tm.defvjp(_gru_fwd, _gru_bwd)


def gru_seq_ref(gi, wh, bh, h0):
    """Pure-scan twin of gru_seq_tm (same time-major API) for parity
    tests: identical math to ops.layers.gru with the input GEMM already
    applied."""
    H = h0.shape[-1]

    def step(h, gi_t):
        gh = h @ wh + bh
        r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi_t[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi_t[:, 2 * H:] + r * gh[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        return h, h

    _, ys = jax.lax.scan(step, h0, gi)
    return ys
