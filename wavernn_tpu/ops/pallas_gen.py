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
    the VPU in-kernel; production draws all sampling noise from the
    on-core PRNG (MOL and RAW) — tests/replay inject uniform streams.

Layouts: conditioning and noise stream time-major (T, B, ·) so each inner
step reads a contiguous sublane-major (B, ·) tile; samples accumulate in a
(B, chunk) VMEM scratch (lane-iota select) and flush once per chunk — every
per-step vector stays sublane-major, avoiding the per-step sublane->lane
relayout that a (T, B) row write would cost (~40% of step time measured).

Two conditioning modes:
  * ``generate_pallas`` / ``generate_pallas_with_state`` — materialized:
    the caller supplies sample-rate (B, T, ·) mels_up/aux (upsampled+folded
    outside). Also the exact-seam / streaming state-I/O variant and the
    block-sparse experiment.
  * ``generate_pallas_fused`` — fused: conditioning stays at MEL RATE; the
    kernel streams K shifted rows of a tiny folded frame array, applies the
    upsampler's polyphase filter (ops/polyphase.py) in-register and hoists
    all aux-stream matmuls to once per hop-aligned chunk. This is the
    production batched-generation path: it removes the sample-rate
    upsample/fold stages (~GBs of HBM traffic and ~40% of end-to-end
    latency on a 67 s utterance) entirely.
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


def _dot(a, w, out_dtype=jnp.float32):
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def _sample_step(logits, u_blk, *, mol: bool, use_prng: bool,
                 n_classes: int, nr_mix: int):
    """Draw one sample per row from the output head's logits (B, n_classes).

    MOL: Gumbel-argmax mixture pick + inverse-CDF logistic
    (utils/distribution.py:87-123 semantics); RAW: Gumbel-argmax categorical
    over the 2**bits classes. Noise comes from streamed uniforms (tests /
    replay / exact parity) or the on-core PRNG (production: no (T, B, ·)
    noise tensor in HBM — 68 MB per 67 s utterance at 128 folds, linear in
    T x B).
    Returns (B,) float32 in [-1, 1].
    """
    if mol:
        if use_prng:
            # logical shift: prng_random_bits yields SIGNED int32 and an
            # arithmetic >> would sign-fill, making u negative -> log NaN
            rb = jax.lax.shift_right_logical(
                pltpu.prng_random_bits((logits.shape[0], nr_mix + 1)), 8)
            u_blk = (rb.astype(jnp.float32) * (1.0 / (1 << 24))
                     * (1.0 - 2e-5) + 1e-5)
        lp = logits[:, :nr_mix]
        gumbel = lp - jnp.log(-jnp.log(u_blk[:, :nr_mix]))
        am = jnp.argmax(gumbel, axis=-1)                      # (B,)
        sel = (jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)
               == am[:, None])
        means = jnp.sum(jnp.where(sel, logits[:, nr_mix:2 * nr_mix], 0.0),
                        axis=-1)
        log_s = jnp.sum(jnp.where(sel, logits[:, 2 * nr_mix:3 * nr_mix],
                                  0.0), axis=-1)
        log_s = jnp.maximum(log_s, LOG_SCALE_MIN)
        u_s = u_blk[:, nr_mix]                                # (B,)
        sample = means + jnp.exp(log_s) * (jnp.log(u_s)
                                           - jnp.log(1.0 - u_s))
        return jnp.clip(sample, -1.0, 1.0)
    if use_prng:
        rb = jax.lax.shift_right_logical(pltpu.prng_random_bits(logits.shape),
                                         8)
        u = rb.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-9
    else:
        u = u_blk
    g = -jnp.log(-jnp.log(u))
    idx = jnp.argmax(logits + g, axis=-1)
    return 2.0 * idx.astype(jnp.float32) / (n_classes - 1.0) - 1.0


SPARSE_BR, SPARSE_BC = 8, 128  # native f32 VMEM tile (sublane x lane)
SPARSE_BR_MXU = 128            # MXU-tile row blocks: gather-free schedule


def _sparse_mm(op, w_ref, rows, br: int = SPARSE_BR):
    """Block-sparse (B, I) @ (I, O) with a mask-specialized static schedule.

    ``rows`` (static Python data) lists, per output column block, which
    input row-blocks are live.

    br=128 (the production layout, matching (128,128) block pruning):
    ONE MXU dot for the whole matrix. ``w_ref`` holds the live blocks in a
    block-layout matrix (128L, 128C) — live block k (row-block r_k, column
    block j_k) sits at row range [128k, 128k+128) and the column range of
    j_k's position among the LIVE column blocks; everything else is zero.
    The kernel concatenates the matching (B, 128) lane-slices of ``op``
    (aligned vreg moves, no gathers) and issues a single
    (B, 128L) @ (128L, 128C) dot — two live blocks in the same column
    block accumulate inside the dot — then statically places the C live
    output blocks among zeros. At the 93.75% prune target this both skips
    15/16 of the FLOPs and replaces O/128 small dots per matrix with one,
    which matters because the serial sample step pays MXU pipeline
    fill/drain per dot (measured v5e B=128: 5.7-6.1 us/step vs 10.3-10.6
    dense; round-2's br=8 schedule was 5.4x SLOWER than dense —
    concatenating 8-lane slices per column block serialized on VPU
    shuffles).

    br=8 (legacy ``allow_br8`` path, matrices whose dims don't tile by
    128): per column block, concatenate the live 8-row slices of ``op``
    and dot against the packed (8L_j, 128) blocks.
    """
    B = op.shape[0]
    bc = SPARSE_BC
    dt = w_ref.dtype
    if br == SPARSE_BR_MXU:
        order = [r for rj in rows for r in rj]          # (j, r) lex order
        if not order:  # fully-pruned matrix: no live blocks, output is 0
            return jnp.zeros((B, len(rows) * bc), jnp.float32)
        live_j = [j for j, rj in enumerate(rows) if rj]
        jpos = {j: c for c, j in enumerate(live_j)}
        hg = jnp.concatenate(
            [op[:, r * br:(r + 1) * br] for r in order], axis=1)
        oc = _dot(hg.astype(dt), w_ref[:])              # (B, 128C)
        return jnp.concatenate(
            [oc[:, jpos[j] * bc:(jpos[j] + 1) * bc] if j in jpos
             else jnp.zeros((B, bc), jnp.float32)
             for j in range(len(rows))], axis=1)
    outs = []
    off = 0
    for rj in rows:
        if not rj:
            outs.append(jnp.zeros((B, bc), jnp.float32))
            continue
        hg = jnp.concatenate([op[:, r * br:(r + 1) * br] for r in rj],
                             axis=1)
        outs.append(_dot(hg.astype(dt),
                         w_ref[off * br:(off + len(rj)) * br, :]))
        off += len(rj)
    return jnp.concatenate(outs, axis=1)


def _pack_block_sparse(W, max_density: float = 0.5, br: int = SPARSE_BR):
    """Host-side packing of a masked weight into (packed_blocks, rows).

    Detects the zero-(br,128)-block pattern of ``W`` (exact: skipped blocks
    contribute exactly 0 to the matmul) and packs the live blocks into one
    dense f32 array laid out for the matching ``_sparse_mm`` schedule:
    br=128 -> the (128L, 128C) single-dot block-layout matrix; br=8 -> the
    live (8, 128) blocks stacked row-major in column-block order. Returns
    None when the matrix is not block-sparse enough to pay for the
    schedule, or its shape is not tile-divisible.
    """
    W = np.asarray(W, np.float32)
    I, O = W.shape
    bc = SPARSE_BC
    if I % br or O % bc:
        return None
    keep = np.abs(W).reshape(I // br, br, O // bc, bc).sum(axis=(1, 3)) > 0.0
    if keep.mean() > max_density:
        return None
    rows = tuple(tuple(int(r) for r in np.where(keep[:, j])[0])
                 for j in range(O // bc))
    if br == SPARSE_BR_MXU:
        lives = [(r, j) for j, rj in enumerate(rows) for r in rj]
        live_j = [j for j, rj in enumerate(rows) if rj]
        jpos = {j: c for c, j in enumerate(live_j)}
        L, C = max(len(lives), 1), max(len(live_j), 1)
        packed = np.zeros((L * br, C * bc), np.float32)
        for k, (r, j) in enumerate(lives):
            packed[k * br:(k + 1) * br,
                   jpos[j] * bc:(jpos[j] + 1) * bc] = (
                W[r * br:(r + 1) * br, j * bc:(j + 1) * bc])
        return packed, rows
    parts = [W[r * br:(r + 1) * br, j * bc:(j + 1) * bc]
             for j, rj in enumerate(rows) for r in rj]
    packed = (np.concatenate(parts, axis=0) if parts
              else np.zeros((br, bc), np.float32))
    return packed, rows


# position of each sparsifiable weight in the kernel's flat weights list
_SPARSE_POS = {"wi1": 3, "wh1": 4, "wi2x": 7, "wi2a": 8, "wh2": 9,
               "w1x": 12, "w1a": 13, "w2x": 15, "w2a": 16}


def _make_kernel(voc: WaveRNNConfig, bits: int, chunk: int, n_mels: int,
                 mol: bool, use_prng: bool, with_state: bool = False,
                 snapshot_at=None, sparse=None, gates_dtype=jnp.float32):
    R = voc.rnn_dims
    FC = voc.fc_dims
    A = voc.aux_dims
    n_classes = voc.n_classes(bits)
    nr_mix = n_classes // 3 if mol else 0
    C_IN = n_mels + A  # x-independent input-layer columns
    gdtype = gates_dtype  # recurrence/gate compute + state precision

    sparse = {name: (br, rows) for name, br, rows in sparse} if sparse else {}

    def mm(op, w_ref, name):
        entry = sparse.get(name)
        if entry is None:
            # Mosaic requires a 32-bit matmul accumulator; drop to the gate
            # dtype on the way out so the recurrence runs narrow
            out = _dot(op.astype(w_ref.dtype), w_ref[:], jnp.float32)
            return out if gdtype == jnp.float32 else out.astype(gdtype)
        br, rows = entry
        out = _sparse_mm(op, w_ref, rows, br)
        # same gate-dtype downcast as the dense branch: sparse + bf16 gates
        # must not store f32 into the narrow recurrence/scratch
        return out if gdtype == jnp.float32 else out.astype(gdtype)

    def kernel(seed_ref,  # SMEM (1,)
               cond_ref,  # (chunk, B, n_mels + 4A)
               *rest):
        # injected-noise block only when replaying (MOL (chunk,B,nr_mix+1) =
        # mix|scale, RAW (chunk,B,n_classes)); with the on-core PRNG there
        # is NO noise input at all — a dummy (chunk,B,1) stream would pad
        # its trailing dim to 128 VMEM lanes (~36 MB at 128 folds, OOM at
        # 1000+ folds for long-form generation)
        rest = list(rest)
        u_ref = None if use_prng else rest.pop(0)
        (w_Ic_ref, w_Ix_ref, b_I_ref,
         wi1_ref, wh1_ref, bi1_ref, bh1_ref,
         wi2x_ref, wi2a_ref, wh2_ref, bi2_ref, bh2_ref,
         w1x_ref, w1a_ref, b1_ref,
         w2x_ref, w2a_ref, b2_ref,
         w3_ref, b3_ref) = rest[:20]
        rest = rest[20:]
        if with_state:
            # (h1_0, h2_0, x_0) inputs then (samples, snap_h1, snap_h2,
            # snap_x) outputs then scratch
            (h1_0_ref, h2_0_ref, x_0_ref, out_ref, snap_h1_ref, snap_h2_ref,
             snap_x_ref, h1_ref, h2_ref, x_ref, acc_ref) = rest
        else:
            out_ref, h1_ref, h2_ref, x_ref, acc_ref = rest
        prog = pl.program_id(0)
        step0 = prog == 0
        # every per-step vector stays sublane-major (B across sublanes):
        # samples land in a (B, chunk) accumulator via a lane-iota select,
        # written out once per chunk — a per-step (T, B) row write would
        # force a sublane->lane relayout (measured ~40% of step time)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1)

        @pl.when(step0)
        def _():
            if with_state:
                h1_ref[:] = h1_0_ref[:].astype(gdtype)
                h2_ref[:] = h2_0_ref[:].astype(gdtype)
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
                    snap_h1_ref[:] = h1_ref[:].astype(jnp.float32)
                    snap_h2_ref[:] = h2_ref[:].astype(jnp.float32)
                    snap_x_ref[:] = x_ref[:]

            cdtype = w_Ic_ref.dtype
            # inp accumulates in f32 (the x autoregressive path is the
            # numerically sensitive one), then drops to the gate dtype
            inp = (_dot(cond[:, :C_IN].astype(cdtype), w_Ic_ref[:])
                   + x * w_Ix_ref[:] + b_I_ref[:]).astype(gdtype)
            gi1 = mm(inp, wi1_ref, "wi1") + bi1_ref[:]
            gh1 = mm(h1, wh1_ref, "wh1") + bh1_ref[:]
            h1 = _gates(gi1, gh1, h1)
            xr = inp + h1

            a2 = cond[:, C_IN: C_IN + A]
            gi2 = (mm(xr, wi2x_ref, "wi2x") + mm(a2, wi2a_ref, "wi2a")
                   + bi2_ref[:])
            gh2 = mm(h2, wh2_ref, "wh2") + bh2_ref[:]
            h2 = _gates(gi2, gh2, h2)
            x2 = xr + h2

            a3 = cond[:, C_IN + A: C_IN + 2 * A]
            hf = jnp.maximum(
                mm(x2, w1x_ref, "w1x") + mm(a3, w1a_ref, "w1a")
                + b1_ref[:], 0.0)
            a4 = cond[:, C_IN + 2 * A: C_IN + 3 * A]
            hf = jnp.maximum(
                mm(hf, w2x_ref, "w2x") + mm(a4, w2a_ref, "w2a")
                + b2_ref[:], 0.0)
            logits = _dot(hf.astype(cdtype), w3_ref[:]) + b3_ref[:]  # (B, n_classes)

            sample = _sample_step(logits,
                                  None if use_prng else u_ref[i], mol=mol,
                                  use_prng=use_prng, n_classes=n_classes,
                                  nr_mix=nr_mix)

            h1_ref[:] = h1
            h2_ref[:] = h2
            acc_ref[:] = jnp.where(lane_iota == i, sample[:, None],
                                   acc_ref[:])
            x_ref[:, 0] = sample
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)
        out_ref[:] = acc_ref[:]

    return kernel


@partial(jax.jit,
         static_argnames=("voc", "bits", "chunk", "compute_dtype", "interpret",
                          "state_snapshot_at", "gates_dtype", "sparse_static"))
def generate_pallas_with_state(params, mels_up, aux, voc: WaveRNNConfig,
                               bits: int, key, noise=None, chunk: int = 128,
                               compute_dtype=jnp.bfloat16,
                               interpret: bool = False, init_state=None,
                               state_snapshot_at: int = 0,
                               gates_dtype=jnp.float32,
                               sparse_static=(), sparse_arrays=()):
    """Sample-loop kernel with RNN-state I/O (exact-seam fold handoff).

    init_state: optional (h1, h2, x) with x shape (B,) to resume from.
    Returns (samples (B, T), (snap_h1, snap_h2, snap_x)) where the snapshot
    is the state entering global step ``state_snapshot_at``.
    sparse_static/sparse_arrays: pack_sparse output — pruned streaming /
    exact-seam serving on the block-sparse schedule.
    """
    return _generate_pallas_impl(params, mels_up, aux, voc, bits, key, noise,
                                 chunk, compute_dtype, interpret,
                                 with_state=True, init_state=init_state,
                                 state_snapshot_at=state_snapshot_at,
                                 gates_dtype=gates_dtype,
                                 sparse_static=sparse_static,
                                 sparse_arrays=sparse_arrays)


@partial(jax.jit,
         static_argnames=("voc", "bits", "chunk", "compute_dtype", "interpret",
                          "gates_dtype"))
def generate_pallas(params, mels_up, aux, voc: WaveRNNConfig, bits: int, key,
                    noise=None, chunk: int = 128,
                    compute_dtype=jnp.bfloat16, interpret: bool = False,
                    gates_dtype=jnp.float32):
    """Run the persistent-weights sample loop. Mirrors generate_scan's API.

    mels_up: (B, T, n_mels); aux: (B, T, 4*aux_dims).
    Returns samples (B, T) float32.
    """
    return _generate_pallas_impl(params, mels_up, aux, voc, bits, key, noise,
                                 chunk, compute_dtype, interpret,
                                 with_state=False, init_state=None,
                                 state_snapshot_at=None,
                                 gates_dtype=gates_dtype)


@partial(jax.jit,
         static_argnames=("voc", "bits", "chunk", "compute_dtype", "interpret",
                          "sparse_static"))
def _generate_pallas_sparse_jit(params, mels_up, aux, voc, bits, key, noise,
                                sparse_arrays, chunk, compute_dtype, interpret,
                                sparse_static):
    return _generate_pallas_impl(params, mels_up, aux, voc, bits, key, noise,
                                 chunk, compute_dtype, interpret,
                                 with_state=False, init_state=None,
                                 state_snapshot_at=None,
                                 sparse_static=sparse_static,
                                 sparse_arrays=sparse_arrays)


def pack_sparse(params, voc: WaveRNNConfig, allow_br8: bool = False):
    """One-time host-side packing of a masked model's zero-block pattern.

    Reads every prunable weight back to the host, detects the zero-block
    structure, and packs the live blocks into dense arrays. Returns an
    opaque ``(sparse_static, sparse_arrays)`` pair for
    ``generate_pallas_sparse(..., packed=...)``.

    Serving MUST call this once after pruning freezes the masks: each pack
    pulls ~20 MB of device weights to the host (several hundred ms through
    a remote-execution tunnel — 8x the sparse kernel's own runtime at
    B=128/T=8192), so per-call repacking would erase the sparsity win.

    Schedule selection per matrix: ONLY (128,128)-block patterns (the
    production (128,128) block pruning from train/pruning.py) get the
    gather-free MXU schedule — each live block is one aligned lane-slice
    against one MXU tile, so 93.75% sparsity skips 15/16 of the matmul
    FLOPs outright. Everything else — including the ragged aux tails
    (wi2a/w1a/w2a, 32 rows) — stays DENSE: their FLOPs are trivial, and
    the finer (8,128) gathered schedule measured 4-5x SLOWER than dense
    on v5e in rounds 2-3 (concatenating 8-lane slices per column block
    serializes on VPU lane shuffles). ``allow_br8=True`` re-enables that
    schedule for numerical tests of legacy fine-grained masks only.
    """
    R, FC = voc.rnn_dims, voc.fc_dims
    host = {
        "wi1": params["rnn1"]["wi"],
        "wh1": params["rnn1"]["wh"],
        "wi2x": params["rnn2"]["wi"][:R],
        "wi2a": params["rnn2"]["wi"][R:],
        "wh2": params["rnn2"]["wh"],
        "w1x": params["fc1"]["w"][:R],
        "w1a": params["fc1"]["w"][R:],
        "w2x": params["fc2"]["w"][:FC],
        "w2a": params["fc2"]["w"][FC:],
    }
    brs = (SPARSE_BR_MXU, SPARSE_BR) if allow_br8 else (SPARSE_BR_MXU,)
    sparse_static, sparse_arrays = [], []
    for name, W in host.items():
        for br in brs:
            packed_rows = _pack_block_sparse(W, br=br)
            if packed_rows is not None:
                packed, rows = packed_rows
                sparse_static.append((name, br, rows))
                sparse_arrays.append(jnp.asarray(packed))
                break
    return tuple(sparse_static), tuple(sparse_arrays)


def generate_pallas_sparse(params, mels_up, aux, voc: WaveRNNConfig, bits: int,
                           key, noise=None, chunk: int = 128,
                           compute_dtype=jnp.bfloat16,
                           interpret: bool = False, allow_br8: bool = False,
                           packed=None):
    """Block-sparse sample-loop kernel for pruned models (SURVEY §7 step 8;
    reference sparse prototype: notebooks/Pruning - Scratchpad.ipynb cells
    4-5). Mirrors generate_pallas's API and is numerically exact vs the
    dense kernel on the same (masked) weights.

    Weights must already be masked (train/pruning.py with (128,128) blocks
    so zeros align to MXU tiles). The zero-block pattern is read from the
    concrete weights on the host (see ``pack_sparse`` — pass ``packed`` to
    amortize that one-time cost across calls), and the kernel is
    specialized to the pattern — it recompiles if the pattern changes,
    which is the right trade for serving where masks are frozen after
    pruning. Matrices that are not block-sparse (>50% live blocks, e.g.
    unstructured masks) stay dense automatically; fc3 (n_classes columns)
    always dense. Measured v5e, B=128: 5.75 us/step vs 10.6 dense (0.54x)
    at the reference's 93.75% prune target.
    """
    if packed is None:
        packed = pack_sparse(params, voc, allow_br8=allow_br8)
    sparse_static, sparse_arrays = packed
    return _generate_pallas_sparse_jit(
        params, mels_up, aux, voc, bits, key, noise, sparse_arrays,
        chunk=chunk, compute_dtype=compute_dtype, interpret=interpret,
        sparse_static=sparse_static)


def _core_weight_casts(params, R: int, FC: int, cd, gd):
    """rnn/fc weight views cast for VMEM residency, shared by the
    materialized and fused kernels (they differ only in how the I-layer
    input rows are split). Gate-path biases live in the gate dtype so the
    bf16 recurrence never upcasts; fc3's bias stays f32 (the logits are
    the numerically sensitive end)."""
    return [
        params["rnn1"]["wi"].astype(cd), params["rnn1"]["wh"].astype(cd),
        params["rnn1"]["bi"][None].astype(gd),
        params["rnn1"]["bh"][None].astype(gd),
        params["rnn2"]["wi"][:R].astype(cd), params["rnn2"]["wi"][R:].astype(cd),
        params["rnn2"]["wh"].astype(cd),
        params["rnn2"]["bi"][None].astype(gd),
        params["rnn2"]["bh"][None].astype(gd),
        params["fc1"]["w"][:R].astype(cd), params["fc1"]["w"][R:].astype(cd),
        params["fc1"]["b"][None].astype(gd),
        params["fc2"]["w"][:FC].astype(cd), params["fc2"]["w"][FC:].astype(cd),
        params["fc2"]["b"][None].astype(gd),
        params["fc3"]["w"].astype(cd),
        params["fc3"]["b"][None].astype(jnp.float32),
    ]


def _noise_stream(key, noise, T_pad: int, mol: bool):
    """Build the (T_pad, B, NU) sampling-noise stream + an int32 PRNG seed.

    All noise rides in ONE time-major stream so every per-step read is a
    (B, ·) sublane-major tile (a separate (T, B) u_s would make its row read
    lane-major and force a per-step relayout).
    """
    k_seed, _, _ = jax.random.split(key, 3)
    if noise is None:
        # production: the kernel draws from the on-core PRNG (seeded below);
        # no noise stream at all (a dummy would lane-pad its trailing dim
        # 128x in VMEM)
        u = None
    elif mol:
        u_mix, u_s = noise
        u_mix = jnp.pad(u_mix, ((0, T_pad - u_mix.shape[0]), (0, 0), (0, 0)),
                        constant_values=0.5)
        u_s = jnp.pad(u_s, ((0, T_pad - u_s.shape[0]), (0, 0)),
                      constant_values=0.5)
        u = jnp.concatenate([u_mix, u_s[..., None]], axis=-1)
    else:  # streamed RAW Gumbel uniforms (tests / replay)
        u = jnp.pad(noise, ((0, T_pad - noise.shape[0]), (0, 0), (0, 0)),
                    constant_values=0.5)
    seed = jax.random.randint(k_seed, (1,), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)
    return seed, u


def _generate_pallas_impl(params, mels_up, aux, voc, bits, key, noise, chunk,
                          compute_dtype, interpret, with_state, init_state,
                          state_snapshot_at, sparse_static=(),
                          sparse_arrays=(), gates_dtype=jnp.float32):
    B, T, n_mels = mels_up.shape
    R, FC, A = voc.rnn_dims, voc.fc_dims, voc.aux_dims
    n_classes = voc.n_classes(bits)
    mol = voc.mode == "MOL"
    use_prng = noise is None

    T_pad = -(-T // chunk) * chunk
    cond = jnp.concatenate([mels_up, aux], axis=-1)          # (B, T, n_mels+4A)
    cond = jnp.pad(cond, ((0, 0), (0, T_pad - T), (0, 0)))
    cond = jnp.swapaxes(cond, 0, 1)                           # (T_pad, B, ·)

    seed, u = _noise_stream(key, noise, T_pad, mol)
    noise_in = [] if u is None else [u]

    cd = compute_dtype
    gd = gates_dtype  # gate-path biases live in the gate dtype so the
    # bf16 recurrence never upcasts (b_I and b3 stay f32: the x path and
    # the logits are the numerically sensitive ends)
    w_I = params["I"]["w"]
    weights = [
        w_I[1:].astype(cd),                      # w_Ic (n_mels+A, R)
        w_I[0:1].astype(jnp.float32),            # w_Ix (1, R)
        params["I"]["b"][None].astype(jnp.float32),
    ] + _core_weight_casts(params, R, FC, cd, gd)
    for (name, _, _), arr in zip(sparse_static, sparse_arrays):
        # packed nonzero blocks, cast to the compute dtype like their dense
        # counterparts (f32 packed weights would put every sparse matmul on
        # the MXU's slow f32 path)
        weights[_SPARSE_POS[name]] = arr.astype(cd)

    n_grid = T_pad // chunk

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda t, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((chunk, B, n_mels + 4 * A), lambda t, s: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((chunk, B, u.shape[-1]), lambda t, s: (t, 0, 0),
                     memory_space=pltpu.VMEM)
        for u in noise_in
    ] + [const_spec(w.shape) for w in weights]

    scratch = [
        pltpu.VMEM((B, R), gd),               # h1
        pltpu.VMEM((B, R), gd),               # h2
        pltpu.VMEM((B, 128), jnp.float32),    # x (autoregressive sample)
        pltpu.VMEM((B, chunk), jnp.float32),  # sample accumulator
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, chunk), lambda t, s: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    if not with_state:
        kernel = _make_kernel(voc, bits, chunk, n_mels, mol, use_prng,
                              sparse=sparse_static, gates_dtype=gd)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, cond, *noise_in, *weights)
        return out[:, :T]

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
        pl.BlockSpec((B, chunk), lambda t, s: (0, t),
                     memory_space=pltpu.VMEM),
        const_spec((B, R)), const_spec((B, R)), const_spec((B, 128)),
    )
    grid_spec_state = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid,),
        in_specs=in_specs + state_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = _make_kernel(voc, bits, chunk, n_mels, mol, use_prng,
                          with_state=True, snapshot_at=state_snapshot_at,
                          sparse=sparse_static, gates_dtype=gd)
    out, s_h1, s_h2, s_x = pl.pallas_call(
        kernel,
        grid_spec=grid_spec_state,
        out_shape=(
            jax.ShapeDtypeStruct((B, T_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, R), jnp.float32),
            jax.ShapeDtypeStruct((B, R), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, cond, *noise_in, *weights, h1_0, h2_0, x_0_pad)
    return (out[:, :T], (s_h1, s_h2, s_x[:, 0]))


# --------------------------------------------------------------------------
# Fused-conditioning kernel: mel-rate streaming + in-kernel polyphase
# --------------------------------------------------------------------------

#: position of each per-step sparsifiable weight in the FUSED kernel's flat
#: weights list (the hoisted per-chunk aux matmuls wi2a/w1a/w2a stay dense:
#: they run once per hop-length chunk, and their 32-row shapes never tile
#: by (128,128) anyway)
_FUSED_SPARSE_POS = {"wi1": 4, "wh1": 5, "wi2x": 8, "wh2": 10,
                     "w1x": 13, "w2x": 16}


def _make_fused_kernel(voc: WaveRNNConfig, bits: int, hop: int, n_mels: int,
                       K: int, aux_tap: int, mol: bool, use_prng: bool,
                       gates_dtype=jnp.float32, with_state: bool = False,
                       snapshot_at=None, sparse=None):
    """Sample-loop kernel that upsamples its own conditioning.

    Instead of streaming sample-rate (chunk, B, n_mels + 4A) blocks, each
    grid step (= one hop-length chunk, phase-aligned to a mel frame) reads K
    shifted frame rows of a tiny folded frame array and

      * projects the K mel frames through the I-layer's mel columns ONCE,
        then per step combines them with the polyphase scalars phi[j, p]
        (ops/polyphase.py) — K=5 (B, R) FMAs replace the per-step
        (B, 112) @ (112, R) conditioning matmul;
      * hoists ALL aux-stream matmuls (a1 -> I, a2 -> rnn2, a3 -> fc1,
        a4 -> fc2) out of the inner loop — aux is a frame repeat
        (fatchord:85-87), constant across the chunk's hop samples.

    HBM conditioning traffic drops from ~208 floats/step/fold to
    ~208 floats/FRAME/fold (hop x less), and the per-step serial matmul
    chain loses four launches.
    """
    R = voc.rnn_dims
    FC = voc.fc_dims
    A = voc.aux_dims
    n_classes = voc.n_classes(bits)
    nr_mix = n_classes // 3 if mol else 0
    gd = gates_dtype

    sparse = {name: (br, rows) for name, br, rows in sparse} if sparse else {}

    def kernel(seed_ref,   # SMEM (1,) scalar prefetch
               phi_ref,    # SMEM (K, hop) polyphase taps
               *rest):
        fr = rest[:K]      # K x (1, B, n_mels + 4A) shifted frame rows
        rest = list(rest[K:])
        u_ref = None if use_prng else rest.pop(0)  # replay noise only
        (w_Imel_ref, w_Ia1_ref, w_Ix_ref, b_I_ref,
         wi1_ref, wh1_ref, bi1_ref, bh1_ref,
         wi2x_ref, wi2a_ref, wh2_ref, bi2_ref, bh2_ref,
         w1x_ref, w1a_ref, b1_ref,
         w2x_ref, w2a_ref, b2_ref,
         w3_ref, b3_ref) = rest[:21]
        rest = rest[21:]
        if with_state:
            # (h1_0, h2_0, x_0) inputs then (samples, snap_h1, snap_h2,
            # snap_x) outputs then scratch — exact-seam fold handoff
            (h1_0_ref, h2_0_ref, x_0_ref, out_ref, snap_h1_ref, snap_h2_ref,
             snap_x_ref, h1_ref, h2_ref, x_ref, acc_ref) = rest
        else:
            out_ref, h1_ref, h2_ref, x_ref, acc_ref = rest
        prog = pl.program_id(0)

        @pl.when(prog == 0)
        def _():
            if with_state:
                h1_ref[:] = h1_0_ref[:].astype(h1_ref.dtype)
                h2_ref[:] = h2_0_ref[:].astype(h2_ref.dtype)
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

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1)
        cdtype = w_Imel_ref.dtype

        def mmd(op, w_ref, name=None):
            entry = sparse.get(name) if name is not None else None
            if entry is not None:
                out = _sparse_mm(op, w_ref, entry[1], entry[0])
            else:
                out = _dot(op.astype(w_ref.dtype), w_ref[:], jnp.float32)
            # shared gate-dtype downcast (sparse included: f32 results must
            # not leak into the bf16 recurrence)
            return out if gd == jnp.float32 else out.astype(gd)

        # ---- per-chunk hoisted conditioning (constant for hop steps) ----
        # mel taps projected through the I layer: (B, R) f32 each
        ps = [_dot(fr[j][0][:, :n_mels].astype(cdtype), w_Imel_ref[:])
              for j in range(K)]
        a = fr[aux_tap][0][:, n_mels:]                        # (B, 4A)
        base_I = (_dot(a[:, :A].astype(cdtype), w_Ia1_ref[:])
                  + b_I_ref[:])                               # f32 (B, R)
        gi2_a = mmd(a[:, A:2 * A], wi2a_ref) + bi2_ref[:]
        f1_a = mmd(a[:, 2 * A:3 * A], w1a_ref) + b1_ref[:]
        f2_a = mmd(a[:, 3 * A:], w2a_ref) + b2_ref[:]

        def body(i, _):
            x = x_ref[:, 0:1]                                 # (B, 1) f32
            h1 = h1_ref[:]
            h2 = h2_ref[:]
            if with_state and snapshot_at is not None:
                # record the state *entering* the global snapshot step
                @pl.when(prog * hop + i == snapshot_at)
                def _():
                    snap_h1_ref[:] = h1_ref[:].astype(jnp.float32)
                    snap_h2_ref[:] = h2_ref[:].astype(jnp.float32)
                    snap_x_ref[:] = x_ref[:]

            inp = base_I + x * w_Ix_ref[:]
            for j in range(K):
                inp = inp + phi_ref[j, i] * ps[j]
            inp = inp.astype(gd)

            gi1 = mmd(inp, wi1_ref, "wi1") + bi1_ref[:]
            gh1 = mmd(h1, wh1_ref, "wh1") + bh1_ref[:]
            h1 = _gates(gi1, gh1, h1)
            xr = inp + h1

            gi2 = mmd(xr, wi2x_ref, "wi2x") + gi2_a
            gh2 = mmd(h2, wh2_ref, "wh2") + bh2_ref[:]
            h2 = _gates(gi2, gh2, h2)
            x2 = xr + h2

            hf = jnp.maximum(mmd(x2, w1x_ref, "w1x") + f1_a, 0.0)
            hf = jnp.maximum(mmd(hf, w2x_ref, "w2x") + f2_a, 0.0)
            logits = _dot(hf.astype(cdtype), w3_ref[:]) + b3_ref[:]

            sample = _sample_step(logits,
                                  None if use_prng else u_ref[i], mol=mol,
                                  use_prng=use_prng, n_classes=n_classes,
                                  nr_mix=nr_mix)

            h1_ref[:] = h1
            h2_ref[:] = h2
            acc_ref[:] = jnp.where(lane_iota == i, sample[:, None],
                                   acc_ref[:])
            x_ref[:, 0] = sample
            return 0

        jax.lax.fori_loop(0, hop, body, 0)
        out_ref[0] = acc_ref[:]

    return kernel


@partial(jax.jit,
         static_argnames=("voc", "bits", "hop", "aux_tap", "fold_chunks",
                          "compute_dtype", "gates_dtype", "interpret",
                          "sparse_static"))
def generate_pallas_fused(params, frames_folded, phi, voc: WaveRNNConfig,
                          bits: int, key, hop: int, aux_tap: int,
                          fold_chunks: int, noise=None,
                          compute_dtype=jnp.bfloat16,
                          gates_dtype=jnp.float32, interpret: bool = False,
                          sparse_static=(), sparse_arrays=()):
    """Persistent-weights sample loop with IN-KERNEL conditioning upsample.

    frames_folded: (fold_chunks + K - 1, num_folds, n_mels + 4*aux_dims)
      frame-rate folded conditioning from ops/polyphase.build_folded_frames;
    phi: (K, hop) polyphase tap table from ops/polyphase.phi_table.
    Returns samples (num_folds, fold_chunks * hop) float32.

    Replaces upsample-to-sample-rate + fold_with_overlap + generate_pallas
    for the production batched-generation path (fatchord_version.py:169-264)
    whenever target/overlap are hop multiples; trajectories match those of
    the materialized path except in the last fold's zero-padded tail (the
    materialized path zeroes conditioning beyond the utterance where this
    path still sees real edge frames — all such samples fall beyond
    wave_len and are discarded by xfade/trim).

    sparse_static/sparse_arrays (from ``pack_sparse``): per-step gate/fc
    matmuls on (128,128)-block-pruned weights run the single-dot sparse
    schedule — pruned serving on the PRODUCTION path.
    """
    return _fused_impl(params, frames_folded, phi, voc, bits, key, hop,
                       aux_tap, fold_chunks, noise, compute_dtype,
                       gates_dtype, interpret, with_state=False,
                       init_state=None, state_snapshot_at=None,
                       sparse_static=sparse_static,
                       sparse_arrays=sparse_arrays)


@partial(jax.jit,
         static_argnames=("voc", "bits", "hop", "aux_tap", "fold_chunks",
                          "compute_dtype", "gates_dtype", "interpret",
                          "state_snapshot_at"))
def generate_pallas_fused_with_state(params, frames_folded, phi,
                                     voc: WaveRNNConfig, bits: int, key,
                                     hop: int, aux_tap: int, fold_chunks: int,
                                     noise=None, compute_dtype=jnp.bfloat16,
                                     gates_dtype=jnp.float32,
                                     interpret: bool = False,
                                     init_state=None,
                                     state_snapshot_at: int = 0):
    """Fused-conditioning sample loop with RNN-state I/O (exact-seam fold
    handoff on frame-rate conditioning). Mirrors
    generate_pallas_with_state's contract: returns (samples (B, T),
    (snap_h1, snap_h2, snap_x)) with the snapshot taken entering global
    step ``state_snapshot_at``; ``init_state`` = (h1, h2, x) resumes."""
    return _fused_impl(params, frames_folded, phi, voc, bits, key, hop,
                       aux_tap, fold_chunks, noise, compute_dtype,
                       gates_dtype, interpret, with_state=True,
                       init_state=init_state,
                       state_snapshot_at=state_snapshot_at)


def _fused_impl(params, frames_folded, phi, voc, bits, key, hop, aux_tap,
                fold_chunks, noise, compute_dtype, gates_dtype, interpret,
                with_state, init_state, state_snapshot_at,
                sparse_static=(), sparse_arrays=()):
    nf_loc, B, C = frames_folded.shape
    K, hop_ = phi.shape
    assert hop_ == hop and nf_loc == fold_chunks + K - 1
    R = voc.rnn_dims
    n_mels = C - 4 * voc.aux_dims
    n_classes = voc.n_classes(bits)
    mol = voc.mode == "MOL"
    use_prng = noise is None
    T = fold_chunks * hop

    seed, u = _noise_stream(key, noise, T, mol)
    noise_in = [] if u is None else [u]

    cd = compute_dtype
    gd = gates_dtype
    w_I = params["I"]["w"]  # rows: [x, mel(n_mels), a1(A)]
    A = voc.aux_dims
    FCd = voc.fc_dims
    weights = [
        w_I[1:1 + n_mels].astype(cd),            # w_Imel
        w_I[1 + n_mels:].astype(cd),             # w_Ia1
        w_I[0:1].astype(jnp.float32),            # w_Ix
        params["I"]["b"][None].astype(jnp.float32),
    ] + _core_weight_casts(params, R, FCd, cd, gd)
    # per-step sparsifiable weights swap in their packed form (the hoisted
    # per-chunk aux matmuls keep dense weights — see _FUSED_SPARSE_POS)
    sparse_used = tuple(e for e in sparse_static if e[0] in _FUSED_SPARSE_POS)
    for (name, _, _), arr in zip(sparse_static, sparse_arrays):
        if name in _FUSED_SPARSE_POS:
            weights[_FUSED_SPARSE_POS[name]] = arr.astype(cd)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda t, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((K, hop), lambda t, s: (0, 0),
                     memory_space=pltpu.SMEM),                # phi
    ] + [
        pl.BlockSpec((1, B, C), lambda t, s, j=j: (t + j, 0, 0),
                     memory_space=pltpu.VMEM)                 # frame taps
        for j in range(K)
    ] + [
        pl.BlockSpec((hop, B, u.shape[-1]), lambda t, s: (t, 0, 0),
                     memory_space=pltpu.VMEM)                 # replay noise
        for u in noise_in
    ] + [const_spec(w.shape) for w in weights]

    # output is (fold_chunks, B, hop): Mosaic requires the last two block
    # dims be (8, 128)-divisible OR equal to the array dims — hop (275) is
    # not lane-divisible, so chunks stack on a leading grid dim and the
    # (B, T) layout is restored by one cheap XLA transpose outside.
    scratch = [
        pltpu.VMEM((B, R), gd),               # h1
        pltpu.VMEM((B, R), gd),               # h2
        pltpu.VMEM((B, 128), jnp.float32),    # x
        pltpu.VMEM((B, hop), jnp.float32),    # sample accumulator
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(fold_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, B, hop), lambda t, s: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    if not with_state:
        kernel = _make_fused_kernel(voc, bits, hop, n_mels, K, aux_tap, mol,
                                    use_prng, gates_dtype=gd,
                                    sparse=sparse_used)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((fold_chunks, B, hop),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, phi, *([frames_folded] * K), *noise_in, *weights)
        return jnp.swapaxes(out, 0, 1).reshape(B, T)

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
    grid_spec_state = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(fold_chunks,),
        in_specs=in_specs + state_specs,
        out_specs=(
            pl.BlockSpec((1, B, hop), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec((B, R)), const_spec((B, R)), const_spec((B, 128)),
        ),
        scratch_shapes=scratch,
    )
    kernel = _make_fused_kernel(voc, bits, hop, n_mels, K, aux_tap, mol,
                                use_prng, gates_dtype=gd, with_state=True,
                                snapshot_at=state_snapshot_at,
                                sparse=sparse_used)
    out, s_h1, s_h2, s_x = pl.pallas_call(
        kernel,
        grid_spec=grid_spec_state,
        out_shape=(
            jax.ShapeDtypeStruct((fold_chunks, B, hop), jnp.float32),
            jax.ShapeDtypeStruct((B, R), jnp.float32),
            jax.ShapeDtypeStruct((B, R), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed, phi, *([frames_folded] * K), *noise_in, *weights,
      h1_0, h2_0, x_0_pad)
    return (jnp.swapaxes(out, 0, 1).reshape(B, T), (s_h1, s_h2, s_x[:, 0]))
