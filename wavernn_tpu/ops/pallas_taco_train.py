"""Pallas TPU kernels for the TRAINING Tacotron TF decoder recurrence
(fwd + custom VJP) — the last un-kernelized recurrence in the framework.

Why: the reference's Tacotron training step is dominated by the decoder's
~300 sequential r-frame groups (reference tacotron.py:229-286 inside the
train loop train_tacotron.py:156-228).  The XLA `lax.scan` twin
(models/tacotron.forward, teacher_forcing branch) costs ~6.9 ms forward +
~11.3 ms backward of a ~24 ms step at bs 16 on v5e — each group is a
prenet->attn-GRU->LSA->2xLSTM->mel_proj chain of small (B, ~512) matmuls
at ~12% MXU occupancy, and autodiff's backward scan re-reads every weight
from HBM and re-materializes the chain per group.  Here both directions
run as persistent-state Pallas kernels:

  * all decoder weights stay VMEM-resident across all groups;
  * the LSA location-sensitive attention runs in a LANE-STACKED layout:
    utterance b's text positions occupy lanes [b*T_pad, (b+1)*T_pad) of
    one (8, S = B*T_pad) plane, so the 31-tap location conv is 31 cheap
    lane-rolls of TWO rows (cumulative + previous attention), and the
    conv x L-projection composition collapses into ONE (D, 64) @ (64, S)
    MXU matmul per step against the shift stack (per-channel conv planes
    are never materialized);
  * per-utterance sums / broadcasts of the smooth-attention normalization
    (sigmoid / per-utterance sum, reference tacotron.py:200) are matmuls
    against a constant 0/1 block indicator, all in f32;
  * the forward saves gate activations and per-step states to HBM (one
    packed stream each) so the backward spends ONE matmul per dependency
    edge instead of re-materializing; every weight gradient accumulates
    IN-KERNEL into a VMEM accumulator via transposed-contraction dots
    ((B, M) x (B, N) -> (M, N)), so the backward emits no per-step weight
    streams — only the prenet-input cotangent (the TF prenet itself is
    hoisted outside the recurrence, models/tacotron.py TF branch).

Zero-wrap invariant (same as ops/pallas_taco.py): lane rolls are circular
across the whole stacked plane, but each utterance block keeps >= 15
trailing zero lanes (T_text <= T_pad - CONV_HALF) and scores are masked,
so wrapped reads land on zeros; pad-lane cotangents die at the masked
sigmoid, which keeps the backward exact without extra masking.

Precision: all in-kernel math is f32 (matmul accumulators, attention
normalization, the cumulative accumulator); streams and states are stored
in the caller's compute dtype and re-loaded for the backward, so
recomputed quantities match the forward bit-for-bit.  The deliberate
deviation from the bf16 XLA scan: gates/elementwise run f32 here where
the scan runs them bf16 — f32 kernel-vs-scan parity is exact to ~1e-5 and
bf16 agrees at loss level (tests/test_pallas_taco_train.py).

Two arms share the kernel factories: TEACHER FORCING (prenet input is
ground truth, so the prenet and its dropout hoist outside; zoneout is
the only in-loop noise, masks drawn outside with the scan's exact key
stream via `zoneout_masks`) and ATTENTION FORCING (`_core_af`: context
weights come from the streamed attn_ref row, the prenet runs in-kernel
on the carried prev_frame with streamed pre-scaled dropout masks via
`af_masks`, and the backward adds the prenet chain, the attn_ref
cotangent stream, and a Dprev carry).  Eval-mode TF (the AF-online
teacher, GTA/attn-ref export) rides the TF arm with zero zoneout masks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_common import (dot as _dot, dot_ss as _dot_ss,
                            dot_tt as _dot_tt, pick_chunk as _pick_chunk,
                            round_up as _round_up, sig as _sig)

CONV_K = 31
CONV_HALF = 15
F32 = jnp.float32


# ==========================================================================
# forward kernel
# ==========================================================================

def _make_fwd_kernel(C: int, B: int, D: int, L: int, E: int, S: int, dt,
                     af: bool = False, n_mels: int = 0, r: int = 0):
    """af=False: teacher forcing (prenet hoisted outside -> pre stream).
    af=True: attention forcing — the prenet runs IN-KERNEL on the carried
    prev_frame (streamed pre-scaled dropout masks), context comes from the
    streamed attn_ref row, and the mel group's last frame feeds the next
    step's prenet (reference tacotron.py:252-254 attention-forcing arm)."""
    # static last-frame lane bounds (the body's GRU gate `r` shadows the
    # frames-per-group argument)
    lf0, lf1 = (r - 1) * n_mels, r * n_mels

    def kernel(*refs):
        if af:
            (aref_ref, dm1_ref, dm2_ref, zm1_ref, zm2_ref,     # streams in
             encS_ref, encpT_ref, mask_ref, eb_ref,            # consts
             w1p_ref, b1_ref, w2p_ref, b2_ref,
             awi_ref, abi_ref, awh_ref, abh_ref,
             wq_ref, qb_ref, W01_ref, v8_ref,
             wr_ref, br_ref,
             l1wi_ref, l1wh_ref, l1b_ref,
             l2wi_ref, l2wh_ref, l2b_ref, wm_ref,
             mel_ref, sc_ref, cum_ref,                         # streams out
             ah_ref, sv_ref, ctx_ref, x0_ref,
             g1_ref, c1_ref, h1_ref, g2_ref, c2_ref, h2_ref,
             prevs_ref,
             ah_st, ctx_st, h1_st, c1_st, h2_st, c2_st,        # scratch
             ca_st, stack_st, prev_st) = refs
        else:
            (pre_ref, zm1_ref, zm2_ref,
             encS_ref, encpT_ref, mask_ref, eb_ref,
             awi_ref, abi_ref, awh_ref, abh_ref,
             wq_ref, qb_ref, W01_ref, v8_ref,
             wr_ref, br_ref,
             l1wi_ref, l1wh_ref, l1b_ref,
             l2wi_ref, l2wh_ref, l2b_ref, wm_ref,
             mel_ref, sc_ref, cum_ref,
             ah_ref, sv_ref, ctx_ref, x0_ref,
             g1_ref, c1_ref, h1_ref, g2_ref, c2_ref, h2_ref,
             ah_st, ctx_st, h1_st, c1_st, h2_st, c2_st,
             ca_st, stack_st) = refs

        @pl.when(pl.program_id(0) == 0)
        def _():
            for ref in (ah_st, ctx_st, h1_st, c1_st, h2_st, c2_st, ca_st):
                ref[:] = jnp.zeros_like(ref)
            stack_st[:] = jnp.zeros_like(stack_st)
            if af:
                prev_st[:] = jnp.zeros_like(prev_st)

        def body(i, _):
            # ---- attention GRU (reference tacotron.py:237-239) ----
            # matmuls run on dt operands (bf16 MXU passes under mixed
            # precision, ~4x the f32 pass rate) with f32 accumulation;
            # all elementwise gate math stays f32
            if af:
                prev = prev_st[:]                              # (B, 128)
                prevs_ref[i] = prev
                p1 = jnp.maximum(_dot(prev, w1p_ref[:]) + b1_ref[:], 0.0)
                p1d = (p1 * dm1_ref[i].astype(F32)).astype(dt)
                p2 = jnp.maximum(_dot(p1d, w2p_ref[:]) + b2_ref[:], 0.0)
                pre = (p2 * dm2_ref[i].astype(F32)).astype(dt)
            else:
                pre = pre_ref[i]
            inp = jnp.concatenate([ctx_st[:], pre], axis=1)
            gi = _dot(inp, awi_ref[:]) + abi_ref[:]
            gh = _dot(ah_st[:], awh_ref[:]) + abh_ref[:]
            r = _sig(gi[:, :D] + gh[:, :D])
            z = _sig(gi[:, D:2 * D] + gh[:, D:2 * D])
            hn = gh[:, 2 * D:]
            n = jnp.tanh(gi[:, 2 * D:] + r * hn)
            ah = ((1.0 - z) * n + z * ah_st[:].astype(F32)).astype(dt)
            ah_st[:] = ah
            ah_ref[i] = ah
            sv_ref[i] = jnp.concatenate([r, z, n, hn], axis=-1).astype(dt)

            # ---- LSA smooth attention, lane-stacked (tacotron.py:187-205)
            q = _dot(ah, wq_ref[:]) + qb_ref[:]
            qpl = _dot(jnp.swapaxes(q, 0, 1), eb_ref[:])       # (D, S)
            ca = ca_st[:]
            for k in range(CONV_K):
                sh = pltpu.roll(ca, (CONV_HALF - k) % S, axis=1)
                stack_st[k, :] = sh[0, :].astype(dt)
                stack_st[CONV_K + k, :] = sh[1, :].astype(dt)
            locLT = _dot(W01_ref[:], stack_st[:])              # (D, S)
            argT = jnp.tanh(locLT + encpT_ref[:].astype(F32) + qpl)
            u8 = _dot(v8_ref[:], argT.astype(dt))              # (8, S)
            sigm = _sig(u8) * mask_ref[:]
            sums = _dot_tt(sigm, eb_ref[:])                    # (8, B)
            div = _dot(sums, eb_ref[:])                        # (8, S)
            div = jnp.where(div > 0.0, div, 1.0)
            # quantize to the compute dtype at the scan's rounding point
            # (lsa_scores returns u.dtype) before cumulative/context use
            scores = (sigm / div)[0:1].astype(dt).astype(F32)  # (1, S)
            sc_ref[i] = scores
            cum_ref[i] = ca_st[0:1, :]        # pre-update cumulative
            # scores are dt-quantized above, so the SC cast is lossless
            # (AF: context weights come from the attn_ref stream instead,
            # reference tacotron.py ctx_weights selection)
            if af:
                wrow = aref_ref[i].astype(F32)                 # (1, S)
            else:
                wrow = scores
            SC = (eb_ref[:] * wrow).astype(dt)                 # (B, S)
            ctx = _dot(SC, encS_ref[:]).astype(dt)
            ctx_st[:] = ctx
            ctx_ref[i] = ctx
            ca_st[0:1, :] = ca_st[0:1, :] + scores
            ca_st[1:2, :] = scores

            # ---- rnn_input + residual zoneout LSTMs (tacotron.py:252-264)
            cat = jnp.concatenate([ctx, ah], axis=1)
            x0 = (_dot(cat, wr_ref[:]) + br_ref[:]).astype(dt)
            x0_ref[i] = x0

            g1 = (_dot(x0, l1wi_ref[:]) + _dot(h1_st[:], l1wh_ref[:])
                  + l1b_ref[:])
            i1 = _sig(g1[:, :L])
            f1 = _sig(g1[:, L:2 * L])
            gg1 = jnp.tanh(g1[:, 2 * L:3 * L])
            o1 = _sig(g1[:, 3 * L:])
            c1 = (f1 * c1_st[:].astype(F32) + i1 * gg1).astype(dt)
            h1t = o1 * jnp.tanh(c1.astype(F32))
            zm1 = zm1_ref[i].astype(F32)
            h1 = (zm1 * h1_st[:].astype(F32) + (1.0 - zm1) * h1t).astype(dt)
            g1_ref[i] = jnp.concatenate([i1, f1, gg1, o1], axis=-1).astype(dt)
            c1_ref[i] = c1
            h1_ref[i] = h1
            c1_st[:] = c1
            h1_st[:] = h1
            x1 = (x0.astype(F32) + h1.astype(F32)).astype(dt)

            g2 = (_dot(x1, l2wi_ref[:]) + _dot(h2_st[:], l2wh_ref[:])
                  + l2b_ref[:])
            i2 = _sig(g2[:, :L])
            f2 = _sig(g2[:, L:2 * L])
            gg2 = jnp.tanh(g2[:, 2 * L:3 * L])
            o2 = _sig(g2[:, 3 * L:])
            c2 = (f2 * c2_st[:].astype(F32) + i2 * gg2).astype(dt)
            h2t = o2 * jnp.tanh(c2.astype(F32))
            zm2 = zm2_ref[i].astype(F32)
            h2 = (zm2 * h2_st[:].astype(F32) + (1.0 - zm2) * h2t).astype(dt)
            g2_ref[i] = jnp.concatenate([i2, f2, gg2, o2], axis=-1).astype(dt)
            c2_ref[i] = c2
            h2_ref[i] = h2
            c2_st[:] = c2
            h2_st[:] = h2
            x2 = (x1.astype(F32) + h2.astype(F32)).astype(dt)

            mel = _dot(x2, wm_ref[:])
            mel_ref[i] = mel.astype(dt)
            if af:
                # carry the group's LAST frame into the next step's prenet
                # (frame-major wm layout: frame t at lanes [t*nm, (t+1)*nm))
                lastf = mel[:, lf0:lf1].astype(dt)
                prev_st[:] = jnp.concatenate(
                    [lastf, jnp.zeros((B, 128 - n_mels), dt)], axis=1)
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    return kernel


def _fwd_impl(static, pre, zm1, zm2, encS, encpT, mask8, eb,
              awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
              l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm, af_pack=None):
    """af_pack=None: teacher forcing (pre = hoisted prenet stream).
    af_pack=(aref, dm1, dm2, w1p, b1, w2p, b2, n_mels, r): attention
    forcing — pre is ignored, the prenet runs in-kernel."""
    chunk, interpret = static
    S, E = encS.shape
    D = wq.shape[0]
    L = wr.shape[1]
    F_pad = wm.shape[1]
    if af_pack is None:
        G, B, P2 = pre.shape
        dt = pre.dtype
    else:
        aref, dm1, dm2, w1p, b1, w2p, b2, n_mels, r = af_pack
        G, B, P1 = dm1.shape
        P2 = dm2.shape[-1]
        dt = dm1.dtype
    C = _pick_chunk(G, chunk)
    G_pad = _round_up(G, C)
    if G_pad != G:
        pad3 = ((0, G_pad - G), (0, 0), (0, 0))
        zm1 = jnp.pad(zm1, pad3)
        zm2 = jnp.pad(zm2, pad3)
        if af_pack is None:
            pre = jnp.pad(pre, pad3)
        else:
            aref = jnp.pad(aref, ((0, G_pad - G), (0, 0)))
            dm1 = jnp.pad(dm1, pad3)
            dm2 = jnp.pad(dm2, pad3)
    n_grid = G_pad // C

    def tspec(*dims):
        nd = len(dims)
        return pl.BlockSpec((C,) + dims, lambda t: (t,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    consts = [encS, encpT, mask8, eb]
    if af_pack is not None:
        consts += [w1p, b1, w2p, b2]
    consts += [awi, abi, awh, abh, wq, qb, W01, v8,
               wr, br, l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm]
    if af_pack is None:
        streams = [pre, zm1, zm2]
        stream_specs = [tspec(B, P2), tspec(B, L), tspec(B, L)]
    else:
        streams = [aref[:, None, :], dm1, dm2, zm1, zm2]
        stream_specs = [tspec(1, S), tspec(B, P1), tspec(B, P2),
                        tspec(B, L), tspec(B, L)]
    out_specs = [tspec(B, F_pad), tspec(1, S), tspec(1, S),
                 tspec(B, D),
                 tspec(B, 4 * D), tspec(B, E), tspec(B, L),
                 tspec(B, 4 * L), tspec(B, L), tspec(B, L),
                 tspec(B, 4 * L), tspec(B, L), tspec(B, L)]
    out_shape = [
        jax.ShapeDtypeStruct((G_pad, B, F_pad), dt),
        jax.ShapeDtypeStruct((G_pad, 1, S), F32),
        jax.ShapeDtypeStruct((G_pad, 1, S), F32),
        jax.ShapeDtypeStruct((G_pad, B, D), dt),
        jax.ShapeDtypeStruct((G_pad, B, 4 * D), dt),
        jax.ShapeDtypeStruct((G_pad, B, E), dt),
        jax.ShapeDtypeStruct((G_pad, B, L), dt),
        jax.ShapeDtypeStruct((G_pad, B, 4 * L), dt),
        jax.ShapeDtypeStruct((G_pad, B, L), dt),
        jax.ShapeDtypeStruct((G_pad, B, L), dt),
        jax.ShapeDtypeStruct((G_pad, B, 4 * L), dt),
        jax.ShapeDtypeStruct((G_pad, B, L), dt),
        jax.ShapeDtypeStruct((G_pad, B, L), dt),
    ]
    scratch = [
        pltpu.VMEM((B, D), dt), pltpu.VMEM((B, E), dt),
        pltpu.VMEM((B, L), dt), pltpu.VMEM((B, L), dt),
        pltpu.VMEM((B, L), dt), pltpu.VMEM((B, L), dt),
        pltpu.VMEM((8, S), F32),
        pltpu.VMEM((64, S), dt),
    ]
    if af_pack is not None:
        out_specs.append(tspec(B, 128))
        out_shape.append(jax.ShapeDtypeStruct((G_pad, B, 128), dt))
        scratch.append(pltpu.VMEM((B, 128), dt))
    outs = pl.pallas_call(
        _make_fwd_kernel(C, B, D, L, E, S, dt, af=af_pack is not None,
                         n_mels=0 if af_pack is None else n_mels,
                         r=0 if af_pack is None else r),
        grid=(n_grid,),
        in_specs=stream_specs + [cspec(np.shape(c)) for c in consts],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*streams, *consts)
    mel, sc = outs[0][:G], outs[1][:G, 0]
    saved = outs[2:]                       # padded residual streams
    return (mel, sc), saved


# ==========================================================================
# backward kernel
# ==========================================================================

def _make_bwd_kernel(C: int, B: int, D: int, L: int, E: int, S: int,
                     n_grid: int, dt, af: bool = False, n_mels: int = 0,
                     r: int = 0):
    """af mirrors the forward's attention-forcing arm: in-kernel prenet
    backward (recomputed from the saved prev stream + streamed dropout
    masks), attn_ref cotangent emitted instead of the prenet-input stream,
    and a Dprev carry folding the next step's prenet-input cotangent into
    this step's mel-group last frame."""

    def kernel(*refs):
        if af:
            (aref_ref, dm1_ref, dm2_ref, zm1_ref, zm2_ref, dmel_ref,
             dsc_ref,
             scA_ref, scB_ref, cum_ref,
             ahA_ref, ahB_ref, svA_ref,
             ctxA_ref, ctxB_ref, x0A_ref,
             g1A_ref, c1A_ref, c1B_ref, h1A_ref, h1B_ref,
             g2A_ref, c2A_ref, c2B_ref, h2A_ref, h2B_ref, prevsA_ref,
             encST_ref, encpT_ref, mask_ref, eb_ref, ebT_ref,
             w1p_ref, b1_ref, w2p_ref, b2_ref, w1pT_ref, w2pT_ref,
             awiT_ref, awhT_ref, wq_ref, qb_ref, W01_ref, W01T_ref,
             v8_ref, wrT_ref, l1wiT_ref, l1whT_ref, l2wiT_ref, l2whT_ref,
             wmT_ref,
             daref_ref,
             dw1p_ref, db1_ref, dw2p_ref, db2_ref,
             dawi_ref, dabi_ref, dawh_ref, dabh_ref,
             dwqT_ref, dqb_ref, dW01_ref, dv_ref,
             dwr_ref, dbr_ref,
             dl1wi_ref, dl1wh_ref, dl1b_ref,
             dl2wi_ref, dl2wh_ref, dl2b_ref,
             dwm_ref, dencS_ref, dencpT_ref,
             Dah_st, Dctx_st, Dh1_st, Dc1_st, Dh2_st, Dc2_st, Dca_st,
             stack_st, Dprev_st) = refs
        else:
            (pre_ref, zm1_ref, zm2_ref, dmel_ref, dsc_ref,
             scA_ref, scB_ref, cum_ref,
             ahA_ref, ahB_ref, svA_ref,
             ctxA_ref, ctxB_ref, x0A_ref,
             g1A_ref, c1A_ref, c1B_ref, h1A_ref, h1B_ref,
             g2A_ref, c2A_ref, c2B_ref, h2A_ref, h2B_ref,
             encST_ref, encpT_ref, mask_ref, eb_ref, ebT_ref,
             awiT_ref, awhT_ref, wq_ref, qb_ref, W01_ref, W01T_ref,
             v8_ref, wrT_ref, l1wiT_ref, l1whT_ref, l2wiT_ref, l2whT_ref,
             wmT_ref,
             dpre_ref,
             dawi_ref, dabi_ref, dawh_ref, dabh_ref,
             dwqT_ref, dqb_ref, dW01_ref, dv_ref,
             dwr_ref, dbr_ref,
             dl1wi_ref, dl1wh_ref, dl1b_ref,
             dl2wi_ref, dl2wh_ref, dl2b_ref,
             dwm_ref, dencS_ref, dencpT_ref,
             Dah_st, Dctx_st, Dh1_st, Dc1_st, Dh2_st, Dc2_st, Dca_st,
             stack_st) = refs
        prog = pl.program_id(0)
        blk = n_grid - 1 - prog            # time-block index

        @pl.when(prog == 0)
        def _():
            accs = [dawi_ref, dabi_ref, dawh_ref, dabh_ref, dwqT_ref,
                    dqb_ref, dW01_ref, dv_ref, dwr_ref, dbr_ref,
                    dl1wi_ref, dl1wh_ref, dl1b_ref, dl2wi_ref,
                    dl2wh_ref, dl2b_ref, dwm_ref, dencS_ref, dencpT_ref]
            sts = [Dah_st, Dctx_st, Dh1_st, Dc1_st, Dh2_st, Dc2_st, Dca_st]
            if af:
                accs += [dw1p_ref, db1_ref, dw2p_ref, db2_ref]
                sts += [Dprev_st]
            for ref in sts:
                ref[:] = jnp.zeros_like(ref)
            stack_st[:] = jnp.zeros_like(stack_st)
            for ref in accs:
                ref[:] = jnp.zeros_like(ref)

        def prev(i, A_ref, B_ref):
            """Step g-1 value: within-block row i-1, block boundary from
            the one-block-earlier view's last row, origin (g == 0) zeros."""
            inblk = A_ref[jnp.maximum(i - 1, 0)].astype(F32)
            bound = B_ref[C - 1].astype(F32)
            bound = jnp.where(blk > 0, bound, jnp.zeros_like(bound))
            return jnp.where(i == 0, bound, inblk)

        def body(j, _):
            i = C - 1 - j
            # ---- recompute x1/x2; mel_proj + LSTM2 backward ----
            # cotangent matmuls run on dt operands with f32 accumulation
            # (mirrors the bf16 scan's backward); elementwise stays f32
            x0 = x0A_ref[i].astype(F32)
            h1 = h1A_ref[i].astype(F32)
            h2 = h2A_ref[i].astype(F32)
            x1 = x0 + h1
            x2 = x1 + h2
            if af:
                F_pad = wmT_ref.shape[0]
                dmel_f = dmel_ref[i].astype(F32) + jnp.concatenate(
                    [jnp.zeros((B, (r - 1) * n_mels), F32),
                     Dprev_st[:, :n_mels],
                     jnp.zeros((B, F_pad - r * n_mels), F32)], axis=1)
                dmeld = dmel_f.astype(dt)
            else:
                dmeld = dmel_ref[i]
            dwm_ref[:] = dwm_ref[:] + _dot_ss(x2.astype(dt), dmeld)
            dx2 = _dot(dmeld, wmT_ref[:])

            dh2tot = dx2 + Dh2_st[:]
            zm2 = zm2_ref[i].astype(F32)
            dh2t = dh2tot * (1.0 - zm2)
            g2 = g2A_ref[i].astype(F32)
            i2, f2 = g2[:, :L], g2[:, L:2 * L]
            gg2, o2 = g2[:, 2 * L:3 * L], g2[:, 3 * L:]
            tc2 = jnp.tanh(c2A_ref[i].astype(F32))
            dc2tot = dh2t * o2 * (1.0 - tc2 * tc2) + Dc2_st[:]
            c2p = prev(i, c2A_ref, c2B_ref)
            dg2 = jnp.concatenate(
                [dc2tot * gg2 * i2 * (1.0 - i2),
                 dc2tot * c2p * f2 * (1.0 - f2),
                 dc2tot * i2 * (1.0 - gg2 * gg2),
                 dh2t * tc2 * o2 * (1.0 - o2)], axis=-1)
            Dc2_st[:] = dc2tot * f2
            h2p = prev(i, h2A_ref, h2B_ref)
            dg2d = dg2.astype(dt)
            dl2wi_ref[:] = dl2wi_ref[:] + _dot_ss(x1.astype(dt), dg2d)
            dl2wh_ref[:] = dl2wh_ref[:] + _dot_ss(h2p.astype(dt), dg2d)
            dl2b_ref[:] = dl2b_ref[:] + dg2
            dx1 = dx2 + _dot(dg2d, l2wiT_ref[:])
            Dh2_st[:] = dh2tot * zm2 + _dot(dg2d, l2whT_ref[:])

            # ---- LSTM1 backward ----
            dh1tot = dx1 + Dh1_st[:]
            zm1 = zm1_ref[i].astype(F32)
            dh1t = dh1tot * (1.0 - zm1)
            g1 = g1A_ref[i].astype(F32)
            i1, f1 = g1[:, :L], g1[:, L:2 * L]
            gg1, o1 = g1[:, 2 * L:3 * L], g1[:, 3 * L:]
            tc1 = jnp.tanh(c1A_ref[i].astype(F32))
            dc1tot = dh1t * o1 * (1.0 - tc1 * tc1) + Dc1_st[:]
            c1p = prev(i, c1A_ref, c1B_ref)
            dg1 = jnp.concatenate(
                [dc1tot * gg1 * i1 * (1.0 - i1),
                 dc1tot * c1p * f1 * (1.0 - f1),
                 dc1tot * i1 * (1.0 - gg1 * gg1),
                 dh1t * tc1 * o1 * (1.0 - o1)], axis=-1)
            Dc1_st[:] = dc1tot * f1
            h1p = prev(i, h1A_ref, h1B_ref)
            dg1d = dg1.astype(dt)
            dl1wi_ref[:] = dl1wi_ref[:] + _dot_ss(x0.astype(dt), dg1d)
            dl1wh_ref[:] = dl1wh_ref[:] + _dot_ss(h1p.astype(dt), dg1d)
            dl1b_ref[:] = dl1b_ref[:] + dg1
            dx0 = dx1 + _dot(dg1d, l1wiT_ref[:])
            Dh1_st[:] = dh1tot * zm1 + _dot(dg1d, l1whT_ref[:])

            # ---- rnn_input backward ----
            dbr_ref[:] = dbr_ref[:] + dx0
            ahd = ahA_ref[i]
            ah = ahd.astype(F32)
            catd = jnp.concatenate([ctxA_ref[i], ahd], axis=1)
            dx0d = dx0.astype(dt)
            dwr_ref[:] = dwr_ref[:] + _dot_ss(catd, dx0d)
            dcat = _dot(dx0d, wrT_ref[:])
            dctx_tot = dcat[:, :E] + Dctx_st[:]
            dah_tot = dcat[:, E:] + Dah_st[:]

            # ---- attention backward (recompute fwd internals) ----
            ca0 = cum_ref[i]                       # (1,S) pre-update cum
            attp = prev(i, scA_ref, scB_ref)       # att state = prev scores
            ca = jnp.concatenate([ca0, attp, jnp.zeros((6, S), F32)], axis=0)
            for k in range(CONV_K):
                sh = pltpu.roll(ca, (CONV_HALF - k) % S, axis=1)
                stack_st[k, :] = sh[0, :].astype(dt)
                stack_st[CONV_K + k, :] = sh[1, :].astype(dt)
            q = _dot(ahd, wq_ref[:]) + qb_ref[:]
            qpl = _dot(jnp.swapaxes(q, 0, 1), eb_ref[:])
            locLT = _dot(W01_ref[:], stack_st[:])
            argT = jnp.tanh(locLT + encpT_ref[:].astype(F32) + qpl)
            u8 = _dot(v8_ref[:], argT.astype(dt))
            sigraw = _sig(u8)
            sigm = sigraw * mask_ref[:]
            sums = _dot_tt(sigm, eb_ref[:])
            div = _dot(sums, eb_ref[:])
            div = jnp.where(div > 0.0, div, 1.0)
            scores = scA_ref[i].astype(F32)        # (1,S) saved (quantized)

            # context-contraction cotangents: in TF the weights are the
            # scores; in AF they are the streamed attn_ref row, so the
            # contraction grad goes to daref instead of dscores
            wrow = aref_ref[i].astype(F32) if af else scores
            dSC = _dot(dctx_tot.astype(dt), encST_ref[:])       # (B, S)
            drow = jnp.sum(dSC * eb_ref[:], axis=0, keepdims=True)
            bcast = _dot(ebT_ref[:], dctx_tot)                  # (S, E)
            scol = jnp.swapaxes(jnp.broadcast_to(wrow, (8, S)), 0, 1)
            dencS_ref[:] = dencS_ref[:] + scol[:, 0:1] * bcast

            if af:
                daref_ref[i] = drow
                dsc_tot = (dsc_ref[i]
                           + Dca_st[0:1, :] + Dca_st[1:2, :])
            else:
                dsc_tot = (dsc_ref[i] + drow
                           + Dca_st[0:1, :] + Dca_st[1:2, :])
            # smooth-normalization backward (per-utterance sums via eb)
            per_b = _dot_tt(dsc_tot * scores, eb_ref[:])        # (1, B)
            dotpl = _dot(per_b, eb_ref[:])                      # (1, S)
            dsig = (dsc_tot - dotpl) / div[0:1, :]
            du = (dsig * sigraw[0:1, :] * (1.0 - sigraw[0:1, :])
                  * mask_ref[0:1, :])
            du8 = jnp.concatenate([du, jnp.zeros((7, S), F32)], axis=0)
            dv_ref[:] = dv_ref[:] + _dot_tt(argT, du8)          # (D, 8)
            dargT = _dot_ss(v8_ref[:].astype(F32), du8)         # (D, S)
            dargT = dargT * (1.0 - argT * argT)
            dencpT_ref[:] = dencpT_ref[:] + dargT
            dqT = _dot_tt(dargT, eb_ref[:])                     # (D, B)
            dah_tot = dah_tot + jnp.swapaxes(
                _dot(wq_ref[:].astype(F32), dqT), 0, 1)
            dwqT_ref[:] = dwqT_ref[:] + _dot(dqT, ah)
            dqb_ref[:] = dqb_ref[:] + dqT
            dargTd = dargT.astype(dt)
            dW01_ref[:] = dW01_ref[:] + _dot_tt(dargTd, stack_st[:])
            dstackT = _dot(W01T_ref[:], dargTd)                 # (64, S)
            # transposed location conv -> cumulative/attention cotangents
            dca_cum = Dca_st[0:1, :]               # dA_g passes to dA_{g-1}
            dca_att = jnp.zeros((1, S), F32)
            for k in range(CONV_K):
                sh = (k - CONV_HALF) % S
                dca_cum = dca_cum + pltpu.roll(
                    dstackT[k:k + 1, :], sh, axis=1)
                dca_att = dca_att + pltpu.roll(
                    dstackT[CONV_K + k:CONV_K + k + 1, :], sh, axis=1)
            Dca_st[0:1, :] = dca_cum
            Dca_st[1:2, :] = dca_att

            # ---- attention-GRU backward ----
            sv = svA_ref[i].astype(F32)
            gr, gz = sv[:, :D], sv[:, D:2 * D]
            gn, ghn = sv[:, 2 * D:3 * D], sv[:, 3 * D:]
            ahp = prev(i, ahA_ref, ahB_ref)
            dn = dah_tot * (1.0 - gz)
            dz = dah_tot * (ahp - gn)
            dpre_n = dn * (1.0 - gn * gn)
            dhn = dpre_n * gr
            dpre_r = (dpre_n * ghn) * gr * (1.0 - gr)
            dpre_z = dz * gz * (1.0 - gz)
            dgh = jnp.concatenate([dpre_r, dpre_z, dhn], axis=-1)
            dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
            dghd = dgh.astype(dt)
            dgid = dgi.astype(dt)
            Dah_st[:] = dah_tot * gz + _dot(dghd, awhT_ref[:])
            dawh_ref[:] = dawh_ref[:] + _dot_ss(ahp.astype(dt), dghd)
            dabh_ref[:] = dabh_ref[:] + dgh
            ctxp = prev(i, ctxA_ref, ctxB_ref)
            if af:
                # recompute the prenet ONCE from the saved prev stream:
                # its output feeds the GRU-input gradient AND its
                # intermediates feed the prenet backward below
                dm1f = dm1_ref[i].astype(F32)
                dm2f = dm2_ref[i].astype(F32)
                prevv = prevsA_ref[i]                          # (B, 128) dt
                p1 = jnp.maximum(_dot(prevv, w1p_ref[:]) + b1_ref[:], 0.0)
                p1d = (p1 * dm1f).astype(dt)
                p2pre = _dot(p1d, w2p_ref[:]) + b2_ref[:]
                pre_i = (jnp.maximum(p2pre, 0.0) * dm2f).astype(dt)
            else:
                pre_i = pre_ref[i]
            inpd = jnp.concatenate([ctxp.astype(dt), pre_i], axis=1)
            dawi_ref[:] = dawi_ref[:] + _dot_ss(inpd, dgid)
            dabi_ref[:] = dabi_ref[:] + dgi
            dinp = _dot(dgid, awiT_ref[:])
            Dctx_st[:] = dinp[:, :E]
            if af:
                # in-kernel prenet backward (dropout masks are pre-scaled
                # keep/(1-rate); p1/p1d/p2pre recomputed above)
                dp2pre = (dinp[:, E:] * dm2f
                          * (p2pre > 0.0).astype(F32))
                dp2pred = dp2pre.astype(dt)
                dw2p_ref[:] = dw2p_ref[:] + _dot_ss(p1d, dp2pred)
                db2_ref[:] = db2_ref[:] + dp2pre
                dp1pre = (_dot(dp2pred, w2pT_ref[:]) * dm1f
                          * (p1 > 0.0).astype(F32))
                dp1pred = dp1pre.astype(dt)
                dw1p_ref[:] = dw1p_ref[:] + _dot_ss(prevv, dp1pred)
                db1_ref[:] = db1_ref[:] + dp1pre
                Dprev_st[:] = _dot(dp1pred, w1pT_ref[:])
            else:
                dpre_ref[i] = dinp[:, E:].astype(dt)
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    return kernel


# ==========================================================================
# custom-VJP op
# ==========================================================================

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(static, pre, zm1, zm2, encS, encpT, mask8, eb,
          awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
          l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm):
    """Flat TF-decoder recurrence op: returns (mel (G, B, F_pad) in the
    compute dtype, scores (G, S) f32).  See module docstring; the packing
    of model params into these operands lives in `decoder_tf_train`."""
    (mel, sc), _ = _fwd_impl(static, pre, zm1, zm2, encS, encpT, mask8, eb,
                             awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
                             l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm)
    return mel, sc


def _core_fwd(static, pre, zm1, zm2, encS, encpT, mask8, eb,
              awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
              l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm):
    (mel, sc), saved = _fwd_impl(
        static, pre, zm1, zm2, encS, encpT, mask8, eb, awi, abi, awh, abh,
        wq, qb, W01, v8, wr, br, l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm)
    res = (saved, sc, pre, zm1, zm2, encS, encpT, mask8, eb, awi, awh, wq,
           qb, W01, v8, wr, l1wi, l1wh, l2wi, l2wh, wm)
    return (mel, sc), res


def _core_bwd(static, res, cts):
    (saved, sc, pre, zm1, zm2, encS, encpT, mask8, eb, awi, awh, wq, qb,
     W01, v8, wr, l1wi, l1wh, l2wi, l2wh, wm) = res
    dmel, dsc = cts
    chunk, interpret = static
    G, B, P2 = pre.shape
    S, E = encS.shape
    D = wq.shape[0]
    L = wr.shape[1]
    F_pad = wm.shape[1]
    dt = pre.dtype
    C = _pick_chunk(G, chunk)
    G_pad = _round_up(G, C)
    if G_pad != G:
        pad3 = ((0, G_pad - G), (0, 0), (0, 0))
        pad2 = ((0, G_pad - G), (0, 0))
        pre_p = jnp.pad(pre, pad3)
        zm1_p = jnp.pad(zm1, pad3)
        zm2_p = jnp.pad(zm2, pad3)
        dmel_p = jnp.pad(dmel.astype(dt), pad3)
        dsc_p = jnp.pad(dsc.astype(F32), pad2)
        sc_p = jnp.pad(sc, pad2)
    else:
        pre_p, zm1_p, zm2_p = pre, zm1, zm2
        dmel_p, dsc_p, sc_p = dmel.astype(dt), dsc.astype(F32), sc
    (cum, ah, sv, ctx, x0, g1, c1, h1, g2, c2, h2) = saved  # already padded
    n_grid = G_pad // C

    def rspec(*dims):
        nd = len(dims)
        return pl.BlockSpec((C,) + dims,
                            lambda t: (n_grid - 1 - t,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def bspec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            (C,) + dims,
            lambda t: (jnp.maximum(n_grid - 2 - t, 0),) + (0,) * nd,
            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    f32w = lambda a: a.astype(F32)
    encST = jnp.swapaxes(encS, 0, 1)
    ebT = jnp.swapaxes(eb, 0, 1)
    awiT = jnp.swapaxes(awi, 0, 1)
    awhT = jnp.swapaxes(awh, 0, 1)
    W01T = jnp.swapaxes(W01, 0, 1)
    wrT = jnp.swapaxes(wr, 0, 1)
    l1wiT = jnp.swapaxes(l1wi, 0, 1)
    l1whT = jnp.swapaxes(l1wh, 0, 1)
    l2wiT = jnp.swapaxes(l2wi, 0, 1)
    l2whT = jnp.swapaxes(l2wh, 0, 1)
    wmT = jnp.swapaxes(wm, 0, 1)

    stream_ins = [
        (pre_p, rspec(B, P2)), (zm1_p, rspec(B, L)), (zm2_p, rspec(B, L)),
        (dmel_p, rspec(B, F_pad)), (dsc_p[:, None, :], rspec(1, S)),
        (sc_p[:, None, :], rspec(1, S)),
        (sc_p[:, None, :], bspec(1, S)), (cum, rspec(1, S)),
        (ah, rspec(B, D)), (ah, bspec(B, D)), (sv, rspec(B, 4 * D)),
        (ctx, rspec(B, E)), (ctx, bspec(B, E)), (x0, rspec(B, L)),
        (g1, rspec(B, 4 * L)), (c1, rspec(B, L)), (c1, bspec(B, L)),
        (h1, rspec(B, L)), (h1, bspec(B, L)),
        (g2, rspec(B, 4 * L)), (c2, rspec(B, L)), (c2, bspec(B, L)),
        (h2, rspec(B, L)), (h2, bspec(B, L)),
    ]
    consts = [encST, encpT, mask8, eb, ebT, awiT, awhT, wq, qb, W01, W01T,
              v8, wrT, l1wiT, l1whT, l2wiT, l2whT, wmT]

    acc_shapes = [
        (E + P2, 3 * D), (B, 3 * D), (D, 3 * D), (B, 3 * D),   # attn GRU
        (D, D), (D, B), (D, 64), (D, 8),                       # wq/qb/W01/v
        (E + D, L), (B, L),                                    # rnn_input
        (L, 4 * L), (L, 4 * L), (B, 4 * L),                    # LSTM1
        (L, 4 * L), (L, 4 * L), (B, 4 * L),                    # LSTM2
        (L, F_pad), (S, E), (D, S),                            # wm/enc/encp
    ]
    outs = pl.pallas_call(
        _make_bwd_kernel(C, B, D, L, E, S, n_grid, dt),
        grid=(n_grid,),
        in_specs=[spec for _, spec in stream_ins]
        + [cspec(np.shape(c)) for c in consts],
        out_specs=(rspec(B, P2),)
        + tuple(cspec(s) for s in acc_shapes),
        out_shape=(jax.ShapeDtypeStruct((G_pad, B, P2), dt),)
        + tuple(jax.ShapeDtypeStruct(s, F32) for s in acc_shapes),
        scratch_shapes=[
            pltpu.VMEM((B, D), F32), pltpu.VMEM((B, E), F32),
            pltpu.VMEM((B, L), F32), pltpu.VMEM((B, L), F32),
            pltpu.VMEM((B, L), F32), pltpu.VMEM((B, L), F32),
            pltpu.VMEM((8, S), F32),
            pltpu.VMEM((64, S), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*[a for a, _ in stream_ins], *consts)

    (dpre, dawi, dabi, dawh, dabh, dwqT, dqb, dW01, dv, dwr, dbr,
     dl1wi, dl1wh, dl1b, dl2wi, dl2wh, dl2b, dwm, dencS, dencpT) = outs

    wdt = lambda g, ref: g.astype(ref.dtype)
    z = jnp.zeros_like
    # biases entered the op pre-cast to f32 (wrapper [None].astype(F32)),
    # so their cotangents stay f32; weight cotangents match weight dtype
    return (
        dpre[:G],                                  # pre
        z(zm1), z(zm2),                            # zoneout masks
        wdt(dencS, encS), wdt(dencpT, encpT),      # encoder planes
        z(mask8), z(eb),
        wdt(dawi, awi), jnp.sum(dabi, 0, keepdims=True),
        wdt(dawh, awh), jnp.sum(dabh, 0, keepdims=True),
        wdt(jnp.swapaxes(dwqT, 0, 1), wq),
        jnp.sum(dqb, 1)[None],
        wdt(dW01, W01), wdt(jnp.swapaxes(dv, 0, 1), v8),
        wdt(dwr, wr), jnp.sum(dbr, 0, keepdims=True),
        wdt(dl1wi, l1wi), wdt(dl1wh, l1wh),
        jnp.sum(dl1b, 0, keepdims=True),
        wdt(dl2wi, l2wi), wdt(dl2wh, l2wh),
        jnp.sum(dl2b, 0, keepdims=True),
        wdt(dwm, wm),
    )


_core.defvjp(_core_fwd, _core_bwd)


# --------------------------------------------------------------------------
# attention-forcing variant (context from attn_ref; in-kernel prenet)
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core_af(static, aref, dm1, dm2, zm1, zm2, encS, encpT, mask8, eb,
             w1p, b1, w2p, b2,
             awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
             l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm):
    """Flat ATTENTION-FORCING decoder recurrence op (reference
    tacotron.py attention-forcing arm): context weights come from the
    aref stream, the prenet runs in-kernel on the carried prev_frame with
    streamed pre-scaled dropout masks.  static=(chunk, interpret, n_mels,
    r).  Returns (mel (G, B, F_pad), scores (G, S) f32)."""
    chunk, interpret, n_mels, r = static
    (mel, sc), _ = _fwd_impl(
        (chunk, interpret), None, zm1, zm2, encS, encpT, mask8, eb,
        awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
        l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm,
        af_pack=(aref, dm1, dm2, w1p, b1, w2p, b2, n_mels, r))
    return mel, sc


def _core_af_fwd(static, aref, dm1, dm2, zm1, zm2, encS, encpT, mask8, eb,
                 w1p, b1, w2p, b2,
                 awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
                 l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm):
    chunk, interpret, n_mels, r = static
    (mel, sc), saved = _fwd_impl(
        (chunk, interpret), None, zm1, zm2, encS, encpT, mask8, eb,
        awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
        l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm,
        af_pack=(aref, dm1, dm2, w1p, b1, w2p, b2, n_mels, r))
    res = (saved, sc, aref, dm1, dm2, zm1, zm2, encS, encpT, mask8, eb,
           w1p, b1, w2p, b2, awi, awh, wq, qb, W01, v8, wr,
           l1wi, l1wh, l2wi, l2wh, wm)
    return (mel, sc), res


def _core_af_bwd(static, res, cts):
    (saved, sc, aref, dm1, dm2, zm1, zm2, encS, encpT, mask8, eb,
     w1p, b1, w2p, b2, awi, awh, wq, qb, W01, v8, wr,
     l1wi, l1wh, l2wi, l2wh, wm) = res
    dmel, dsc = cts
    chunk, interpret, n_mels, r = static
    G, B, P1 = dm1.shape
    P2 = dm2.shape[-1]
    S, E = encS.shape
    D = wq.shape[0]
    L = wr.shape[1]
    F_pad = wm.shape[1]
    dt = dm1.dtype
    C = _pick_chunk(G, chunk)
    G_pad = _round_up(G, C)
    if G_pad != G:
        pad3 = ((0, G_pad - G), (0, 0), (0, 0))
        pad2 = ((0, G_pad - G), (0, 0))
        aref_p = jnp.pad(aref, pad2)
        dm1_p, dm2_p = jnp.pad(dm1, pad3), jnp.pad(dm2, pad3)
        zm1_p, zm2_p = jnp.pad(zm1, pad3), jnp.pad(zm2, pad3)
        dmel_p = jnp.pad(dmel.astype(dt), pad3)
        dsc_p = jnp.pad(dsc.astype(F32), pad2)
        sc_p = jnp.pad(sc, pad2)
    else:
        aref_p, dm1_p, dm2_p, zm1_p, zm2_p = aref, dm1, dm2, zm1, zm2
        dmel_p, dsc_p, sc_p = dmel.astype(dt), dsc.astype(F32), sc
    (cum, ah, sv, ctx, x0, g1, c1, h1, g2, c2, h2, prevs) = saved
    n_grid = G_pad // C

    def rspec(*dims):
        nd = len(dims)
        return pl.BlockSpec((C,) + dims,
                            lambda t: (n_grid - 1 - t,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def bspec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            (C,) + dims,
            lambda t: (jnp.maximum(n_grid - 2 - t, 0),) + (0,) * nd,
            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    encST = jnp.swapaxes(encS, 0, 1)
    ebT = jnp.swapaxes(eb, 0, 1)
    w1pT = jnp.swapaxes(w1p, 0, 1)
    w2pT = jnp.swapaxes(w2p, 0, 1)
    awiT = jnp.swapaxes(awi, 0, 1)
    awhT = jnp.swapaxes(awh, 0, 1)
    W01T = jnp.swapaxes(W01, 0, 1)
    wrT = jnp.swapaxes(wr, 0, 1)
    l1wiT = jnp.swapaxes(l1wi, 0, 1)
    l1whT = jnp.swapaxes(l1wh, 0, 1)
    l2wiT = jnp.swapaxes(l2wi, 0, 1)
    l2whT = jnp.swapaxes(l2wh, 0, 1)
    wmT = jnp.swapaxes(wm, 0, 1)

    stream_ins = [
        (aref_p[:, None, :], rspec(1, S)),
        (dm1_p, rspec(B, P1)), (dm2_p, rspec(B, P2)),
        (zm1_p, rspec(B, L)), (zm2_p, rspec(B, L)),
        (dmel_p, rspec(B, F_pad)), (dsc_p[:, None, :], rspec(1, S)),
        (sc_p[:, None, :], rspec(1, S)),
        (sc_p[:, None, :], bspec(1, S)), (cum, rspec(1, S)),
        (ah, rspec(B, D)), (ah, bspec(B, D)), (sv, rspec(B, 4 * D)),
        (ctx, rspec(B, E)), (ctx, bspec(B, E)), (x0, rspec(B, L)),
        (g1, rspec(B, 4 * L)), (c1, rspec(B, L)), (c1, bspec(B, L)),
        (h1, rspec(B, L)), (h1, bspec(B, L)),
        (g2, rspec(B, 4 * L)), (c2, rspec(B, L)), (c2, bspec(B, L)),
        (h2, rspec(B, L)), (h2, bspec(B, L)),
        (prevs, rspec(B, 128)),
    ]
    consts = [encST, encpT, mask8, eb, ebT, w1p, b1, w2p, b2, w1pT, w2pT,
              awiT, awhT, wq, qb, W01, W01T,
              v8, wrT, l1wiT, l1whT, l2wiT, l2whT, wmT]

    pre_acc_shapes = [(128, P1), (B, P1), (P1, P2), (B, P2)]
    acc_shapes = [
        (E + P2, 3 * D), (B, 3 * D), (D, 3 * D), (B, 3 * D),   # attn GRU
        (D, D), (D, B), (D, 64), (D, 8),                       # wq/qb/W01/v
        (E + D, L), (B, L),                                    # rnn_input
        (L, 4 * L), (L, 4 * L), (B, 4 * L),                    # LSTM1
        (L, 4 * L), (L, 4 * L), (B, 4 * L),                    # LSTM2
        (L, F_pad), (S, E), (D, S),                            # wm/enc/encp
    ]
    outs = pl.pallas_call(
        _make_bwd_kernel(C, B, D, L, E, S, n_grid, dt, af=True,
                         n_mels=n_mels, r=r),
        grid=(n_grid,),
        in_specs=[spec for _, spec in stream_ins]
        + [cspec(np.shape(c)) for c in consts],
        out_specs=(rspec(1, S),)
        + tuple(cspec(sh) for sh in pre_acc_shapes + acc_shapes),
        out_shape=(jax.ShapeDtypeStruct((G_pad, 1, S), F32),)
        + tuple(jax.ShapeDtypeStruct(sh, F32)
                for sh in pre_acc_shapes + acc_shapes),
        scratch_shapes=[
            pltpu.VMEM((B, D), F32), pltpu.VMEM((B, E), F32),
            pltpu.VMEM((B, L), F32), pltpu.VMEM((B, L), F32),
            pltpu.VMEM((B, L), F32), pltpu.VMEM((B, L), F32),
            pltpu.VMEM((8, S), F32),
            pltpu.VMEM((64, S), dt),
            pltpu.VMEM((B, 128), F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*[a for a, _ in stream_ins], *consts)

    (daref, dw1p, db1, dw2p, db2,
     dawi, dabi, dawh, dabh, dwqT, dqb, dW01, dv, dwr, dbr,
     dl1wi, dl1wh, dl1b, dl2wi, dl2wh, dl2b, dwm, dencS, dencpT) = outs

    wdt = lambda g, ref: g.astype(ref.dtype)
    z = jnp.zeros_like
    return (
        wdt(daref[:G, 0], aref),
        z(dm1), z(dm2), z(zm1), z(zm2),
        wdt(dencS, encS), wdt(dencpT, encpT),
        z(mask8), z(eb),
        wdt(dw1p, w1p), jnp.sum(db1, 0, keepdims=True),
        wdt(dw2p, w2p), jnp.sum(db2, 0, keepdims=True),
        wdt(dawi, awi), jnp.sum(dabi, 0, keepdims=True),
        wdt(dawh, awh), jnp.sum(dabh, 0, keepdims=True),
        wdt(jnp.swapaxes(dwqT, 0, 1), wq),
        jnp.sum(dqb, 1)[None],
        wdt(dW01, W01), wdt(jnp.swapaxes(dv, 0, 1), v8),
        wdt(dwr, wr), jnp.sum(dbr, 0, keepdims=True),
        wdt(dl1wi, l1wi), wdt(dl1wh, l1wh),
        jnp.sum(dl1b, 0, keepdims=True),
        wdt(dl2wi, l2wi), wdt(dl2wh, l2wh),
        jnp.sum(dl2b, 0, keepdims=True),
        wdt(dwm, wm),
    )


_core_af.defvjp(_core_af_fwd, _core_af_bwd)


# ==========================================================================
# pure-JAX twin (same flat operands) — parity oracle for both directions
# ==========================================================================

def core_ref(static, pre, zm1, zm2, encS, encpT, mask8, eb,
             awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
             l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm):
    """lax.scan twin of `_core` with identical math and rounding points,
    differentiable by plain autodiff (the grad-parity oracle)."""
    G, B, P2 = pre.shape
    S, E = encS.shape
    D = wq.shape[0]
    L = wr.shape[1]
    dt = pre.dtype
    mask = mask8[0:1].astype(F32)
    f = lambda a: a.astype(F32)
    encSf = f(encS)
    encpTf = f(encpT)
    ebf = f(eb)

    def step(carry, xs):
        ah, ctx, h1, c1, h2, c2, cum, att = carry
        pre_t, z1, z2 = xs
        inp = jnp.concatenate([f(ctx), f(pre_t)], axis=1)
        gi = _dot(inp, f(awi)) + f(abi)
        gh = _dot(f(ah), f(awh)) + f(abh)
        r = jax.nn.sigmoid(gi[:, :D] + gh[:, :D])
        z = jax.nn.sigmoid(gi[:, D:2 * D] + gh[:, D:2 * D])
        n = jnp.tanh(gi[:, 2 * D:] + r * gh[:, 2 * D:])
        ah = ((1.0 - z) * n + z * f(ah)).astype(dt)

        q = _dot(f(ah), f(wq)) + f(qb)
        rolls = ([jnp.roll(cum, CONV_HALF - k) for k in range(CONV_K)]
                 + [jnp.roll(att, CONV_HALF - k) for k in range(CONV_K)]
                 + [jnp.zeros((S,), F32), jnp.zeros((S,), F32)])
        stackT = jnp.stack(rolls)                         # (64, S)
        locLT = _dot(f(W01), stackT)
        argT = jnp.tanh(locLT + encpTf + _dot(jnp.swapaxes(q, 0, 1), ebf))
        u = _dot(f(v8), argT)[0:1]                        # (1, S)
        sigm = jax.nn.sigmoid(u) * mask
        sums = _dot_tt(sigm, ebf)
        div = _dot(sums, ebf)
        div = jnp.where(div > 0.0, div, 1.0)
        scores = (sigm / div).astype(dt).astype(F32)      # (1, S)
        SC = ebf * scores
        ctx = _dot(SC, encSf).astype(dt)
        cum = cum + scores[0]
        att = scores[0]

        cat = jnp.concatenate([f(ctx), f(ah)], axis=1)
        x0 = (_dot(cat, f(wr)) + f(br)).astype(dt)
        g1 = (_dot(f(x0), f(l1wi)) + _dot(f(h1), f(l1wh)) + f(l1b))
        i1 = jax.nn.sigmoid(g1[:, :L])
        f1 = jax.nn.sigmoid(g1[:, L:2 * L])
        gg1 = jnp.tanh(g1[:, 2 * L:3 * L])
        o1 = jax.nn.sigmoid(g1[:, 3 * L:])
        c1 = (f1 * f(c1) + i1 * gg1).astype(dt)
        h1t = o1 * jnp.tanh(f(c1))
        h1 = (f(z1) * f(h1) + (1.0 - f(z1)) * h1t).astype(dt)
        x1 = (f(x0) + f(h1)).astype(dt)
        g2 = (_dot(f(x1), f(l2wi)) + _dot(f(h2), f(l2wh)) + f(l2b))
        i2 = jax.nn.sigmoid(g2[:, :L])
        f2 = jax.nn.sigmoid(g2[:, L:2 * L])
        gg2 = jnp.tanh(g2[:, 2 * L:3 * L])
        o2 = jax.nn.sigmoid(g2[:, 3 * L:])
        c2 = (f2 * f(c2) + i2 * gg2).astype(dt)
        h2t = o2 * jnp.tanh(f(c2))
        h2 = (f(z2) * f(h2) + (1.0 - f(z2)) * h2t).astype(dt)
        x2 = (f(x1) + f(h2)).astype(dt)
        mel = _dot(f(x2), f(wm)).astype(dt)
        return (ah, ctx, h1, c1, h2, c2, cum, att), (mel, scores[0])

    z2 = lambda *s: jnp.zeros(s, dt)
    carry0 = (z2(B, D), z2(B, E), z2(B, L), z2(B, L), z2(B, L), z2(B, L),
              jnp.zeros((S,), F32), jnp.zeros((S,), F32))
    _, (mel, sc) = jax.lax.scan(step, carry0, (pre, zm1, zm2))
    return mel, sc


def core_af_ref(static, aref, dm1, dm2, zm1, zm2, encS, encpT, mask8, eb,
                w1p, b1, w2p, b2,
                awi, abi, awh, abh, wq, qb, W01, v8, wr, br,
                l1wi, l1wh, l1b, l2wi, l2wh, l2b, wm):
    """lax.scan twin of `_core_af` — identical math and rounding points,
    differentiable by plain autodiff (the AF grad-parity oracle)."""
    chunk, interpret, n_mels, r = static
    G, B, P1 = dm1.shape
    S, E = encS.shape
    D = wq.shape[0]
    L = wr.shape[1]
    dt = dm1.dtype
    mask = mask8[0:1].astype(F32)
    f = lambda a: a.astype(F32)
    encSf = f(encS)
    encpTf = f(encpT)
    ebf = f(eb)

    def step(carry, xs):
        ah, ctx, h1, c1, h2, c2, cum, att, prev = carry
        ar_t, d1, d2, z1, z2 = xs
        p1 = jnp.maximum(_dot(prev, f(w1p)) + f(b1), 0.0)
        p1d = (p1 * f(d1)).astype(dt)
        p2 = jnp.maximum(_dot(p1d, f(w2p)) + f(b2), 0.0)
        pre_t = (p2 * f(d2)).astype(dt)
        inp = jnp.concatenate([f(ctx), f(pre_t)], axis=1)
        gi = _dot(inp, f(awi)) + f(abi)
        gh = _dot(f(ah), f(awh)) + f(abh)
        rg = jax.nn.sigmoid(gi[:, :D] + gh[:, :D])
        z = jax.nn.sigmoid(gi[:, D:2 * D] + gh[:, D:2 * D])
        n = jnp.tanh(gi[:, 2 * D:] + rg * gh[:, 2 * D:])
        ah = ((1.0 - z) * n + z * f(ah)).astype(dt)

        q = _dot(f(ah), f(wq)) + f(qb)
        rolls = ([jnp.roll(cum, CONV_HALF - k) for k in range(CONV_K)]
                 + [jnp.roll(att, CONV_HALF - k) for k in range(CONV_K)]
                 + [jnp.zeros((S,), F32), jnp.zeros((S,), F32)])
        stackT = jnp.stack(rolls)                         # (64, S)
        locLT = _dot(f(W01), stackT)
        argT = jnp.tanh(locLT + encpTf + _dot(jnp.swapaxes(q, 0, 1), ebf))
        u = _dot(f(v8), argT)[0:1]                        # (1, S)
        sigm = jax.nn.sigmoid(u) * mask
        sums = _dot_tt(sigm, ebf)
        div = _dot(sums, ebf)
        div = jnp.where(div > 0.0, div, 1.0)
        scores = (sigm / div).astype(dt).astype(F32)      # (1, S)
        SC = ebf * f(ar_t)[None]                          # context: attn_ref
        ctx = _dot(SC, encSf).astype(dt)
        cum = cum + scores[0]
        att = scores[0]

        cat = jnp.concatenate([f(ctx), f(ah)], axis=1)
        x0 = (_dot(cat, f(wr)) + f(br)).astype(dt)
        g1 = (_dot(f(x0), f(l1wi)) + _dot(f(h1), f(l1wh)) + f(l1b))
        i1 = jax.nn.sigmoid(g1[:, :L])
        f1 = jax.nn.sigmoid(g1[:, L:2 * L])
        gg1 = jnp.tanh(g1[:, 2 * L:3 * L])
        o1 = jax.nn.sigmoid(g1[:, 3 * L:])
        c1 = (f1 * f(c1) + i1 * gg1).astype(dt)
        h1t = o1 * jnp.tanh(f(c1))
        h1 = (f(z1) * f(h1) + (1.0 - f(z1)) * h1t).astype(dt)
        x1 = (f(x0) + f(h1)).astype(dt)
        g2 = (_dot(f(x1), f(l2wi)) + _dot(f(h2), f(l2wh)) + f(l2b))
        i2 = jax.nn.sigmoid(g2[:, :L])
        f2 = jax.nn.sigmoid(g2[:, L:2 * L])
        gg2 = jnp.tanh(g2[:, 2 * L:3 * L])
        o2 = jax.nn.sigmoid(g2[:, 3 * L:])
        c2 = (f2 * f(c2) + i2 * gg2).astype(dt)
        h2t = o2 * jnp.tanh(f(c2))
        h2 = (f(z2) * f(h2) + (1.0 - f(z2)) * h2t).astype(dt)
        x2 = (f(x1) + f(h2)).astype(dt)
        mel = _dot(f(x2), f(wm)).astype(dt)
        prev = jnp.concatenate(
            [mel[:, (r - 1) * n_mels:r * n_mels],
             jnp.zeros((B, 128 - n_mels), dt)], axis=1)
        return (ah, ctx, h1, c1, h2, c2, cum, att, prev), (mel, scores[0])

    z2_ = lambda *sh: jnp.zeros(sh, dt)
    carry0 = (z2_(B, D), z2_(B, E), z2_(B, L), z2_(B, L), z2_(B, L),
              z2_(B, L), jnp.zeros((S,), F32), jnp.zeros((S,), F32),
              z2_(B, 128))
    _, (mel, sc) = jax.lax.scan(step, carry0, (aref, dm1, dm2, zm1, zm2))
    return mel, sc


# ==========================================================================
# model-facing wrapper
# ==========================================================================

def zoneout_masks(k_dec, n_groups: int, B: int, L: int, rate: float = 0.1):
    """Per-step zoneout keep-prev masks with the EXACT key stream of the
    XLA scan path (models/tacotron.forward TF branch: step_keys =
    split(k_dec, n_groups); decoder_step splits each into
    (k_pre, k_z1, k_z2); zoneout draws bernoulli(k_z, 0.1, (B, L)))."""
    keys = jax.random.split(k_dec, n_groups)

    def draw(k):
        _, kz1, kz2 = jax.random.split(k, 3)
        return (jax.random.bernoulli(kz1, rate, (B, L)),
                jax.random.bernoulli(kz2, rate, (B, L)))

    zm1, zm2 = jax.vmap(draw)(keys)
    return zm1, zm2


def decoder_tf_train(dec, encoder_seq, encoder_seq_proj, pre_all, zm1, zm2,
                     max_r: int, r: int, n_mels: int,
                     impl: str = "pallas", chunk: int = 8):
    """Run the teacher-forcing decoder recurrence on the training kernels.

    dec: params["decoder"] subtree (already compute-dtype cast).
    encoder_seq (B, T_text, E); encoder_seq_proj (B, T_text, D);
    pre_all (G, B, P2) hoisted prenet outputs; zm1/zm2 (G, B, L) bool/float
    zoneout keep-prev masks (zeros = no zoneout, i.e. eval semantics).

    impl: "pallas" (compiled kernels), "pallas_interpret" (interpret mode,
    CPU-testable), or "ref" (the lax.scan twin — used by parity tests).

    Returns (mel_groups (G, B, n_mels, r), attn_scores (G, B, T_text)),
    matching the scan branch of models/tacotron.forward group-for-group.
    """
    geom, planes, weights = _pack_operands(dec, encoder_seq,
                                           encoder_seq_proj, max_r, r,
                                           n_mels, pre_all.dtype)
    B, B_pad, T_pad, S, F = geom
    G = pre_all.shape[0]
    dt = pre_all.dtype
    T_text = encoder_seq.shape[1]
    if B_pad != B:
        padB = ((0, 0), (0, B_pad - B), (0, 0))
        pre_all = jnp.pad(pre_all, padB)
        zm1 = jnp.pad(zm1, padB)
        zm2 = jnp.pad(zm2, padB)

    args = (pre_all, zm1.astype(dt), zm2.astype(dt), *planes, *weights)
    if impl == "ref":
        mel, sc = core_ref((chunk, False), *args)
    else:
        mel, sc = _core((chunk, impl == "pallas_interpret"), *args)
    return _unpack_outputs(mel, sc, geom, G, r, n_mels, T_text, dt)


def _pack_operands(dec, encoder_seq, encoder_seq_proj, max_r, r, n_mels,
                   dt):
    """Shared operand packing for the TF and AF ops: lane-stacked encoder
    planes, block indicator/mask constants, the composed location-conv x
    L-projection weight, the frame-major sliced mel projection, and the
    combined biases (all differentiable JAX ops so autodiff carries
    cotangents back to the model params)."""
    B, T_text, E = encoder_seq.shape
    D = encoder_seq_proj.shape[-1]
    L = dec["rnn_input"]["w"].shape[1]
    B_pad = _round_up(B, 8)
    T_pad = _round_up(T_text + CONV_HALF, 8)
    S = _round_up(B * T_pad, 128)

    # lane-stacked encoder planes: utterance b at lanes [b*T_pad, ...)
    def stack_lanes(x):  # (B, T_text, X) -> (S, X)
        xp = jnp.pad(x, ((0, 0), (0, T_pad - T_text), (0, 0)))
        xp = xp.reshape(B * T_pad, -1)
        return jnp.pad(xp, ((0, S - B * T_pad), (0, 0)))

    encS = stack_lanes(encoder_seq)
    encpT = jnp.swapaxes(stack_lanes(encoder_seq_proj), 0, 1)  # (D, S)

    in_ut = (np.arange(S) % T_pad < T_text) & (np.arange(S) < B * T_pad)
    mask8 = np.zeros((8, S), np.float32)
    mask8[0] = in_ut.astype(np.float32)
    eb = np.zeros((B_pad, S), np.float32)
    for b in range(B):
        eb[b, b * T_pad:(b + 1) * T_pad] = 1.0

    # composed location-conv x L-projection weight: W01 (D, 64), columns
    # [k]=cum tap k, [31+k]=attention tap k (reference conv (32, 2, 31)
    # then Linear(32 -> D), tacotron.py:187-196)
    convw = dec["attn"]["conv"]["w"].astype(F32)
    lw = dec["attn"]["L"]["w"].astype(F32)
    W0 = jnp.einsum("ck,cd->dk", convw[:, 0, :], lw)     # (D, 31)
    W1 = jnp.einsum("ck,cd->dk", convw[:, 1, :], lw)
    W01 = jnp.concatenate([W0, W1, jnp.zeros((D, 2), F32)],
                          axis=1).astype(dt)
    v8 = jnp.zeros((8, D), dt).at[0].set(
        dec["attn"]["v"]["w"][:, 0].astype(dt))
    qb = (dec["attn"]["W"]["b"] + dec["attn"]["L"]["b"])[None].astype(F32)

    F = r * n_mels
    F_pad = _round_up(F, 128)
    wm = dec["mel_proj"]["w"].reshape(-1, n_mels, max_r)[:, :, :r]
    wm = jnp.swapaxes(wm, 1, 2).reshape(L, F)
    wm = jnp.pad(wm, ((0, 0), (0, F_pad - F)))

    planes = (encS, encpT, jnp.asarray(mask8), jnp.asarray(eb))
    weights = (
        dec["attn_rnn"]["wi"], dec["attn_rnn"]["bi"][None].astype(F32),
        dec["attn_rnn"]["wh"], dec["attn_rnn"]["bh"][None].astype(F32),
        dec["attn"]["W"]["w"], qb, W01, v8,
        dec["rnn_input"]["w"], dec["rnn_input"]["b"][None].astype(F32),
        dec["res_rnn1"]["wi"], dec["res_rnn1"]["wh"],
        (dec["res_rnn1"]["bi"] + dec["res_rnn1"]["bh"])[None].astype(F32),
        dec["res_rnn2"]["wi"], dec["res_rnn2"]["wh"],
        (dec["res_rnn2"]["bi"] + dec["res_rnn2"]["bh"])[None].astype(F32),
        wm)
    return (B, B_pad, T_pad, S, F), planes, weights


def _unpack_outputs(mel, sc, geom, G, r, n_mels, T_text, dt):
    B, B_pad, T_pad, S, F = geom
    mel = mel[:, :B, :F].reshape(G, B, r, n_mels)
    mel_groups = jnp.moveaxis(mel, 2, 3)                 # (G, B, n_mels, r)
    sc = sc[:, :B * T_pad].reshape(G, B, T_pad)[:, :, :T_text]
    return mel_groups, sc.astype(dt)


def af_masks(k_dec, n_groups: int, B: int, L: int, P1: int, P2: int,
             training: bool, dropout: float = 0.5, rate: float = 0.1):
    """Attention-forcing per-step noise with the scan's exact key stream:
    decoder_step splits each step key into (k_pre, k_z1, k_z2); the prenet
    splits k_pre into its two dropout keys (L.dropout keep-masks, returned
    pre-scaled by 1/(1-dropout)); zoneout draws bernoulli(k_z, 0.1).  Eval
    (training=False): dropout masks of ones, zoneout masks of zeros."""
    if not training:
        ones = jnp.ones((n_groups, B, P1), jnp.float32)
        return (ones, jnp.ones((n_groups, B, P2), jnp.float32),
                jnp.zeros((n_groups, B, L), jnp.bool_),
                jnp.zeros((n_groups, B, L), jnp.bool_))
    keys = jax.random.split(k_dec, n_groups)
    scale = 1.0 / (1.0 - dropout)

    def draw(k):
        k_pre, kz1, kz2 = jax.random.split(k, 3)
        k1, k2 = jax.random.split(k_pre)
        return (jax.random.bernoulli(k1, 1.0 - dropout,
                                     (B, P1)).astype(jnp.float32) * scale,
                jax.random.bernoulli(k2, 1.0 - dropout,
                                     (B, P2)).astype(jnp.float32) * scale,
                jax.random.bernoulli(kz1, rate, (B, L)),
                jax.random.bernoulli(kz2, rate, (B, L)))

    return jax.vmap(draw)(keys)


def decoder_af_train(dec, encoder_seq, encoder_seq_proj, attn_ref,
                     dm1, dm2, zm1, zm2, max_r: int, r: int, n_mels: int,
                     impl: str = "pallas", chunk: int = 8):
    """Run the ATTENTION-FORCING decoder recurrence on the training
    kernels (reference tacotron.py attention-forcing arm: context from
    attn_ref, prenet fed by the carried prev_frame).

    attn_ref: (B, n_groups, T_text) reference attention (already
    compute-dtype cast by the model); dm1/dm2: (G, B, P1/P2) pre-scaled
    prenet dropout keep-masks; zm1/zm2 zoneout masks (af_masks).
    Returns (mel_groups (G, B, n_mels, r), attn_scores (G, B, T_text)),
    matching the scan branch of models/tacotron.forward."""
    geom, planes, weights = _pack_operands(dec, encoder_seq,
                                           encoder_seq_proj, max_r, r,
                                           n_mels, attn_ref.dtype)
    B, B_pad, T_pad, S, F = geom
    G = attn_ref.shape[1]
    dt = attn_ref.dtype
    T_text = encoder_seq.shape[1]
    P1 = dec["prenet"]["fc1"]["w"].shape[1]

    # stack attn_ref rows into the (G, S) lane layout
    ar = jnp.moveaxis(attn_ref, 1, 0)                    # (G, B, T_text)
    ar = jnp.pad(ar, ((0, 0), (0, 0), (0, T_pad - T_text)))
    ar = ar.reshape(G, B * T_pad)
    ar = jnp.pad(ar, ((0, 0), (0, S - B * T_pad)))

    if B_pad != B:
        padB = ((0, 0), (0, B_pad - B), (0, 0))
        dm1 = jnp.pad(dm1, padB)
        dm2 = jnp.pad(dm2, padB)
        zm1 = jnp.pad(zm1, padB)
        zm2 = jnp.pad(zm2, padB)

    w1p = jnp.zeros((128, P1), dt).at[:n_mels].set(
        dec["prenet"]["fc1"]["w"].astype(dt))
    b1 = dec["prenet"]["fc1"]["b"][None].astype(F32)
    w2p = dec["prenet"]["fc2"]["w"]
    b2 = dec["prenet"]["fc2"]["b"][None].astype(F32)

    args = (ar, dm1.astype(dt), dm2.astype(dt), zm1.astype(dt),
            zm2.astype(dt), *planes, w1p, b1, w2p, b2, *weights)
    if impl == "ref":
        mel, sc = core_af_ref((chunk, False, n_mels, r), *args)
    else:
        mel, sc = _core_af((chunk, impl == "pallas_interpret", n_mels, r),
                           *args)
    return _unpack_outputs(mel, sc, geom, G, r, n_mels, T_text, dt)
