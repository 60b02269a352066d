"""Polyphase form of the WaveRNN mel upsampler.

The reference upsampler (fatchord_version.py:64-89) is Stretch2d
(nearest-neighbor repeat) followed by odd-length averaging convs, once per
scale — a linear, per-channel, time-invariant-per-phase system.  Composing
the stages gives ONE FIR filter ``h`` (957 taps at the default scales
(5, 5, 11)), so every upsampled sample is a K-tap combination of
neighboring mel FRAMES:

    mels_up[s, c] = sum_j  phi[s % hop, j] * mel_padded[s // hop + d_lo + j, c]

with ``phi`` an (hop, K) table of scalars shared by all channels (K = 5 at
the defaults).  The aux stream is even simpler: a pure frame repeat
(aux_up[s] = aux[s // hop], fatchord:85-87).

This lets the generation kernel consume conditioning at MEL RATE (a few MB)
instead of materializing + folding sample-rate tensors (~GBs of HBM traffic
for a minute-long utterance): the kernel streams K shifted views of one
folded frame array and applies ``phi`` in-register.  ``phi`` is recomputed
from the (trainable) conv weights at trace time, so the fused path tracks
training updates exactly.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PolyGeometry(NamedTuple):
    """Static geometry of the composite upsampling filter."""
    hop: int       # total upsample factor (= product of scales)
    lead: int      # samples the response extends LEFT of its frame's start
    h_len: int     # composite FIR length in samples
    d_lo: int      # lowest frame-tap offset relative to s // hop
    K: int         # number of frame taps
    indent: int    # pad * hop samples trimmed from each side (fatchord:88)


def geometry(upsample_factors: Sequence[int], pad: int) -> PolyGeometry:
    """Derive the composite filter's support from the static scales.

    Per stage (stretch x s, then conv k=2s+1 with zero-pad s): an impulse
    frame's response start index scales by s then shifts left by s, and its
    length scales by s then widens by 2s.
    """
    start, length = 0, 1
    hop = 1
    for s in upsample_factors:
        start = start * s - s
        length = length * s + 2 * s
        hop *= s
    lead, h_len = -start, length
    indent = pad * hop
    # tight support: the lowest tap d needs SOME phase p with
    # p + indent + lead - hop*d <= h_len-1 (easiest at p=0) -> ceil; floor
    # would admit one extra tap whose phi row is identically zero (a dead
    # (B, R) FMA per sample and an extra streamed frame row per chunk)
    d_lo = math.ceil((indent + lead - (h_len - 1)) / hop)
    d_hi = (hop - 1 + indent + lead) // hop
    return PolyGeometry(hop, lead, h_len, d_lo, d_hi - d_lo + 1, indent)


def composite_response(up_convs, upsample_factors: Sequence[int],
                       geo: PolyGeometry) -> jnp.ndarray:
    """Trace-time impulse response of the stretch+conv stack: (h_len,) f32.

    Runs the actual conv weights (they are trainable, fatchord:78) over a
    single-frame impulse, so the polyphase table always matches the current
    parameters.
    """
    F0 = -(-geo.lead // geo.hop) + 1
    F = F0 + -(-(geo.h_len - geo.lead) // geo.hop) + 2
    m = jnp.zeros((1, 1, F), jnp.float32).at[0, 0, F0].set(1.0)
    for scale, conv in zip(upsample_factors, up_convs):
        m = jnp.repeat(m, scale, axis=-1)
        k = conv["w"].shape[-1]
        m = jax.lax.conv_general_dilated(
            m, conv["w"].reshape(1, 1, k), window_strides=(1,),
            padding=[(scale, scale)],
            dimension_numbers=("NCH", "OIH", "NCH"))
    return jax.lax.dynamic_slice(m[0, 0], (geo.hop * F0 - geo.lead,),
                                 (geo.h_len,))


def phi_table(up_convs, upsample_factors: Sequence[int],
              geo: PolyGeometry) -> jnp.ndarray:
    """(K, hop) per-phase tap weights:
    phi[j, p] multiplies mel_padded[s // hop + d_lo + j] for phase p."""
    h = composite_response(up_convs, upsample_factors, geo)
    p = np.arange(geo.hop)[None, :]
    d = (geo.d_lo + np.arange(geo.K))[:, None]
    k_idx = p + geo.indent + geo.lead - geo.hop * d          # (K, hop)
    valid = (k_idx >= 0) & (k_idx < geo.h_len)
    return jnp.where(jnp.asarray(valid),
                     h[jnp.asarray(np.clip(k_idx, 0, geo.h_len - 1))], 0.0)


def upsample_polyphase(up_convs, mels_padded, upsample_factors, pad):
    """Reference-equivalent mel upsampling via the polyphase table (used by
    tests to pin the equivalence; the production consumer is the fused
    generation kernel). mels_padded: (B, n_mels, T + 2*pad) ->
    (B, (T)*hop, n_mels)."""
    geo = geometry(upsample_factors, pad)
    phi = phi_table(up_convs, upsample_factors, geo)          # (K, hop)
    B, C, Tp = mels_padded.shape
    T = Tp - 2 * pad
    S = T * geo.hop
    s = np.arange(S)
    frames = jnp.swapaxes(mels_padded, 1, 2)                  # (B, Tp, C)
    out = jnp.zeros((B, S, C), jnp.float32)
    for j in range(geo.K):
        f = s // geo.hop + geo.d_lo + j
        ok = (f >= 0) & (f < Tp)
        gathered = frames[:, jnp.asarray(np.clip(f, 0, Tp - 1))]
        w = phi[j][jnp.asarray(s % geo.hop)] * jnp.asarray(ok)
        out = out + w[None, :, None] * gathered
    return out


def reconstruct_from_folded(frames_folded, phi, hop: int, aux_tap: int,
                            fold_chunks: int, n_mels: int):
    """Scan-twin of the fused kernel's in-register conditioning: materialize
    sample-rate (mels_up, aux_up) from folded frame rows in the
    build_folded_frames layout (rows already shifted by d_lo, so chunk c's
    tap j reads row c + j and the aux repeat reads tap ``aux_tap = -d_lo``).

    frames_folded: (nf_loc, B, n_mels + 4*aux_dims) ->
    (mels_up (B, L, n_mels), aux_up (B, L, 4*aux_dims)), L = fold_chunks*hop.
    Keeping this next to phi_table pins the tap-indexing convention in one
    place for every non-kernel consumer (CPU shard meshes, tests)."""
    mel_fr = jnp.swapaxes(frames_folded[..., :n_mels], 0, 1)  # (B, nf, C)
    aux_fr = jnp.swapaxes(frames_folded[..., n_mels:], 0, 1)
    L = fold_chunks * hop
    s = np.arange(L)
    mels_up = jnp.zeros((mel_fr.shape[0], L, n_mels), jnp.float32)
    for j in range(phi.shape[0]):
        w = phi[j][jnp.asarray(s % hop)]
        mels_up = mels_up + w[None, :, None] * mel_fr[:, jnp.asarray(
            s // hop + j)]
    aux_up = aux_fr[:, jnp.asarray(s // hop + aux_tap)]
    return mels_up, aux_up


def fold_geometry(total_len: int, target: int, overlap: int,
                  hop: int) -> Tuple[int, int, int, int]:
    """Frame-rate fold layout (valid only when target and overlap are
    multiples of hop — true for the reference defaults 11000/550 @ hop 275,
    hparams.py:59-60). Returns (num_folds, stride_frames, fold_chunks,
    fold_len)."""
    assert target % hop == 0 and overlap % hop == 0
    from .fold import num_folds_for
    num_folds = num_folds_for(total_len, target, overlap)
    fold_len = target + 2 * overlap
    return (num_folds, (target + overlap) // hop, fold_len // hop, fold_len)


def build_folded_frames(mel_frames, aux_frames, num_folds: int,
                        stride_f: int, fold_chunks: int, K: int, d_lo: int):
    """Gather the frame-rate conditioning for every fold.

    mel_frames: (Tp, n_mels) — PADDED mel frames (pad each side);
    aux_frames: (T, 4*aux_dims) — resnet output frames (unpadded count).
    Returns (nf_loc, num_folds, n_mels + 4*aux_dims) time-major, where row
    f holds frame ``b*stride_f + f + d_lo`` of each stream (zeros out of
    range), so chunk c's tap j reads row c + j and the aux repeat reads
    tap ``-d_lo``.
    """
    nf_loc = fold_chunks + K - 1
    Tp, Ta = mel_frames.shape[0], aux_frames.shape[0]
    g = (np.arange(num_folds)[:, None] * stride_f
         + np.arange(nf_loc)[None, :] + d_lo)                 # (B, nf_loc)
    gj = jnp.asarray(g)
    mel = jnp.where(((gj >= 0) & (gj < Tp))[..., None],
                    mel_frames[jnp.asarray(np.clip(g, 0, Tp - 1))], 0.0)
    aux = jnp.where(((gj >= 0) & (gj < Ta))[..., None],
                    aux_frames[jnp.asarray(np.clip(g, 0, Ta - 1))], 0.0)
    return jnp.swapaxes(jnp.concatenate([mel, aux], axis=-1), 0, 1)
