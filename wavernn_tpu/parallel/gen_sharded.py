"""Scale-out generation: folds data-parallel over the mesh, with an
optional exact-seam mode.

Crossfade mode (the reference's scheme, fatchord_version.py:293-405): folds
are fully independent after their overlap warmup -> shard the fold batch
over the ``data`` axis, zero mid-loop communication, equal-power xfade at
the end.

Exact-seam mode (TPU-native extension, SURVEY §5): instead of crossfading
approximately-matching overlap regions, hand the true RNN state across fold
boundaries.  Each refinement pass re-runs all folds in parallel, this time
initializing fold i with the state fold i-1 had when it *entered* local
step ``target + overlap`` (= fold i's global start).  The state shift is a
roll along the fold axis, which XLA lowers to a collective permute when
folds are sharded.  Pass k makes the first k+1 folds exact, and since the
RNN forgets over the ``overlap`` warmup, 1-2 passes are audibly seamless;
``num_folds`` passes reproduce sequential generation bit-for-bit, enabling
hard concatenation with no crossfade.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DSPConfig, WaveRNNConfig
from ..ops import fold as F
from ..ops.sample_loop import generate_scan_with_state


def _seam_shift(state):
    """Fold i receives fold i-1's boundary state; fold 0 keeps zeros.  The
    roll lowers to a collective permute when folds are sharded."""
    def roll(s):
        rolled = jnp.roll(s, 1, axis=0)
        return rolled.at[0].set(jnp.zeros_like(rolled[0]))
    return jax.tree_util.tree_map(roll, state)


def _seam_refine(one_pass, seam_passes: int):
    """Initial pass + ``seam_passes`` state-handoff refinements.  Returns
    (samples, per-pass mean-abs sample change)."""
    samples, snap = one_pass(None)
    errs = []
    for _ in range(seam_passes):
        new_samples, snap = one_pass(_seam_shift(snap))
        errs.append(jnp.mean(jnp.abs(new_samples - samples)))
        samples = new_samples
    return samples, jnp.stack(errs) if errs else jnp.zeros((0,))


@partial(jax.jit, static_argnames=("voc", "bits", "target", "overlap",
                                   "seam_passes", "use_pallas", "interpret"))
def generate_exact_seam(params, mels_up, aux, voc: WaveRNNConfig, bits: int,
                        key, target: int, overlap: int,
                        seam_passes: int = 2, noise=None,
                        use_pallas: bool = False, interpret: bool = False):
    """Folded generation with state handoff. mels_up/aux: folded (B, L, ·)
    with L = target + 2*overlap.  Returns (samples (B, L), per-pass seam
    error) — concatenate with `concat_folds`.
    """
    B, L, _ = mels_up.shape
    boundary = target + overlap  # fold i's global start within fold i-1

    if noise is None and voc.mode == "MOL":
        nr_mix = voc.n_classes(bits) // 3
        k1, k2 = jax.random.split(key)
        noise = (jax.random.uniform(k1, (L, B, nr_mix), minval=1e-5,
                                    maxval=1.0 - 1e-5),
                 jax.random.uniform(k2, (L, B), minval=1e-5,
                                    maxval=1.0 - 1e-5))

    def one_pass(init_state):
        if use_pallas:
            from ..ops.pallas_gen import generate_pallas_with_state
            return generate_pallas_with_state(
                params, mels_up, aux, voc, bits, key, noise=noise,
                interpret=interpret, init_state=init_state,
                state_snapshot_at=boundary)
        return generate_scan_with_state(
            params, mels_up, aux, voc, bits, key, noise=noise,
            init_state=init_state, state_snapshot_at=boundary)

    return _seam_refine(one_pass, seam_passes)


@partial(jax.jit, static_argnames=("voc", "bits", "hop", "aux_tap",
                                   "fold_chunks", "target", "overlap",
                                   "seam_passes", "compute_dtype",
                                   "interpret"))
def generate_exact_seam_fused(params, frames, phi, voc: WaveRNNConfig,
                              bits: int, key, hop: int, aux_tap: int,
                              fold_chunks: int, target: int, overlap: int,
                              seam_passes: int = 2, noise=None,
                              compute_dtype=jnp.bfloat16,
                              interpret: bool = False):
    """Exact-seam refinement on the fused-conditioning kernel: frame-rate
    conditioning (ops/polyphase.py), state snapshot/handoff identical to
    `generate_exact_seam`. With in-kernel PRNG (noise=None) every pass
    reseeds from the same key, so fold noise replays identically across
    refinement passes — the requirement for monotone seam convergence."""
    from ..ops.pallas_gen import generate_pallas_fused_with_state

    boundary = target + overlap

    def one_pass(init_state):
        return generate_pallas_fused_with_state(
            params, frames, phi, voc, bits, key, hop, aux_tap, fold_chunks,
            noise=noise, compute_dtype=compute_dtype, interpret=interpret,
            init_state=init_state, state_snapshot_at=boundary)

    return _seam_refine(one_pass, seam_passes)


def concat_folds(samples, target: int, overlap: int, wave_len: int):
    """Hard (no-crossfade) unfold for exact-seam output: fold i contributes
    its local [0, target+overlap) samples at global offset i*(target+overlap).
    """
    B = samples.shape[0]
    seg = target + overlap
    body = samples[:, :seg].reshape(-1)
    tail = samples[-1, seg:]
    return jnp.concatenate([body, tail])[:wave_len]


def _fused_frame_prep(params, mels, voc, dsp, target, overlap):
    """Frame-rate conditioning prep shared by the sharded-crossfade and
    fused exact-seam paths: pad the mel, run MelResNet at mel rate, fold
    the frame rows (ops/polyphase.py).  Returns
    (frames, fold_chunks, geo, phi, wave_len)."""
    from ..models.wavernn import (_fused_fold_frames, _fused_setup,
                                  melresnet_apply)

    wave_len = (mels.shape[-1] - 1) * dsp.hop_length
    total_len = mels.shape[-1] * dsp.hop_length
    mels_p = jnp.pad(mels, ((0, 0), (0, 0), (voc.pad, voc.pad)))
    geo, phi = _fused_setup(params, voc)
    aux_fr, _ = melresnet_apply(params["upsample"]["resnet"], mels_p,
                                training=False)
    frames, fold_chunks = _fused_fold_frames(
        jnp.swapaxes(mels_p[0], 0, 1), jnp.swapaxes(aux_fr[0], 0, 1),
        total_len, target, overlap, geo)
    return frames, fold_chunks, geo, phi, wave_len


def _crossfade_prog(mesh, voc, dsp, target: int, overlap: int,
                    n_frames: int, use_pallas: bool,
                    interpret: bool = False, sparse_static=()):
    """ONE compiled program for the whole sharded-crossfade pipeline:
    pad -> MelResNet (frame rate) -> fold gather -> shard_map(sample
    kernel over the fold axis) -> equal-power xfade -> trim.

    Cached per static config.  Round 2 ran only the shard_map under jit and
    did the conditioning prep + xfade EAGERLY — on a remote-tunnel backend
    that is dozens of per-op dispatches per utterance and cost 3.4x vs the
    single-program fast path (SCALING_r02 188 vs 641 audio-s/s).
    """
    from jax.sharding import PartitionSpec as P

    from ..models.wavernn import (_fused_fold_frames, melresnet_apply)
    from ..ops import polyphase as Po

    bits, n_mels, hop = dsp.bits, dsp.num_mels, dsp.hop_length
    geo = Po.geometry(voc.upsample_factors, voc.pad)
    d_lo, K = geo.d_lo, geo.K
    total_len = n_frames * hop
    wave_len = (n_frames - 1) * hop
    num_folds, _, fold_chunks, _ = Po.fold_geometry(total_len, target,
                                                    overlap, hop)
    n = mesh.shape["data"]
    pad_folds = (-num_folds) % n

    def shard_fn(params, phi, frames_local, keys_local, sparse_arrays):
        k = jax.random.fold_in(keys_local[0], jax.lax.axis_index("data"))
        if use_pallas:
            from ..ops.pallas_gen import generate_pallas_fused
            return generate_pallas_fused(params, frames_local, phi, voc,
                                         bits, k, hop, -d_lo, fold_chunks,
                                         interpret=interpret,
                                         sparse_static=sparse_static,
                                         sparse_arrays=sparse_arrays)
        # scan twin (CPU meshes): reconstruct sample-rate conditioning per
        # shard from the frame rows via the same polyphase table + repeat
        # (sparse_arrays unused — masked dense weights are numerically
        # identical to the sparse schedule)
        from ..ops.polyphase import reconstruct_from_folded
        from ..ops.sample_loop import generate_scan
        mels_up, aux_up = reconstruct_from_folded(frames_local, phi, hop,
                                                  -d_lo, fold_chunks, n_mels)
        return generate_scan(params, mels_up, aux_up, voc, bits, k)

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(None, "data", None), P("data"), P()),
        out_specs=P("data"), check_vma=False)

    @jax.jit
    def run(params, phi, mels, keys, sparse_arrays):
        mels_p = jnp.pad(mels, ((0, 0), (0, 0), (voc.pad, voc.pad)))
        aux_fr, _ = melresnet_apply(params["upsample"]["resnet"], mels_p,
                                    training=False)
        frames, _ = _fused_fold_frames(
            jnp.swapaxes(mels_p[0], 0, 1), jnp.swapaxes(aux_fr[0], 0, 1),
            total_len, target, overlap, geo)
        if pad_folds:  # pad to a shardable fold count (extras discarded)
            frames = jnp.pad(frames, ((0, 0), (0, pad_folds), (0, 0)))
        samples = sharded(params, phi, frames, keys,
                          sparse_arrays)[:num_folds]
        return F.xfade_and_unfold_jax(samples, overlap)[:wave_len]

    return run


_CROSSFADE_CACHE: dict = {}

#: stats of the most recent generate_sharded crossfade call — fold-layout
#: imbalance evidence for the scaling artifact (SCALING_r03): with zero
#: mid-loop communication, cross-device efficiency is bounded by how evenly
#: folds land on shards, which these numbers make checkable.
last_stats: dict = {}


def _crossfade_sharded(params, mels, voc, dsp, key, mesh, target, overlap,
                       use_pallas, interpret=False, device_out=False,
                       sparse_packed=None):
    """Crossfade-mode fold sharding with frame-rate conditioning.

    Folds are embarrassingly parallel after their overlap warmup, so each
    device runs the sample loop on ITS fold shard via shard_map — an
    explicit SPMD region rather than GSPMD through the kernel boundary
    (GSPMD cannot partition a pallas_call; it would replicate the loop).
    Conditioning stays at mel rate (a few MB even for minutes of audio):
    the tiny folded frame array is sharded on the fold axis, and each shard
    runs the fused kernel (TPU) or the polyphase scan twin (CPU mesh).
    Per-shard PRNG keys are folded with the shard index so fold noise stays
    independent across devices.  The whole pipeline is one jit launch per
    (utterance-length, config) — see _crossfade_prog.
    """
    import time as _time

    import numpy as np
    from jax.sharding import Mesh

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    n = mesh.shape["data"]
    n_frames = int(mels.shape[-1])
    sparse_static, sparse_arrays = sparse_packed or ((), ())

    cache_key = (mesh, voc, dsp, n_frames, target, overlap, use_pallas,
                 interpret, sparse_static)
    prog = _CROSSFADE_CACHE.get(cache_key)
    if prog is None:
        prog = _CROSSFADE_CACHE.setdefault(cache_key, _crossfade_prog(
            mesh, voc, dsp, target, overlap, n_frames, use_pallas,
            interpret, sparse_static))
    keys = jnp.broadcast_to(key, (n,) + key.shape)
    t0 = _time.perf_counter()
    wav = prog(params, jnp.asarray(_fused_setup_phi(params, voc)), mels, keys,
               sparse_arrays)
    if device_out:
        # fence compute for the wall_s stat without the bulk export
        np.asarray(jnp.sum(wav))
    else:
        wav = np.asarray(wav)
    from ..ops import polyphase as Po
    num_folds = Po.fold_geometry(n_frames * dsp.hop_length, target, overlap,
                                 dsp.hop_length)[0]
    pad_folds = (-num_folds) % n
    last_stats.clear()
    last_stats.update({
        "wall_s": round(_time.perf_counter() - t0, 4),
        "num_folds": num_folds,
        "devices": n,
        "pad_folds": pad_folds,
        "folds_per_shard": (num_folds + pad_folds) // n,
        "fold_imbalance": round(pad_folds / max(num_folds, 1), 4),
    })
    return wav


def _fused_setup_phi(params, voc):
    """Polyphase tap table for the current upsampler weights (tiny; the
    jitted crossfade program takes it as an argument so weight updates
    don't recompile)."""
    from ..models.wavernn import _fused_setup
    return _fused_setup(params, voc)[1]


def generate_sharded(params, mels, voc: WaveRNNConfig, dsp: DSPConfig, key,
                     mesh=None, target: Optional[int] = None,
                     overlap: Optional[int] = None, seam_passes: int = 0,
                     use_pallas: bool = False, interpret: bool = False,
                     device_out: bool = False, sparse_packed=None):
    """End-to-end batched generation with folds laid out on the mesh's
    ``data`` axis.  seam_passes=0 -> reference crossfade semantics (fused
    frame-rate conditioning, explicit shard_map, zero mid-loop
    communication); seam_passes>0 -> exact-seam state handoff + hard concat.
    ``interpret`` runs the Pallas paths in interpreter mode (CPU testing).
    ``device_out`` returns the waveform as a device array (serving defers
    the host export; see generate_multi).
    ``sparse_packed``: (sparse_static, sparse_arrays) from
    ops.pallas_gen.pack_sparse — sharded serving of a block-pruned
    checkpoint (crossfade + materialized pallas paths; exact-seam passes
    run the masked weights dense, numerically identical).
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.wavernn import _fused_cond_ok, upsample_apply

    target = voc.target if target is None else target
    overlap = voc.overlap if overlap is None else overlap
    mels = jnp.asarray(mels)

    if seam_passes == 0 and _fused_cond_ok(voc, dsp, target, overlap):
        return _crossfade_sharded(params, mels, voc, dsp, key, mesh, target,
                                  overlap, use_pallas, interpret,
                                  device_out=device_out,
                                  sparse_packed=sparse_packed)

    if (seam_passes > 0 and mesh is None and use_pallas
            and _fused_cond_ok(voc, dsp, target, overlap)):
        # single-device exact seam on frame-rate conditioning (the mesh
        # case keeps the materialized path: its roll-shift must lower to a
        # collective, which needs GSPMD-visible state, not a pallas body)
        frames, fold_chunks, geo, phi, wave_len = _fused_frame_prep(
            params, mels, voc, dsp, target, overlap)
        samples, _ = generate_exact_seam_fused(
            params, frames, phi, voc, dsp.bits, key, geo.hop, -geo.d_lo,
            fold_chunks, target, overlap, seam_passes, interpret=interpret)
        wav = concat_folds(samples, target, overlap, wave_len)
        return wav if device_out else np.asarray(wav)

    wave_len = (mels.shape[-1] - 1) * dsp.hop_length
    mels = jnp.pad(mels, ((0, 0), (0, 0), (voc.pad, voc.pad)))
    mels_up, aux, _ = upsample_apply(params["upsample"], mels, voc,
                                     training=False)
    mels_up = F.fold_with_overlap(mels_up, target, overlap)
    aux = F.fold_with_overlap(aux, target, overlap)

    if mesh is not None:
        n = mesh.shape["data"]
        pad_folds = (-mels_up.shape[0]) % n
        if pad_folds:
            mels_up = jnp.pad(mels_up, ((0, pad_folds), (0, 0), (0, 0)))
            aux = jnp.pad(aux, ((0, pad_folds), (0, 0), (0, 0)))
        sh = NamedSharding(mesh, P("data"))
        mels_up = jax.device_put(mels_up, sh)
        aux = jax.device_put(aux, sh)

    if seam_passes > 0:
        samples, _ = generate_exact_seam(params, mels_up, aux, voc, dsp.bits,
                                         key, target, overlap, seam_passes,
                                         use_pallas=use_pallas,
                                         interpret=interpret)
        wav = concat_folds(samples, target, overlap, wave_len)
        return wav if device_out else np.asarray(wav)

    if use_pallas:
        from ..ops.pallas_gen import (_generate_pallas_sparse_jit,
                                      generate_pallas)
        if sparse_packed and sparse_packed[0]:
            samples = _generate_pallas_sparse_jit(
                params, mels_up, aux, voc, dsp.bits, key, None,
                sparse_packed[1], chunk=128, compute_dtype=jnp.bfloat16,
                interpret=interpret, sparse_static=sparse_packed[0])
        else:
            samples = generate_pallas(params, mels_up, aux, voc, dsp.bits,
                                      key, interpret=interpret)
    else:
        from ..ops.sample_loop import generate_scan
        samples = generate_scan(params, mels_up, aux, voc, dsp.bits, key)
    wav = F.xfade_and_unfold_jax(samples, overlap)[:wave_len]
    return wav if device_out else np.asarray(wav)


# --------------------------------------------------------------------------
# multi-utterance batched serving on the mesh (SERVING.md batch layer)
# --------------------------------------------------------------------------

_MULTI_SHARDED_CACHE: dict = {}


def _multi_sharded_prog(mesh, voc, dsp, target: int, overlap: int,
                        frames_t, mu_law: bool, use_pallas: bool,
                        interpret: bool, sparse_static=(),
                        tail_fade: bool = True, noise_kind=None):
    """ONE compiled program for mesh-sharded batched serving: pad each
    utterance to the shared bucket -> batched MelResNet -> per-utterance
    frame-rate fold gather -> ONE shard_map(sample kernel) over the
    COMBINED fold axis -> per-utterance device post-processing
    (models.wavernn._multi_post_jit semantics).

    The multi-utterance twin of _crossfade_prog: all utterances' folds
    share one (target + 2*overlap) length, so they concatenate into a
    single fold batch that lays out on the mesh's ``data`` axis — an
    explicit SPMD region (GSPMD cannot partition a pallas_call), zero
    mid-loop communication, per-shard PRNG keys folded with the shard
    index.  CPU meshes run the polyphase scan twin per shard.
    """
    from jax.sharding import PartitionSpec as P

    from ..models.wavernn import (_fused_fold_frames, _multi_post_jit,
                                  melresnet_apply)
    from ..ops import polyphase as Po

    bits, n_mels, hop = dsp.bits, dsp.num_mels, dsp.hop_length
    geo = Po.geometry(voc.upsample_factors, voc.pad)
    d_lo = geo.d_lo
    pad = voc.pad
    T_max = -(-max(frames_t) // 64) * 64
    wave_lens = tuple((n - 1) * hop for n in frames_t)
    counts = tuple(Po.fold_geometry(n * hop, target, overlap, hop)[0]
                   for n in frames_t)
    fold_chunks = Po.fold_geometry(frames_t[0] * hop, target, overlap,
                                   hop)[2]
    total_folds = sum(counts)
    n = mesh.shape["data"]
    pad_folds = (-total_folds) % n

    def shard_fn(params, phi, frames_local, keys_local, sparse_arrays,
                 noise_local):
        k = jax.random.fold_in(keys_local[0], jax.lax.axis_index("data"))
        if noise_kind is None:
            noise_local = None
        if use_pallas:
            from ..ops.pallas_gen import generate_pallas_fused
            return generate_pallas_fused(params, frames_local, phi, voc,
                                         bits, k, hop, -d_lo, fold_chunks,
                                         noise=noise_local,
                                         interpret=interpret,
                                         sparse_static=sparse_static,
                                         sparse_arrays=sparse_arrays)
        from ..ops.polyphase import reconstruct_from_folded
        from ..ops.sample_loop import generate_scan
        mels_up, aux_up = reconstruct_from_folded(frames_local, phi, hop,
                                                  -d_lo, fold_chunks, n_mels)
        return generate_scan(params, mels_up, aux_up, voc, bits, k,
                             noise=noise_local)

    # injected sampling noise (tests/replay) is time-major (T, B, ·) /
    # (T, B): shard its FOLD axis (axis 1) alongside the fold batch
    noise_spec = {None: P(), "raw": P(None, "data", None),
                  "mol": (P(None, "data", None), P(None, "data"))}[noise_kind]
    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(None, "data", None), P("data"), P(),
                  noise_spec),
        out_specs=P("data"), check_vma=False)

    @jax.jit
    def run(params, phi, mels, keys, sparse_arrays, noise):
        mels_b = jnp.stack(
            [jnp.pad(m, ((0, 0), (0, T_max - m.shape[-1]))) for m in mels])
        mels_b = jnp.pad(mels_b, ((0, 0), (0, 0), (pad, pad)))
        aux_b, _ = melresnet_apply(params["upsample"]["resnet"], mels_b,
                                   training=False)
        frames_list = []
        for i, n_frames in enumerate(frames_t):
            fr, _ = _fused_fold_frames(
                jnp.swapaxes(mels_b[i, :, :n_frames + 2 * pad], 0, 1),
                jnp.swapaxes(aux_b[i, :, :n_frames], 0, 1),
                n_frames * hop, target, overlap, geo)
            frames_list.append(fr)
        frames = jnp.concatenate(frames_list, axis=1)
        if pad_folds:
            frames = jnp.pad(frames, ((0, 0), (0, pad_folds), (0, 0)))
            if noise_kind is not None:
                noise = jax.tree_util.tree_map(
                    lambda u: jnp.pad(
                        u, ((0, 0), (0, pad_folds)) + ((0, 0),) * (u.ndim - 2),
                        constant_values=0.5), noise)
        samples = sharded(params, phi, frames, keys, sparse_arrays,
                          noise)[:total_folds]
        return _multi_post_jit(samples, counts, wave_lens, overlap, mu_law,
                               voc, dsp, tail_fade)

    return run


def generate_multi_sharded(params, mels_list, voc: WaveRNNConfig,
                           dsp: DSPConfig, key, mesh,
                           target: Optional[int] = None,
                           overlap: Optional[int] = None, mu_law: bool = True,
                           use_pallas: bool = False, interpret: bool = False,
                           tail_fade: bool = True, sparse_packed=None,
                           noise=None):
    """Batched multi-utterance serving on a device mesh: the
    models.wavernn.generate_multi contract (list of mels -> list of
    device waveforms) with the combined fold batch laid out on the mesh's
    ``data`` axis via shard_map.  Requires hop-multiple target/overlap
    (the reference defaults).  Compiles once per (lengths, config) —
    bucket utterance lengths upstream like generate_multi.

    ``noise``: optional injected sampling noise over the COMBINED fold
    batch, time-major like generate_scan (RAW: (L, total_folds,
    n_classes); MOL: (u_mix, u_s)) — with it, output is bit-identical to
    the single-device generate_multi under the same noise regardless of
    mesh size (tests/test_serving_mesh.py)."""
    from jax.sharding import Mesh

    import numpy as np

    from ..models.wavernn import _fused_cond_ok

    target = voc.target if target is None else target
    overlap = voc.overlap if overlap is None else overlap
    mu_law = mu_law if voc.mode == "RAW" else False
    assert _fused_cond_ok(voc, dsp, target, overlap), (
        "generate_multi_sharded needs hop-multiple target/overlap")
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    sparse_static, sparse_arrays = sparse_packed or ((), ())

    mels_d = tuple(jnp.asarray(m)[0] if jnp.asarray(m).ndim == 3
                   else jnp.asarray(m) for m in mels_list)
    frames_t = tuple(int(m.shape[-1]) for m in mels_d)
    noise_kind = (None if noise is None
                  else ("mol" if isinstance(noise, tuple) else "raw"))
    cache_key = (mesh, voc, dsp, target, overlap, frames_t, mu_law,
                 use_pallas, interpret, sparse_static, tail_fade, noise_kind)
    prog = _MULTI_SHARDED_CACHE.get(cache_key)
    if prog is None:
        while len(_MULTI_SHARDED_CACHE) >= 32:
            _MULTI_SHARDED_CACHE.pop(next(iter(_MULTI_SHARDED_CACHE)))
        prog = _MULTI_SHARDED_CACHE.setdefault(
            cache_key, _multi_sharded_prog(mesh, voc, dsp, target, overlap,
                                           frames_t, mu_law, use_pallas,
                                           interpret, sparse_static,
                                           tail_fade, noise_kind))
    n = mesh.shape["data"]
    keys = jnp.broadcast_to(key, (n,) + key.shape)
    if noise is None:
        noise = jnp.zeros((0,))   # placeholder leaf for the jit signature
    return list(prog(params, jnp.asarray(_fused_setup_phi(params, voc)),
                     mels_d, keys, sparse_arrays, noise))
