"""WaveRNN vocoder (fatchord variant) — TPU-native functional implementation.

Mirrors the reference architecture exactly (models/fatchord_version.py:92-167):
  UpsampleNetwork (MelResNet over mel frames + nearest-neighbor stretch with
  averaging convs) -> core stack I -> GRU1 -> GRU2 -> fc1 -> fc2 -> fc3,
  with four 32-dim aux conditioning streams.

Training forward runs the GRUs as lax.scans with the input-side GEMMs hoisted
out of the recurrence (one big MXU matmul over (B*T, ·)).  Sample-by-sample
generation lives in ops/sample_loop.py (lax.scan) and ops/pallas_gen.py
(persistent-weights Pallas kernel).

Parameters are a nested dict pytree; reference checkpoints import via
compat/torch_import.py.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DSPConfig, WaveRNNConfig
from ..ops import layers as L


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init_melresnet(key, in_dims, compute_dims, res_out_dims, res_blocks, pad):
    ks = jax.random.split(key, res_blocks + 2)
    k_size = pad * 2 + 1
    blocks = []
    for i in range(res_blocks):
        kb = jax.random.split(ks[i], 2)
        blocks.append({
            "conv1": L.conv1d_init(kb[0], compute_dims, compute_dims, 1, bias=False),
            "bn1": L.batchnorm_init(compute_dims),
            "conv2": L.conv1d_init(kb[1], compute_dims, compute_dims, 1, bias=False),
            "bn2": L.batchnorm_init(compute_dims),
        })
    return {
        "conv_in": L.conv1d_init(ks[-2], in_dims, compute_dims, k_size, bias=False),
        "bn": L.batchnorm_init(compute_dims),
        "blocks": blocks,
        "conv_out": L.conv1d_init(ks[-1], compute_dims, res_out_dims, 1),
    }


def init_upsample(key, feat_dims, upsample_scales, compute_dims, res_blocks,
                  res_out_dims, pad):
    k_res, *k_up = jax.random.split(key, 1 + len(upsample_scales))
    up_convs = []
    for scale in upsample_scales:
        # reference inits these averaging convs to 1/k (fatchord:78); they
        # remain trainable
        k_size = scale * 2 + 1
        up_convs.append({"w": jnp.full((1, 1, 1, k_size), 1.0 / k_size)})
    return {
        "resnet": init_melresnet(k_res, feat_dims, compute_dims, res_out_dims,
                                 res_blocks, pad),
        "up_convs": up_convs,
    }


def init_wavernn(key, voc: WaveRNNConfig, dsp: DSPConfig):
    n_classes = voc.n_classes(dsp.bits)
    aux = voc.aux_dims
    k = jax.random.split(key, 7)
    return {
        "upsample": init_upsample(k[0], dsp.num_mels, voc.upsample_factors,
                                  voc.compute_dims, voc.res_blocks,
                                  voc.res_out_dims, voc.pad),
        "I": L.linear_init(k[1], dsp.num_mels + aux + 1, voc.rnn_dims),
        "rnn1": L.gru_init(k[2], voc.rnn_dims, voc.rnn_dims),
        "rnn2": L.gru_init(k[3], voc.rnn_dims + aux, voc.rnn_dims),
        "fc1": L.linear_init(k[4], voc.rnn_dims + aux, voc.fc_dims),
        "fc2": L.linear_init(k[5], voc.fc_dims + aux, voc.fc_dims),
        "fc3": L.linear_init(k[6], voc.fc_dims, n_classes),
    }


def num_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params)
               if not isinstance(x, (int, float)))


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def melresnet_apply(p, x, training: bool):
    """x: (B, n_mels, T) -> (B, res_out, T - 2*pad); returns (y, new_p)."""
    new_p = dict(p)
    x = L.conv1d(p["conv_in"], x)
    x, new_p["bn"] = L.batchnorm(p["bn"], x, training)
    x = jax.nn.relu(x)
    new_blocks = []
    for blk in p["blocks"]:
        nb = dict(blk)
        r = x
        x = L.conv1d(blk["conv1"], x)
        x, nb["bn1"] = L.batchnorm(blk["bn1"], x, training)
        x = jax.nn.relu(x)
        x = L.conv1d(blk["conv2"], x)
        x, nb["bn2"] = L.batchnorm(blk["bn2"], x, training)
        x = x + r
        new_blocks.append(nb)
    new_p["blocks"] = new_blocks
    x = L.conv1d(p["conv_out"], x)
    return x, new_p


def _stretch_time(x, scale: int):
    """Nearest-neighbor upsample along the last (time) axis (Stretch2d)."""
    return jnp.repeat(x, scale, axis=-1)


def upsample_apply(p, mels, voc: WaveRNNConfig, training: bool = False):
    """mels: (B, n_mels, T) (already pad-extended by voc.pad at call sites
    that need it) -> (mels_up, aux) with time-major layout:
      mels_up: (B, (T-2*pad)*hop, n_mels); aux: (B, (T-2*pad)*hop, res_out).

    The reference uses Stretch2d + Conv2d(1,1,(1,2s+1)) (fatchord:72-80);
    since that conv applies one shared 1-D kernel to every mel row, it is
    exactly a depthwise conv1d along time — which keeps time on the TPU
    lane axis instead of materialising (.., W, 1)-shaped NCHW tensors that
    pad 128x in VMEM/HBM.
    """
    total_scale = 1
    for s in voc.upsample_factors:
        total_scale *= s
    indent = voc.pad * total_scale

    aux, new_resnet = melresnet_apply(p["resnet"], mels, training)
    aux = _stretch_time(aux, total_scale)

    m = mels  # (B, C, T)
    C = m.shape[1]
    for scale, conv in zip(voc.upsample_factors, p["up_convs"]):
        m = _stretch_time(m, scale)
        k = conv["w"].shape[-1]
        w_dw = jnp.broadcast_to(conv["w"].reshape(1, 1, k), (C, 1, k))
        m = jax.lax.conv_general_dilated(
            m, w_dw, window_strides=(1,), padding=[(scale, scale)],
            dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=C,
            preferred_element_type=m.dtype)
    m = m[:, :, indent:-indent]

    new_p = {"resnet": new_resnet, "up_convs": p["up_convs"]}
    return jnp.swapaxes(m, 1, 2), jnp.swapaxes(aux, 1, 2), new_p


def forward(params, x, mels, voc: WaveRNNConfig, training: bool = False,
            compute_dtype=None, recurrence: str = "scan"):
    """Teacher-forced forward (fatchord_version.py:131-167).

    x: (B, T) previous samples (floats in [-1,1]);
    mels: (B, n_mels, T_mel) conditioning window (includes 2*pad frames).
    compute_dtype: optional narrow dtype (bf16) for the core GRU/FC stack —
    mixed-precision training: the upsampler (BatchNorm batch statistics)
    stays f32, core weights/activations are cast on entry, logits are cast
    back to f32 on exit; master params and gradients remain f32.
    recurrence: "scan" (portable lax.scan GRUs) or "pallas" — the
    persistent-weights training-recurrence kernels with a custom VJP
    (ops/pallas_gru.py; the TPU answer to the reference's cuDNN fused GRU,
    fatchord_version.py:117-119).  With "pallas" the whole core stack runs
    TIME-MAJOR so the kernels' (T, B, ·) streams need no per-layer
    transposes.  "pallas_interpret" = same path in interpret mode (CPU
    parity tests).  Identical math either way.
    Returns (logits (B, T, n_classes), new_params).
    """
    a = voc.aux_dims
    mels_up, aux, new_up = upsample_apply(params["upsample"], mels, voc, training)
    if recurrence != "scan" and training:
        # keep the upsampler's conv backward off the time-major core's
        # transposed cotangents (ops.layers.grad_barrier: XLA otherwise
        # fuses the relayout into the depthwise conv bwd operand at 42x
        # cost — 21 ms of a 33 ms step measured on v5e)
        mels_up = L.grad_barrier(mels_up)
        aux = L.grad_barrier(aux)

    core = {k: params[k] for k in ("I", "rnn1", "rnn2", "fc1", "fc2", "fc3")}
    if compute_dtype is not None:
        cast = lambda t: jax.tree_util.tree_map(
            lambda v: v.astype(compute_dtype), t)
        core = cast(core)
        x, mels_up, aux = (v.astype(compute_dtype)
                           for v in (x, mels_up, aux))
    a1, a2, a3, a4 = (aux[..., i * a:(i + 1) * a] for i in range(4))

    if recurrence != "scan":
        from ..ops.pallas_gru import gru_seq_tm
        interpret = recurrence == "pallas_interpret"
        tm = lambda v: jnp.swapaxes(v, 0, 1)
        h = jnp.concatenate([x[..., None], mels_up, a1], axis=-1)
        h = tm(L.linear(core["I"], h))               # ONE (B,T)->(T,B) flip
        # kernel time-block size: the double-buffered gi/ys/sv streams per
        # block scale with B*chunk — shrink chunk at wide batch so the
        # blocks stay inside the VMEM budget (B=128 at chunk 64 OOMs)
        Bsz = h.shape[1]
        from ..ops.kernel_common import gru_seq_chunk
        ck = gru_seq_chunk(Bsz)
        res = h
        gi1 = h @ core["rnn1"]["wi"] + core["rnn1"]["bi"]
        h = gru_seq_tm(gi1, core["rnn1"]["wh"], core["rnn1"]["bh"],
                       jnp.zeros((h.shape[1], core["rnn1"]["wh"].shape[0]),
                                 h.dtype), ck, interpret)
        h = h + res
        res = h
        gi2 = (jnp.concatenate([h, tm(a2)], axis=-1) @ core["rnn2"]["wi"]
               + core["rnn2"]["bi"])
        h = gru_seq_tm(gi2, core["rnn2"]["wh"], core["rnn2"]["bh"],
                       jnp.zeros((h.shape[1], core["rnn2"]["wh"].shape[0]),
                                 h.dtype), ck, interpret)
        h = h + res
        h = jax.nn.relu(L.linear(core["fc1"],
                                 jnp.concatenate([h, tm(a3)], axis=-1)))
        h = jax.nn.relu(L.linear(core["fc2"],
                                 jnp.concatenate([h, tm(a4)], axis=-1)))
        logits = tm(L.linear(core["fc3"], h)).astype(jnp.float32)
    else:
        h = jnp.concatenate([x[..., None], mels_up, a1], axis=-1)
        h = L.linear(core["I"], h)
        res = h
        h, _ = L.gru(core["rnn1"], h)
        h = h + res
        res = h
        h, _ = L.gru(core["rnn2"], jnp.concatenate([h, a2], axis=-1))
        h = h + res
        h = jax.nn.relu(L.linear(core["fc1"], jnp.concatenate([h, a3], axis=-1)))
        h = jax.nn.relu(L.linear(core["fc2"], jnp.concatenate([h, a4], axis=-1)))
        logits = L.linear(core["fc3"], h).astype(jnp.float32)

    new_params = dict(params)
    new_params["upsample"] = new_up
    return logits, new_params


def _fused_cond_ok(voc: WaveRNNConfig, dsp: DSPConfig, target: int,
                   overlap: int) -> bool:
    """The fused kernel needs folds phase-aligned to mel frames (true for
    the reference defaults: target 11000 / overlap 550 / hop 275)."""
    from ..ops import polyphase as P
    total_scale = 1
    for s in voc.upsample_factors:
        total_scale *= s
    if not (total_scale == dsp.hop_length and target % dsp.hop_length == 0
            and overlap % dsp.hop_length == 0):
        return False
    geo = P.geometry(voc.upsample_factors, voc.pad)
    return 0 <= -geo.d_lo < geo.K  # aux frame-repeat tap must exist



def _fused_setup(params, voc: WaveRNNConfig):
    """(geometry, phi table) for the fused-conditioning kernel."""
    from ..ops import polyphase as P
    geo = P.geometry(voc.upsample_factors, voc.pad)
    phi = P.phi_table(params["upsample"]["up_convs"], voc.upsample_factors,
                      geo)
    return geo, phi


def _fused_fold_frames(mel_frames_T, aux_frames_T, total_len: int,
                       target: int, overlap: int, geo):
    """Folded frame-rate conditioning for one utterance.

    mel_frames_T: (Tp, n_mels) PADDED mel frames; aux_frames_T: (T, 4A)
    resnet output frames. Returns (frames (nf_loc, num_folds, C),
    fold_chunks)."""
    from ..ops import polyphase as P
    num_folds, stride_f, fold_chunks, _ = P.fold_geometry(
        total_len, target, overlap, geo.hop)
    frames = P.build_folded_frames(mel_frames_T, aux_frames_T, num_folds,
                                   stride_f, fold_chunks, geo.K, geo.d_lo)
    return frames, fold_chunks


def _generate_device(params, mels, voc: WaveRNNConfig, dsp: DSPConfig, key,
                     target: int, overlap: int, mu_law: bool,
                     use_pallas: bool, interpret: bool = False,
                     compute_dtype=jnp.bfloat16, noise=None,
                     tail_fade: bool = True, sparse_static=(),
                     sparse_arrays=()):
    """Whole generation pipeline as one XLA program: conditioning ->
    sample loop -> mu-law decode -> equal-power xfade -> tail fade.

    With the fused kernel (the default whenever target/overlap are hop
    multiples), conditioning stays at MEL RATE end to end: the resnet runs
    at frame rate, frames are folded (a few MB), and the kernel applies the
    upsampler's polyphase filter + aux frame-repeat in-register
    (ops/polyphase.py) — no sample-rate mels_up/aux tensors or fold copies
    ever touch HBM.  Otherwise: pad -> upsample -> fold -> sample loop.
    """
    from ..ops import fold as F
    from ..ops import polyphase as P
    from ..ops.sample_loop import generate_scan

    wave_len = (mels.shape[-1] - 1) * dsp.hop_length
    total_len = mels.shape[-1] * dsp.hop_length
    mels = jnp.pad(mels, ((0, 0), (0, 0), (voc.pad, voc.pad)))

    if use_pallas and _fused_cond_ok(voc, dsp, target, overlap):
        from ..ops.pallas_gen import generate_pallas_fused
        geo, phi = _fused_setup(params, voc)
        aux_fr, _ = melresnet_apply(params["upsample"]["resnet"], mels,
                                    training=False)
        frames, fold_chunks = _fused_fold_frames(
            jnp.swapaxes(mels[0], 0, 1), jnp.swapaxes(aux_fr[0], 0, 1),
            total_len, target, overlap, geo)
        samples = generate_pallas_fused(params, frames, phi, voc, dsp.bits,
                                        key, geo.hop, -geo.d_lo, fold_chunks,
                                        noise=noise,
                                        compute_dtype=compute_dtype,
                                        interpret=interpret,
                                        sparse_static=sparse_static,
                                        sparse_arrays=sparse_arrays)
    else:
        mels_up, aux, _ = upsample_apply(params["upsample"], mels, voc,
                                         training=False)
        mels_up = F.fold_with_overlap(mels_up, target, overlap)
        aux = F.fold_with_overlap(aux, target, overlap)
        if use_pallas:
            from ..ops.pallas_gen import (_generate_pallas_impl,
                                          generate_pallas)
            if sparse_static:
                samples = _generate_pallas_impl(
                    params, mels_up, aux, voc, dsp.bits, key, noise, 128,
                    compute_dtype, interpret, with_state=False,
                    init_state=None, state_snapshot_at=None,
                    sparse_static=sparse_static, sparse_arrays=sparse_arrays)
            else:
                samples = generate_pallas(params, mels_up, aux, voc, dsp.bits,
                                          key, noise=noise,
                                          compute_dtype=compute_dtype,
                                          interpret=interpret)
        else:
            samples = generate_scan(params, mels_up, aux, voc, dsp.bits, key,
                                    noise=noise)

    if mu_law and voc.mode == "RAW":
        mu = voc.n_classes(dsp.bits) - 1
        samples = jnp.sign(samples) / mu * ((1 + mu) ** jnp.abs(samples) - 1)

    wav = F.xfade_and_unfold_jax(samples, overlap)[:wave_len]
    if not tail_fade:
        # caller will fade at the true utterance end (e.g. tts_to_wav_fast
        # trims a bucket-padded wav before fading — fading here too would
        # double-attenuate utterances that end within 20 frames of the
        # bucket boundary)
        return wav
    n_fade = 20 * dsp.hop_length
    fade = jnp.linspace(1.0, 0.0, n_fade)
    return wav.at[-n_fade:].multiply(fade[-min(n_fade, wave_len):])


_generate_device_jit = jax.jit(
    _generate_device,
    static_argnames=("voc", "dsp", "target", "overlap", "mu_law",
                     "use_pallas", "interpret", "compute_dtype",
                     "tail_fade", "sparse_static"))


@partial(jax.jit, static_argnames=("voc",))
def _upsample_jit(p_upsample, mels, voc: WaveRNNConfig):
    return upsample_apply(p_upsample, mels, voc, training=False)


def generate_fast(params, mels, voc: WaveRNNConfig, dsp: DSPConfig, key,
                  target: Optional[int] = None, overlap: Optional[int] = None,
                  mu_law: bool = True, use_pallas: bool = True,
                  interpret: bool = False, compute_dtype=jnp.bfloat16,
                  noise=None, tail_fade: bool = True, sparse_packed=None):
    """Production generation path: one jit-compiled program, float32 xfade
    on-device (vs the reference's host float64 loop). Returns (wave_len,)
    float32 on device.

    sparse_packed: (sparse_static, sparse_arrays) from
    ops.pallas_gen.pack_sparse — serves a block-pruned checkpoint through
    the sparse sample-loop schedule (pack once after loading weights)."""
    target = voc.target if target is None else target
    overlap = voc.overlap if overlap is None else overlap
    sparse_static, sparse_arrays = sparse_packed or ((), ())
    return _generate_device_jit(params, jnp.asarray(mels), voc, dsp, key,
                                target, overlap, mu_law, use_pallas,
                                interpret, compute_dtype, noise, tail_fade,
                                sparse_static, sparse_arrays)


def generate_multi(params, mels_list, voc: WaveRNNConfig, dsp: DSPConfig,
                   key, target: Optional[int] = None,
                   overlap: Optional[int] = None, mu_law: bool = True,
                   use_pallas: bool = True, interpret: bool = False,
                   noise=None, device_out: bool = False, sparse_packed=None,
                   tail_fade: bool = True):
    """Serving path: vocode a BATCH of utterances in one sample-loop launch.

    Each utterance is folded (fatchord batched-generation semantics); all
    fold batches share the same (target + 2*overlap) length, so they
    concatenate into one kernel batch.  Returns a list of float64 waveforms.

    device_out=True: the WHOLE pipeline (per-utterance pad -> batched
    MelResNet -> per-utterance fold gather -> one fused sample kernel at
    the combined fold batch -> per-utterance mu-law decode, float32
    equal-power xfade/unfold, trim, tail fade) runs as ONE jit-compiled
    program per (lengths, config), taking the mels as device arrays and
    returning device float32 arrays with any host transfer deferred to
    the caller.

    sparse_packed: (sparse_static, sparse_arrays) from
    ops.pallas_gen.pack_sparse — batched serving of a block-pruned
    checkpoint through the sparse sample-loop schedule (pallas paths).

    tail_fade=False skips the 20*hop end fade: callers that bucket-pad the
    conditioning (synthesis.tts_to_wav_batch) trim each wav to its true
    length first and fade there — fading at the bucket boundary would
    double-attenuate utterances ending near it (see generate_fast). Rationale: the host path exports the folded sample matrix
    (inflated by 2*overlap/target, x2 again as f64) to crossfade in C++,
    and an eager device path still pays ~15 host round trips per call in
    prep stages — either way transport can swamp the batching win. One
    program + device-resident I/O is what lets a batched launch actually
    beat sequential generate_fast calls. NOTE: compiles once per distinct
    tuple of utterance frame counts — bucket lengths upstream if serving
    traffic has high length variance. Falls back to the eager multi-
    dispatch path when the fused-conditioning kernel does not apply
    (non-hop-multiple target/overlap or use_pallas=False).
    """
    import numpy as np

    from ..compat import native
    from ..ops import fold as F
    from ..ops.sample_loop import generate_scan

    target = voc.target if target is None else target
    overlap = voc.overlap if overlap is None else overlap
    mu_law = mu_law if voc.mode == "RAW" else False
    sparse_static, sparse_arrays = sparse_packed or ((), ())

    if (device_out and use_pallas
            and _fused_cond_ok(voc, dsp, target, overlap)):
        frames_t = tuple(int(m.shape[-1]) for m in mels_list)
        cache_key = (voc, dsp, target, overlap, frames_t, mu_law, interpret,
                     sparse_static, tail_fade)
        prog = _MULTI_PROG_CACHE.get(cache_key)
        if prog is None:
            while len(_MULTI_PROG_CACHE) >= _MULTI_PROG_CACHE_MAX:
                # FIFO-evict: unbounded growth would leak one compiled
                # program per distinct frame-count tuple under high
                # length-variance traffic (bucket lengths upstream to avoid
                # recompiles in the first place)
                _MULTI_PROG_CACHE.pop(next(iter(_MULTI_PROG_CACHE)))
            prog = _MULTI_PROG_CACHE.setdefault(
                cache_key, _multi_prog(voc, dsp, target, overlap, frames_t,
                                       mu_law, interpret, sparse_static,
                                       tail_fade))
        mels_d = tuple(jnp.asarray(m)[0] if m.ndim == 3 else jnp.asarray(m)
                       for m in mels_list)
        return list(prog(params, key, mels_d, noise, sparse_arrays))

    # One padded frame-rate pass for the whole batch (not a per-utterance
    # dispatch loop): zero-padding an utterance's frames to T_max cannot
    # change its valid region — every conv in the upsampler sees only zeros
    # to the right of the voc.pad frames either way — and rounding T_max up
    # buckets the compiled shape across serving batches.
    arrs = [np.asarray(m)[0] if np.asarray(m).ndim == 3 else np.asarray(m)
            for m in mels_list]
    frames = [m.shape[-1] for m in arrs]
    T_max = -(-max(frames) // 64) * 64
    batch = np.zeros((len(arrs), arrs[0].shape[0], T_max), np.float32)
    for i, m in enumerate(arrs):
        batch[i, :, :m.shape[-1]] = m
    mels_b = jnp.pad(jnp.asarray(batch), ((0, 0), (0, 0), (voc.pad, voc.pad)))

    wave_lens = [(n - 1) * dsp.hop_length for n in frames]
    if use_pallas and _fused_cond_ok(voc, dsp, target, overlap):
        # fused kernel: per-utterance frame-rate folds concatenate on the
        # fold axis (fold_len is utterance-independent), one kernel launch
        from ..ops.pallas_gen import generate_pallas_fused

        geo, phi = _fused_setup(params, voc)
        aux_b, _ = melresnet_apply(params["upsample"]["resnet"], mels_b,
                                   training=False)
        frames_list, counts = [], []
        for i, n_frames in enumerate(frames):
            fr, fold_chunks = _fused_fold_frames(
                jnp.swapaxes(mels_b[i, :, :n_frames + 2 * voc.pad], 0, 1),
                jnp.swapaxes(aux_b[i, :, :n_frames], 0, 1),
                n_frames * dsp.hop_length, target, overlap, geo)
            frames_list.append(fr)
            counts.append(fr.shape[1])
        samples = generate_pallas_fused(
            params, jnp.concatenate(frames_list, axis=1), phi, voc,
            dsp.bits, key, geo.hop, -geo.d_lo, fold_chunks, noise=noise,
            interpret=interpret, sparse_static=sparse_static,
            sparse_arrays=sparse_arrays)
    else:
        mu_b, au_b, _ = _upsample_jit(params["upsample"], mels_b, voc)
        fold_m, fold_a, counts = [], [], []
        for i, n_frames in enumerate(frames):
            valid = n_frames * dsp.hop_length
            fold_m.append(F.fold_with_overlap(mu_b[i:i + 1, :valid], target,
                                              overlap))
            fold_a.append(F.fold_with_overlap(au_b[i:i + 1, :valid], target,
                                              overlap))
            counts.append(fold_m[-1].shape[0])
        mf = jnp.concatenate(fold_m, axis=0)
        af = jnp.concatenate(fold_a, axis=0)
        if use_pallas:
            from ..ops.pallas_gen import (_generate_pallas_sparse_jit,
                                          generate_pallas)
            if sparse_static:
                samples = _generate_pallas_sparse_jit(
                    params, mf, af, voc, dsp.bits, key, noise, sparse_arrays,
                    chunk=128, compute_dtype=jnp.bfloat16,
                    interpret=interpret, sparse_static=sparse_static)
            else:
                samples = generate_pallas(params, mf, af, voc, dsp.bits, key,
                                          noise=noise, interpret=interpret)
        else:
            samples = generate_scan(params, mf, af, voc, dsp.bits, key,
                                    noise=noise)
    if device_out:
        return list(_multi_post_jit(samples, tuple(counts), tuple(wave_lens),
                                    overlap, mu_law, voc, dsp, tail_fade))
    samples = np.asarray(samples, dtype=np.float64)

    outs = []
    offset = 0
    for count, wave_len in zip(counts, wave_lens):
        y = samples[offset:offset + count]
        offset += count
        if mu_law:
            y = native.decode_mu_law_inplace(y, voc.n_classes(dsp.bits))
        wav = native.xfade_and_unfold(y, target, overlap)[:wave_len]
        outs.append(native.tail_fade_inplace(wav, 20 * dsp.hop_length)
                    if tail_fade else wav)
    return outs


_MULTI_PROG_CACHE: dict = {}
_MULTI_PROG_CACHE_MAX = 32


def _multi_prog(voc: WaveRNNConfig, dsp: DSPConfig, target: int,
                overlap: int, frames_t, mu_law: bool, interpret: bool,
                sparse_static=(), tail_fade: bool = True):
    """ONE compiled program for batched multi-utterance serving: pad each
    utterance to the shared T_max -> batched MelResNet -> per-utterance
    fold gather -> fused sample kernel at the combined fold batch ->
    per-utterance device post-processing. Cached per static config in
    _MULTI_PROG_CACHE (see generate_multi)."""
    from ..ops.pallas_gen import generate_pallas_fused

    pad, hop = voc.pad, dsp.hop_length
    T_max = -(-max(frames_t) // 64) * 64
    wave_lens = tuple((n - 1) * hop for n in frames_t)

    @jax.jit
    def run(params, key, mels, noise, sparse_arrays):
        geo, phi = _fused_setup(params, voc)
        mels_b = jnp.stack(
            [jnp.pad(m, ((0, 0), (0, T_max - m.shape[-1]))) for m in mels])
        mels_b = jnp.pad(mels_b, ((0, 0), (0, 0), (pad, pad)))
        aux_b, _ = melresnet_apply(params["upsample"]["resnet"], mels_b,
                                   training=False)
        frames_list, counts = [], []
        for i, n_frames in enumerate(frames_t):
            fr, fold_chunks = _fused_fold_frames(
                jnp.swapaxes(mels_b[i, :, :n_frames + 2 * pad], 0, 1),
                jnp.swapaxes(aux_b[i, :, :n_frames], 0, 1),
                n_frames * hop, target, overlap, geo)
            frames_list.append(fr)
            counts.append(fr.shape[1])
        samples = generate_pallas_fused(
            params, jnp.concatenate(frames_list, axis=1), phi, voc,
            dsp.bits, key, geo.hop, -geo.d_lo, fold_chunks, noise=noise,
            interpret=interpret, sparse_static=sparse_static,
            sparse_arrays=sparse_arrays)
        return _multi_post_jit(samples, tuple(counts), wave_lens, overlap,
                               mu_law, voc, dsp, tail_fade)

    return run


@partial(jax.jit, static_argnames=("counts", "wave_lens", "overlap",
                                   "mu_law", "voc", "dsp", "tail_fade"))
def _multi_post_jit(samples, counts, wave_lens, overlap: int, mu_law: bool,
                    voc: WaveRNNConfig, dsp: DSPConfig,
                    tail_fade: bool = True):
    """Per-utterance device post-processing for generate_multi: slice the
    shared fold batch, mu-law decode, float32 xfade/unfold + trim + tail
    fade (generate_fast semantics, fatchord_version.py:201-264)."""
    from ..ops import fold as F

    outs = []
    offset = 0
    n_fade = 20 * dsp.hop_length
    fade = jnp.linspace(1.0, 0.0, n_fade)
    for count, wave_len in zip(counts, wave_lens):
        y = samples[offset:offset + count]
        offset += count
        if mu_law:
            mu = voc.n_classes(dsp.bits) - 1
            y = jnp.sign(y) / mu * ((1 + mu) ** jnp.abs(y) - 1)
        wav = F.xfade_and_unfold_jax(y, overlap)[:wave_len]
        if tail_fade:
            wav = wav.at[-n_fade:].multiply(fade[-min(n_fade, wave_len):])
        outs.append(wav)
    return tuple(outs)


def generate(params, mels, voc: WaveRNNConfig, dsp: DSPConfig, key,
             batched: bool = True, target: Optional[int] = None,
             overlap: Optional[int] = None, mu_law: bool = True,
             use_pallas: bool = False, noise=None, sparse_packed=None):
    """End-to-end utterance generation (fatchord_version.py:169-264).

    mels: (1, n_mels, T_frames) normalized mel in [0, 1].
    Returns float64 waveform (wave_len,) with the reference's tail fade-out.
    sparse_packed: see generate_fast (pruned serving; pallas paths only).
    """
    import numpy as np

    from ..compat import native
    from ..ops import fold as F
    from ..ops.sample_loop import generate_scan

    target = voc.target if target is None else target
    overlap = voc.overlap if overlap is None else overlap
    mu_law = mu_law if voc.mode == "RAW" else False

    mels = jnp.asarray(mels)
    wave_len = (mels.shape[-1] - 1) * dsp.hop_length
    total_len = mels.shape[-1] * dsp.hop_length
    # pad ±voc.pad frames so the resnet sees context (fatchord:185)
    mels = jnp.pad(mels, ((0, 0), (0, 0), (voc.pad, voc.pad)))

    if (batched and use_pallas and noise is None
            and _fused_cond_ok(voc, dsp, target, overlap)):
        # fused-conditioning kernel; the float64 host xfade below is shared
        from ..ops.pallas_gen import generate_pallas_fused

        geo, phi = _fused_setup(params, voc)
        aux_fr, _ = melresnet_apply(params["upsample"]["resnet"], mels,
                                    training=False)
        frames, fold_chunks = _fused_fold_frames(
            jnp.swapaxes(mels[0], 0, 1), jnp.swapaxes(aux_fr[0], 0, 1),
            total_len, target, overlap, geo)
        sp_s, sp_a = sparse_packed or ((), ())
        samples = generate_pallas_fused(params, frames, phi, voc, dsp.bits,
                                        key, geo.hop, -geo.d_lo, fold_chunks,
                                        sparse_static=sp_s, sparse_arrays=sp_a)
    else:
        mels_up, aux, _ = upsample_apply(params["upsample"], mels, voc,
                                         training=False)
        if batched:
            mels_up = F.fold_with_overlap(mels_up, target, overlap)
            aux = F.fold_with_overlap(aux, target, overlap)
        if use_pallas:
            from ..ops.pallas_gen import generate_pallas, generate_pallas_sparse
            if sparse_packed and sparse_packed[0]:
                samples = generate_pallas_sparse(params, mels_up, aux, voc,
                                                 dsp.bits, key,
                                                 packed=sparse_packed)
            else:
                samples = generate_pallas(params, mels_up, aux, voc, dsp.bits,
                                          key)
        else:
            samples = generate_scan(params, mels_up, aux, voc, dsp.bits, key,
                                    noise=noise)
    output = np.asarray(samples, dtype=np.float64)

    if mu_law:
        output = native.decode_mu_law_inplace(output, voc.n_classes(dsp.bits))

    if batched:
        output = native.xfade_and_unfold(output, target, overlap)
    else:
        output = output[0]

    output = output[:wave_len]
    output = native.tail_fade_inplace(output, 20 * dsp.hop_length)
    return output
