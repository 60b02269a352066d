"""Polyphase upsampler equivalence + fused-conditioning kernel parity.

The fused kernel (ops/pallas_gen.py:generate_pallas_fused) replaces the
materialize-upsample-fold pipeline for batched generation
(fatchord_version.py:169-264); these tests pin (a) the polyphase rewrite of
the upsampler and (b) full-pipeline waveform parity against the
materialized path under identical injected noise.
"""
import numpy as np
import jax
import jax.numpy as jnp

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.ops import fold as F
from wavernn_tpu.ops import polyphase as P

DSP = DSPConfig()


def _cfg(mode="MOL"):
    return WaveRNNConfig(mode=mode, rnn_dims=64, fc_dims=64, compute_dims=16,
                         res_out_dims=32, res_blocks=1, pad=2,
                         upsample_factors=(5, 5, 11))


def test_geometry_matches_defaults():
    geo = P.geometry((5, 5, 11), pad=2)
    assert geo.hop == 275
    assert geo.lead == 341 and geo.h_len == 957
    assert geo.d_lo == 0 and geo.K == 5
    assert geo.indent == 550


def test_polyphase_equals_conv_stack(rng):
    """phi-table reconstruction == the stretch+depthwise-conv upsampler."""
    voc = _cfg()
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    T = 12
    mels = jnp.asarray(rng.uniform(0, 1, (1, DSP.num_mels, T)).astype(np.float32))
    mels_p = jnp.pad(mels, ((0, 0), (0, 0), (voc.pad, voc.pad)))

    want, _, _ = wr.upsample_apply(params["upsample"], mels_p, voc,
                                   training=False)
    got = P.upsample_polyphase(params["upsample"]["up_convs"], mels_p,
                               voc.upsample_factors, voc.pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_folded_frames_layout(rng):
    """Row f of the folded frame array holds frame b*stride + f + d_lo."""
    geo = P.geometry((5, 5, 11), pad=2)
    T = 10
    total_len = T * geo.hop
    target, overlap = 4 * geo.hop, geo.hop
    num_folds, stride_f, fold_chunks, _ = P.fold_geometry(
        total_len, target, overlap, geo.hop)
    mel_fr = jnp.asarray(rng.randn(T + 4, 3).astype(np.float32))
    aux_fr = jnp.asarray(rng.randn(T, 2).astype(np.float32))
    fr = np.asarray(P.build_folded_frames(mel_fr, aux_fr, num_folds,
                                          stride_f, fold_chunks, geo.K,
                                          geo.d_lo))
    assert fr.shape == (fold_chunks + geo.K - 1, num_folds, 5)
    for b in range(num_folds):
        for f in range(fr.shape[0]):
            g = b * stride_f + f + geo.d_lo
            want_m = mel_fr[g] if 0 <= g < T + 4 else np.zeros(3)
            want_a = aux_fr[g] if 0 <= g < T else np.zeros(2)
            np.testing.assert_allclose(fr[f, b, :3], want_m)
            np.testing.assert_allclose(fr[f, b, 3:], want_a)


def _fused_vs_materialized(mode, rng):
    """Full-pipeline parity: fused kernel vs upsample+fold+kernel, same
    injected noise, interpret mode; compared on the trimmed waveform (the
    paths legitimately differ in the last fold's discarded zero-pad tail).
    """
    from wavernn_tpu.ops.pallas_gen import generate_pallas, generate_pallas_fused

    voc = _cfg(mode)
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    geo = P.geometry(voc.upsample_factors, voc.pad)
    T_frames = 14
    target, overlap = 4 * geo.hop, geo.hop        # 3 folds
    total_len = T_frames * geo.hop

    mels = jnp.asarray(
        rng.uniform(0, 1, (1, DSP.num_mels, T_frames)).astype(np.float32))
    mels_p = jnp.pad(mels, ((0, 0), (0, 0), (voc.pad, voc.pad)))

    num_folds, stride_f, fold_chunks, fold_len = P.fold_geometry(
        total_len, target, overlap, geo.hop)
    B = num_folds
    if mode == "MOL":
        nr_mix = voc.n_classes(DSP.bits) // 3
        noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B, nr_mix))
                             .astype(np.float32)),
                 jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B))
                             .astype(np.float32)))
    else:
        noise = jnp.asarray(
            rng.uniform(1e-5, 1 - 1e-5,
                        (fold_len, B, voc.n_classes(DSP.bits)))
            .astype(np.float32))

    # materialized reference path
    mels_up, aux, _ = wr.upsample_apply(params["upsample"], mels_p, voc,
                                        training=False)
    mf = F.fold_with_overlap(mels_up, target, overlap)
    af = F.fold_with_overlap(aux, target, overlap)
    want = np.asarray(generate_pallas(params, mf, af, voc, DSP.bits,
                                      jax.random.PRNGKey(0), noise=noise,
                                      chunk=geo.hop,
                                      compute_dtype=jnp.float32,
                                      interpret=True))

    # fused path
    phi = P.phi_table(params["upsample"]["up_convs"], voc.upsample_factors,
                      geo)
    aux_fr, _ = wr.melresnet_apply(params["upsample"]["resnet"], mels_p,
                                   training=False)
    frames = P.build_folded_frames(
        jnp.swapaxes(mels_p[0], 0, 1), jnp.swapaxes(aux_fr[0], 0, 1),
        num_folds, stride_f, fold_chunks, geo.K, geo.d_lo)
    got = np.asarray(generate_pallas_fused(
        params, frames, phi, voc, DSP.bits, jax.random.PRNGKey(0),
        geo.hop, -geo.d_lo, fold_chunks, noise=noise,
        compute_dtype=jnp.float32, interpret=True))

    assert got.shape == want.shape == (B, fold_len)
    # compare only samples that survive xfade+trim: global index < total_len
    for b in range(B):
        valid = min(fold_len, max(0, total_len - b * (target + overlap)))
        np.testing.assert_allclose(got[b, :valid], want[b, :valid],
                                   atol=2e-4,
                                   err_msg=f"fold {b} ({valid} valid)")


def test_fused_kernel_matches_materialized_mol(rng):
    _fused_vs_materialized("MOL", rng)


def test_fused_kernel_matches_materialized_raw(rng):
    _fused_vs_materialized("RAW", rng)


def test_generate_fast_uses_fused_and_matches_scan_pipeline(rng):
    """generate_fast (fused branch) vs the scan pipeline on the final
    trimmed waveform — same key drives identical sampling noise."""
    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    T_frames = 14
    mels = rng.uniform(0, 1, (1, DSP.num_mels, T_frames)).astype(np.float32)
    target, overlap = 4 * 275, 275
    assert wr._fused_cond_ok(voc, DSP, target, overlap)

    fold_len = target + 2 * overlap
    B = F.num_folds_for(T_frames * 275, target, overlap)
    nr_mix = voc.n_classes(DSP.bits) // 3
    noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B, nr_mix))
                         .astype(np.float32)),
             jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B))
                         .astype(np.float32)))
    got = np.asarray(wr.generate_fast(params, mels, voc, DSP,
                                      jax.random.PRNGKey(5), target=target,
                                      overlap=overlap, use_pallas=True,
                                      interpret=True, noise=noise,
                                      compute_dtype=jnp.float32))
    want = np.asarray(wr.generate_fast(params, mels, voc, DSP,
                                       jax.random.PRNGKey(5), target=target,
                                       overlap=overlap, use_pallas=False,
                                       noise=noise))
    assert got.shape == want.shape
    # identical noise => lockstep trajectories up to matmul-order rounding
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_generate_multi_fused_matches_materialized(rng):
    """Serving path on the fused kernel (per-utterance frame folds, one
    launch) vs the materialized upsample+fold kernel path, identical
    injected noise across the concatenated fold batch."""
    from wavernn_tpu.ops.fold import num_folds_for

    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(3), voc, DSP)
    target, overlap = 2200, 550
    fold_len = target + 2 * overlap
    frames = (30, 45, 24)
    mels_list = [rng.uniform(0, 1, (DSP.num_mels, f)).astype(np.float32)
                 for f in frames]
    B_total = sum(num_folds_for(f * DSP.hop_length, target, overlap)
                  for f in frames)
    nr_mix = voc.n_classes(DSP.bits) // 3
    noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5,
                                     (fold_len, B_total, nr_mix))
                         .astype(np.float32)),
             jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B_total))
                         .astype(np.float32)))
    got = wr.generate_multi(params, mels_list, voc, DSP,
                            jax.random.PRNGKey(0), target=target,
                            overlap=overlap, use_pallas=True, interpret=True,
                            noise=noise)
    want = wr.generate_multi(params, mels_list, voc, DSP,
                             jax.random.PRNGKey(0), target=target,
                             overlap=overlap, use_pallas=False, noise=noise)
    assert len(got) == len(want) == 3
    for mel, g, w in zip(mels_list, got, want):
        assert g.shape == w.shape == ((mel.shape[1] - 1) * DSP.hop_length,)
        np.testing.assert_allclose(g, w, atol=2e-3)


def test_tts_to_wav_fast_cpu(rng):
    """Device-resident serving path: bucket selection + trimming produce a
    valid waveform whose length tracks the stop step."""
    import dataclasses

    from wavernn_tpu.config import Config
    from wavernn_tpu.models import tacotron as taco
    from wavernn_tpu.synthesis import tts_to_wav_fast

    cfg = Config()
    tts = dataclasses.replace(cfg.tts, embed_dims=16, encoder_dims=128,
                              decoder_dims=256, postnet_dims=16, encoder_K=2,
                              lstm_dims=32, postnet_K=2, num_highways=1)
    cfg = dataclasses.replace(
        cfg, tts=tts, voc=dataclasses.replace(
            cfg.voc, rnn_dims=32, fc_dims=32, compute_dims=16,
            res_out_dims=32, res_blocks=1))
    tp = taco.init_tacotron(jax.random.PRNGKey(0), cfg.tts, cfg.dsp.num_mels)
    vp = wr.init_wavernn(jax.random.PRNGKey(1), cfg.voc, cfg.dsp)
    wav, mel = tts_to_wav_fast(tp, vp, "hello world", cfg, r=2, steps=64,
                               mel_buckets=(16, 32, 64), use_pallas=False)
    assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
    assert mel.shape[0] == cfg.dsp.num_mels
    # wav trimmed to the valid mel length
    assert wav.shape[0] == (mel.shape[1] - 1) * cfg.dsp.hop_length


def test_tts_to_wav_batch_cpu(rng):
    """Batched text->wav serving (one masked decode + one batched vocoder
    launch): per-utterance outputs are sane, track each stop step, and the
    decoded mels match the SOLO fast path exactly (the decode is
    deterministic and pad-masked — the round-3 pad-attention bug would
    break this for the short sentence)."""
    import dataclasses

    from wavernn_tpu.config import Config
    from wavernn_tpu.models import tacotron as taco
    from wavernn_tpu.synthesis import tts_to_wav_batch, tts_to_wav_fast

    cfg = Config()
    tts = dataclasses.replace(cfg.tts, embed_dims=16, encoder_dims=128,
                              decoder_dims=256, postnet_dims=16, encoder_K=2,
                              lstm_dims=32, postnet_K=2, num_highways=1)
    cfg = dataclasses.replace(
        cfg, tts=tts, voc=dataclasses.replace(
            cfg.voc, rnn_dims=32, fc_dims=32, compute_dims=16,
            res_out_dims=32, res_blocks=1))
    tp = taco.init_tacotron(jax.random.PRNGKey(0), cfg.tts, cfg.dsp.num_mels)
    vp = wr.init_wavernn(jax.random.PRNGKey(1), cfg.voc, cfg.dsp)
    texts = ["hi", "a much longer sentence to synthesize", "medium one"]
    outs = tts_to_wav_batch(tp, vp, texts, cfg, r=2, steps=64,
                            mel_buckets=(16, 32, 64), use_pallas=False,
                            key=jax.random.PRNGKey(7))
    assert len(outs) == 3
    for text, (wav, mel) in zip(texts, outs):
        assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
        assert mel.shape[0] == cfg.dsp.num_mels
        assert wav.shape[0] == (mel.shape[1] - 1) * cfg.dsp.hop_length
        # the deterministic decode half must equal the solo fast path
        _, mel_solo = tts_to_wav_fast(tp, vp, text, cfg, r=2, steps=64,
                                      mel_buckets=(16, 32, 64),
                                      use_pallas=False,
                                      key=jax.random.PRNGKey(7))
        assert mel.shape == mel_solo.shape  # same stop step as alone
        np.testing.assert_allclose(mel, mel_solo, atol=2e-5)


def test_tts_to_wav_batch_device_out(rng):
    """device_out returns (device wav trimmed to true length, T_valid)
    pairs whose host export matches the host path up to the deferred tail
    fade (the serving protocol the tts-batch bench measures)."""
    import dataclasses

    from wavernn_tpu.config import Config
    from wavernn_tpu.models import tacotron as taco
    from wavernn_tpu.synthesis import tts_to_wav_batch

    cfg = Config()
    tts = dataclasses.replace(cfg.tts, embed_dims=16, encoder_dims=128,
                              decoder_dims=256, postnet_dims=16, encoder_K=2,
                              lstm_dims=32, postnet_K=2, num_highways=1)
    cfg = dataclasses.replace(
        cfg, tts=tts, voc=dataclasses.replace(
            cfg.voc, rnn_dims=32, fc_dims=32, compute_dims=16,
            res_out_dims=32, res_blocks=1))
    tp = taco.init_tacotron(jax.random.PRNGKey(0), cfg.tts, cfg.dsp.num_mels)
    vp = wr.init_wavernn(jax.random.PRNGKey(1), cfg.voc, cfg.dsp)
    texts = ["hi", "slightly longer sentence"]
    kw = dict(steps=64, mel_buckets=(16, 32, 64), use_pallas=False,
              key=jax.random.PRNGKey(7))
    host = tts_to_wav_batch(tp, vp, texts, cfg, r=2, **kw)
    dev = tts_to_wav_batch(tp, vp, texts, cfg, r=2, device_out=True, **kw)
    for (wav_h, mel_h), (wav_d, T_valid) in zip(host, dev):
        assert T_valid == mel_h.shape[1]
        wav_d = np.asarray(wav_d)
        assert wav_d.shape == wav_h.shape
        n_fade = min(20 * cfg.dsp.hop_length, wav_d.shape[0])
        # identical before the host-side tail fade; the fade region is the
        # caller's job in device_out mode
        np.testing.assert_allclose(wav_d[:-n_fade], wav_h[:-n_fade],
                                   atol=1e-6)


def test_fused_state_kernel_matches_materialized_state(rng):
    """Fused state-I/O kernel vs the materialized state kernel: same
    samples, same boundary snapshot, honors init_state (interpret mode,
    shared injected noise)."""
    from wavernn_tpu.ops.pallas_gen import (generate_pallas_fused_with_state,
                                            generate_pallas_with_state)

    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    geo = P.geometry(voc.upsample_factors, voc.pad)
    T_frames = 14
    target, overlap = 4 * geo.hop, geo.hop
    total_len = T_frames * geo.hop
    mels = jnp.asarray(
        rng.uniform(0, 1, (1, DSP.num_mels, T_frames)).astype(np.float32))
    mels_p = jnp.pad(mels, ((0, 0), (0, 0), (voc.pad, voc.pad)))
    num_folds, stride_f, fold_chunks, fold_len = P.fold_geometry(
        total_len, target, overlap, geo.hop)
    B = num_folds
    nr_mix = voc.n_classes(DSP.bits) // 3
    noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B, nr_mix))
                         .astype(np.float32)),
             jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B))
                         .astype(np.float32)))
    h1 = jnp.asarray(rng.randn(B, voc.rnn_dims).astype(np.float32)) * 0.1
    h2 = jnp.asarray(rng.randn(B, voc.rnn_dims).astype(np.float32)) * 0.1
    x0 = jnp.asarray(rng.uniform(-1, 1, (B,)).astype(np.float32))
    snap_at = target + overlap

    mels_up, aux, _ = wr.upsample_apply(params["upsample"], mels_p, voc,
                                        training=False)
    mf = F.fold_with_overlap(mels_up, target, overlap)
    af = F.fold_with_overlap(aux, target, overlap)
    want, want_snap = generate_pallas_with_state(
        params, mf, af, voc, DSP.bits, jax.random.PRNGKey(0), noise=noise,
        chunk=geo.hop, compute_dtype=jnp.float32, interpret=True,
        init_state=(h1, h2, x0), state_snapshot_at=snap_at)

    phi = P.phi_table(params["upsample"]["up_convs"], voc.upsample_factors,
                      geo)
    aux_fr, _ = wr.melresnet_apply(params["upsample"]["resnet"], mels_p,
                                   training=False)
    frames = P.build_folded_frames(
        jnp.swapaxes(mels_p[0], 0, 1), jnp.swapaxes(aux_fr[0], 0, 1),
        num_folds, stride_f, fold_chunks, geo.K, geo.d_lo)
    got, got_snap = generate_pallas_fused_with_state(
        params, frames, phi, voc, DSP.bits, jax.random.PRNGKey(0),
        geo.hop, -geo.d_lo, fold_chunks, noise=noise,
        compute_dtype=jnp.float32, interpret=True, init_state=(h1, h2, x0),
        state_snapshot_at=snap_at)

    for b in range(B):
        valid = min(fold_len, max(0, total_len - b * (target + overlap)))
        np.testing.assert_allclose(np.asarray(got)[b, :valid],
                                   np.asarray(want)[b, :valid], atol=2e-4)
    # boundary snapshot: the snapshot step (target+overlap) lies inside the
    # valid region of every fold except the last, whose conditioning
    # legitimately differs in the discarded tail
    for a, b_ in zip(got_snap, want_snap):
        np.testing.assert_allclose(np.asarray(a)[:-1], np.asarray(b_)[:-1],
                                   atol=2e-4)


def test_tts_to_wav_fast_single_tail_fade(rng):
    """Regression: when the utterance never stops, T_valid == steps ==
    bucket and the vocoder's own bucket-end fade would overlap the host
    fade — the real tail must be attenuated by exactly ONE linear fade
    (generate_fast is called with tail_fade=False)."""
    import dataclasses

    from wavernn_tpu.config import Config
    from wavernn_tpu.models import tacotron as taco
    from wavernn_tpu.synthesis import tts_to_wav_fast

    cfg = Config()
    tts = dataclasses.replace(cfg.tts, embed_dims=16, encoder_dims=128,
                              decoder_dims=256, postnet_dims=16, encoder_K=2,
                              lstm_dims=32, postnet_K=2, num_highways=1)
    cfg = dataclasses.replace(
        cfg, tts=tts, voc=dataclasses.replace(
            cfg.voc, rnn_dims=32, fc_dims=32, compute_dims=16,
            res_out_dims=32, res_blocks=1))
    tp = taco.init_tacotron(jax.random.PRNGKey(0), cfg.tts, cfg.dsp.num_mels)
    vp = wr.init_wavernn(jax.random.PRNGKey(1), cfg.voc, cfg.dsp)
    key = jax.random.PRNGKey(7)
    steps = 64
    wav, mel = tts_to_wav_fast(tp, vp, "hello world", cfg, r=2, steps=steps,
                               mel_buckets=(16, 32, 64), use_pallas=False,
                               key=key)
    assert mel.shape[1] == steps  # never stopped: T_valid == bucket == steps

    # reference: same vocoder run without any device fade, trimmed, then
    # one host linear fade — what the serving path must equal
    _, k_voc = jax.random.split(key)
    raw = np.asarray(wr.generate_fast(vp, jnp.asarray(mel)[None], cfg.voc,
                                      cfg.dsp, k_voc, mu_law=cfg.dsp.mu_law,
                                      use_pallas=False, tail_fade=False))
    want = raw[: wav.shape[0]].copy()
    n_fade = min(20 * cfg.dsp.hop_length, want.shape[0])
    want[-n_fade:] *= np.linspace(1.0, 0.0, n_fade, dtype=want.dtype)
    np.testing.assert_allclose(wav, want, atol=1e-6)
