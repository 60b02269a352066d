"""Synthesis flows: copy-synthesis and end-to-end text -> wav
(reference gen_wavernn.py:11-65, gen_tacotron.py:142-173)."""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from .config import Config
from .dsp.audio import decode_mu_law, label_2_float, load_wav, save_wav
from .dsp.mel import melspectrogram_np
from .models import tacotron as taco
from .models import wavernn as wr
from .text import text_to_sequence


from .utils.backend import use_pallas_default as _auto_pallas


def gen_testset(params, test_set, samples: int, batched: bool, target: int,
                overlap: int, save_path: Path, cfg: Config, step: int = 0,
                key=None, log=print, use_pallas=None, sparse_packed=None):
    """Copy-synthesis of held-out items (gen_wavernn.py:11-35): saves the
    decoded ground-truth next to the model output.
    sparse_packed: one-time ops.pallas_gen.pack_sparse output — serve a
    block-pruned checkpoint through the sparse kernel schedule."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k = step // 1000
    save_path = Path(save_path)
    for i in range(min(samples, len(test_set))):
        m, x = test_set[i]
        log(f"| Generating: {i + 1}/{samples}")
        bits = 16 if cfg.voc.mode == "MOL" else cfg.dsp.bits
        if cfg.dsp.mu_law and cfg.voc.mode != "MOL":
            gt = decode_mu_law(x, 2 ** bits, from_labels=True)
        else:
            gt = label_2_float(x.astype(np.float64), bits)
        save_wav(gt, save_path / f"{k}k_steps_{i + 1}_target.wav",
                 cfg.dsp.sample_rate)

        batch_str = (f"gen_batched_target{target}_overlap{overlap}"
                     if batched else "gen_NOT_BATCHED")
        out = wr.generate(params, m[None], cfg.voc, cfg.dsp,
                          jax.random.fold_in(key, i), batched=batched,
                          target=target, overlap=overlap,
                          mu_law=cfg.dsp.mu_law,
                          use_pallas=_auto_pallas(use_pallas),
                          sparse_packed=sparse_packed)
        save_wav(out, save_path / f"{k}k_steps_{i + 1}_{batch_str}.wav",
                 cfg.dsp.sample_rate)


def gen_from_file(params, load_path: Path, save_path: Path, batched: bool,
                  target: int, overlap: int, cfg: Config, step: int = 0,
                  key=None, use_pallas=None, sparse_packed=None):
    """Vocode a .wav (re-analyzed) or a saved [0,1] mel .npy
    (gen_wavernn.py:38-65)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    load_path, save_path = Path(load_path), Path(save_path)
    k = step // 1000
    file_name = load_path.stem

    if load_path.suffix == ".wav":
        wav = load_wav(load_path, cfg.dsp.sample_rate)
        save_wav(wav, save_path / f"__{file_name}__{k}k_steps_target.wav",
                 cfg.dsp.sample_rate)
        mel = melspectrogram_np(wav, cfg.dsp)
    elif load_path.suffix == ".npy":
        mel = np.load(load_path)
        if mel.ndim != 2 or mel.shape[0] != cfg.dsp.num_mels:
            raise ValueError(
                f"Expected a numpy array shaped (n_mels, n_hops), got {mel.shape}")
        if mel.max() >= 1.01 or mel.min() <= -0.01:
            raise ValueError(
                f"Expected spectrogram range in [0,1], got "
                f"[{mel.min()}, {mel.max()}]")
    else:
        raise ValueError(f"Expected .wav or .npy, got {load_path.suffix}")

    batch_str = (f"gen_batched_target{target}_overlap{overlap}" if batched
                 else "gen_NOT_BATCHED")
    out = wr.generate(params, mel[None], cfg.voc, cfg.dsp, key,
                      batched=batched, target=target, overlap=overlap,
                      mu_law=cfg.dsp.mu_law,
                      use_pallas=_auto_pallas(use_pallas),
                      sparse_packed=sparse_packed)
    save_wav(out, save_path / f"__{file_name}__{k}k_steps_{batch_str}.wav",
             cfg.dsp.sample_rate)
    return out


def tts_to_wav(tts_params, voc_params, text: str, cfg: Config, r: int,
               key=None, batched: bool = True, steps: int = 2000,
               vocoder: str = "wavernn", gl_iters: int = 32,
               use_pallas=None, target=None, overlap=None,
               sparse_packed=None):
    """Full text -> waveform (gen_tacotron.py:142-173, quick_start.py:88-120).

    Uses the postnet output as the vocoder conditioning (`_, m, attention =
    tts_model.generate(x)`, gen_tacotron.py:145), rescaled [-4,4] -> [0,1].
    Returns (wav, mel, attention).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    x = text_to_sequence(text.strip(), cfg.tts.cleaner_names)
    _, m, attention = taco.generate(tts_params, np.asarray(x), cfg.tts, r,
                                    cfg.dsp.num_mels, steps=steps, key=key)
    m = np.clip((m + 4.0) / 8.0, 0.0, 1.0)

    if vocoder == "wavernn":
        wav = wr.generate(voc_params, m[None], cfg.voc, cfg.dsp,
                          jax.random.fold_in(key, 1), batched=batched,
                          target=cfg.voc.target if target is None else target,
                          overlap=(cfg.voc.overlap if overlap is None
                                   else overlap),
                          mu_law=cfg.dsp.mu_law,
                          use_pallas=_auto_pallas(use_pallas),
                          sparse_packed=sparse_packed)
    elif vocoder == "griffinlim":
        from .dsp.griffinlim import reconstruct_waveform
        wav = reconstruct_waveform(m, cfg.dsp, n_iter=gl_iters)
    else:
        raise ValueError(vocoder)
    return wav, m, attention


def tts_to_wav_batch(tts_params, voc_params, texts, cfg: Config, r: int,
                     key=None, steps: int = 2000,
                     mel_buckets=(256, 512, 1024, 2048),
                     use_pallas=None, target=None, overlap=None,
                     sparse_packed=None, device_out: bool = False,
                     mesh=None):
    """Batched serving: N sentences -> one masked batched Tacotron decode
    -> one batched vocoder launch. The TPU-first answer to the reference's
    one-sentence-at-a-time loop (gen_tacotron.py:142-173).

      * all sentences decode in ONE compiled scan with per-utterance stop
        masks and a pad-masked LSA normalization + length-aware encoder
        (models/tacotron.generate_batch semantics — short utterances decode
        exactly as they would alone);
      * ONE host sync of the N stop steps picks a mel-length bucket per
        utterance (compiled shapes bucket across serving batches);
      * the device-resident postnet mels feed generate_multi: every
        utterance's folds concatenate into ONE fused sample-kernel launch
        (device_out path), post-processing on device;
      * each wav exports trimmed to its true length with the reference's
        tail fade applied at the REAL utterance end.

    Returns a list of (wav float32 numpy, mel numpy (n_mels, T_valid)) —
    or, with device_out=True, a list of (wav device array TRIMMED to the
    true length but NOT tail-faded, T_valid) so a serving loop can defer
    the host export (fade the final 20*hop samples at delivery).

    ``mesh``: optional jax.sharding.Mesh with a ``data`` axis — serve the
    batch SPMD over the mesh: the Tacotron decode runs with the sentence
    batch sharded over ``data`` (masked batched scan; GSPMD partitions
    it), and the vocoder stage routes through
    parallel.gen_sharded.generate_multi_sharded, which lays the COMBINED
    fold batch of all utterances on the mesh via shard_map (fused kernel
    per shard on TPU, polyphase scan twin on CPU meshes).  Same outputs
    as the single-device path under the same key.
    """
    import jax.numpy as jnp

    from .models.tacotron import _generate_kernel_batch, _generate_scan

    key = key if key is not None else jax.random.PRNGKey(0)
    k_mel, k_voc = jax.random.split(key)
    pallas = _auto_pallas(use_pallas)
    seqs = [np.asarray(text_to_sequence(t.strip(), cfg.tts.cleaner_names))
            for t in texts]
    max_len = max(len(s) for s in seqs)
    x = jnp.asarray(np.stack([np.pad(s, (0, max_len - len(s)))
                              for s in seqs]))
    lens = jnp.asarray([len(s) for s in seqs])
    steps = -(-steps // r) * r
    if mesh is not None:
        # SPMD decode: sentence batch on the data axis; the scan decode is
        # pure jnp so GSPMD partitions it (the Pallas batch kernel is a
        # single-chip program — shard_map covers the vocoder stage below).
        # Pad the batch to a mesh multiple (pad rows decode garbage that
        # is sliced away). NOTE: the chunked early exit needs EVERY row —
        # including pad rows — to hit the stop threshold, and a garbage
        # 1-token decode is not guaranteed to go silent, so a padded mesh
        # batch may run the full `steps` bound; keep len(texts) a
        # multiple of the mesh for latency-sensitive serving
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = mesh.shape["data"]
        pad_b = (-len(seqs)) % n_dev
        if pad_b:
            x = jnp.pad(x, ((0, pad_b), (0, 0)))
            lens = jnp.concatenate([lens, jnp.ones((pad_b,), lens.dtype)])
        sh = NamedSharding(mesh, P("data"))
        x = jax.device_put(x, sh)
        lens = jax.device_put(lens, sh)
        _, linear, _, n_valid = _generate_scan(
            tts_params, x, cfg.tts, r, steps, cfg.dsp.num_mels, k_mel,
            text_lens=lens)
        if pad_b:
            linear, n_valid = linear[:len(seqs)], n_valid[:len(seqs)]
    elif pallas and len(seqs) == 1:
        # a 1-sentence "batch" has no padding; the tuned B=1 kernel runs
        # ~2x the batched kernel's per-group cost
        from .models.tacotron import _generate_kernel
        _, linear, _, n_valid = _generate_kernel(
            tts_params, x, cfg.tts, r, steps, cfg.dsp.num_mels, k_mel)
    elif pallas:
        # any batch size: B <= 8 on the sublane-row-packed kernel, larger
        # batches on the lane-stacked kernel where every utterance
        # advances per step (ops/pallas_taco.decode_pallas_{batch,stacked})
        _, linear, _, n_valid = _generate_kernel_batch(
            tts_params, x, lens, cfg.tts, r, steps, cfg.dsp.num_mels, k_mel)
    else:
        _, linear, _, n_valid = _generate_scan(
            tts_params, x, cfg.tts, r, steps, cfg.dsp.num_mels, k_mel,
            text_lens=lens)

    n_valid = np.asarray(n_valid)              # one host sync of N scalars
    buckets = sorted(mel_buckets)
    mels, t_valids = [], []
    for b in range(len(seqs)):
        T_valid = min(int(n_valid[b]) * r, steps)
        bucket = min(next((k for k in buckets if k >= T_valid), steps),
                     steps)
        # postnet output is the conditioning (gen_tacotron.py:145); short
        # utterances pad with the frozen silent frames the decoder produced
        mels.append(jnp.clip((linear[b, :, :bucket] + 4.0) / 8.0, 0.0, 1.0))
        t_valids.append(T_valid)

    if mesh is not None:
        from .parallel.gen_sharded import generate_multi_sharded
        wavs = generate_multi_sharded(voc_params, mels, cfg.voc, cfg.dsp,
                                      k_voc, mesh, target=target,
                                      overlap=overlap, mu_law=cfg.dsp.mu_law,
                                      use_pallas=pallas, tail_fade=False,
                                      sparse_packed=sparse_packed)
    else:
        wavs = wr.generate_multi(voc_params, mels, cfg.voc, cfg.dsp, k_voc,
                                 target=target, overlap=overlap,
                                 mu_law=cfg.dsp.mu_law, use_pallas=pallas,
                                 device_out=True, tail_fade=False,
                                 sparse_packed=sparse_packed)
    outs = []
    for b, (w, T_valid) in enumerate(zip(wavs, t_valids)):
        wave_valid = max(T_valid - 1, 1) * cfg.dsp.hop_length
        if device_out:
            outs.append((w[:wave_valid], T_valid))
            continue
        wav = np.array(np.asarray(w)[:wave_valid], dtype=np.float32)
        n_fade = min(20 * cfg.dsp.hop_length, wave_valid)
        wav[-n_fade:] *= np.linspace(1.0, 0.0, n_fade, dtype=wav.dtype)
        outs.append((wav, np.asarray(mels[b][:, :T_valid])))
    return outs


def tts_to_wav_fast(tts_params, voc_params, text: str, cfg: Config, r: int,
                    key=None, steps: int = 2000,
                    mel_buckets=(256, 512, 1024, 2048),
                    use_pallas=None, target=None, overlap=None,
                    sparse_packed=None):
    """Serving-latency text -> wav: no host round-trip between stages.

    `tts_to_wav` mirrors the reference flow (gen_tacotron.py:142-173):
    decode to numpy, rescale on host, re-upload to the vocoder — three
    device<->host transfers of full padded tensors, which dominates
    single-utterance latency (~200 ms through a remote tunnel vs ~35 ms of
    device compute). This path instead:

      * decodes on device (Pallas decode kernel on TPU, scan elsewhere),
      * syncs ONE scalar (the stop step) to pick the smallest mel-length
        bucket covering the utterance — so vocoder compute tracks utterance
        length instead of the padded `steps` bound, with one cached
        compilation per bucket,
      * rescales [-4,4] -> [0,1] in jnp and feeds the vocoder kernel the
        device-resident mel, exporting only the final trimmed waveform.

    Returns (wav float32 numpy, mel numpy (n_mels, T_valid)).
    """
    import jax.numpy as jnp

    key = key if key is not None else jax.random.PRNGKey(0)
    k_mel, k_voc = jax.random.split(key)
    pallas = _auto_pallas(use_pallas)
    x = jnp.asarray(np.asarray(text_to_sequence(text.strip(),
                                                cfg.tts.cleaner_names)))[None]
    steps = -(-steps // r) * r
    impl = taco._generate_kernel if pallas else taco._generate_scan
    _, linear, _, n_valid = impl(tts_params, x, cfg.tts, r, steps,
                                 cfg.dsp.num_mels, k_mel)

    T_valid = min(int(n_valid[0]) * r, steps)        # one scalar sync
    bucket = next((b for b in sorted(mel_buckets) if b >= T_valid), steps)
    bucket = min(bucket, steps)
    # postnet output is the vocoder conditioning (gen_tacotron.py:145);
    # pad the tail of short utterances with the frozen silent frames the
    # decoder produced anyway (bucket <= steps, so this is a static slice)
    mel01 = jnp.clip((linear[:, :, :bucket] + 4.0) / 8.0, 0.0, 1.0)
    # tail_fade=False: the device fade would land at the BUCKET end; for an
    # utterance ending within 20 frames of the bucket boundary it would
    # overlap the host fade below and double-attenuate the real tail
    wav = wr.generate_fast(voc_params, mel01, cfg.voc, cfg.dsp, k_voc,
                           target=target, overlap=overlap,
                           mu_law=cfg.dsp.mu_law, use_pallas=pallas,
                           tail_fade=False, sparse_packed=sparse_packed)
    wave_valid = max(T_valid - 1, 1) * cfg.dsp.hop_length
    wav = np.array(np.asarray(wav)[:wave_valid])
    # fade the real tail like tts_to_wav / the reference
    # (fatchord_version.py:255-258)
    n_fade = min(20 * cfg.dsp.hop_length, wave_valid)
    wav[-n_fade:] *= np.linspace(1.0, 0.0, n_fade, dtype=wav.dtype)
    return wav, np.asarray(mel01[0, :, :T_valid])
