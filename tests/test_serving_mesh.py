"""The serving layer on a device mesh (VERDICT r4 weak #6): batched
multi-utterance vocoding via shard_map (parallel.gen_sharded.
generate_multi_sharded), the batched text->wav path with `mesh=`, and
MultiStreamVocoder lanes laid out on the data axis — all on the 8-virtual-
device CPU mesh the suite runs under (conftest).

The reference has no serving layer at all; these paths are what
docs/SERVING.md ships, so their multi-chip evidence must cover them, not
just the train steps (MULTICHIP_r05).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from wavernn_tpu.config import Config, DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.parallel.gen_sharded import generate_multi_sharded

DSP = DSPConfig()


def _voc(mode="RAW"):
    return WaveRNNConfig(mode=mode, rnn_dims=64, fc_dims=64, compute_dims=16,
                         res_out_dims=32, res_blocks=1, pad=2,
                         upsample_factors=(5, 5, 11), target=550, overlap=275)


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


def _fold_count(voc, n_frames):
    from wavernn_tpu.ops import polyphase as Po
    return Po.fold_geometry(n_frames * DSP.hop_length, voc.target,
                            voc.overlap, DSP.hop_length)[0]


def test_multi_sharded_mesh_size_invariant(rng):
    """Same batch + same injected noise on a 1-device and an 8-device mesh
    -> identical waveforms (folds are embarrassingly parallel; the shard
    layout must not change the audio)."""
    voc = _voc()
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    frames = [8, 12, 8]
    mels = [jnp.asarray(rng.uniform(0, 1, (DSP.num_mels, f))
                        .astype(np.float32)) for f in frames]
    total_folds = sum(_fold_count(voc, f) for f in frames)
    L = voc.target + 2 * voc.overlap
    n_classes = voc.n_classes(DSP.bits)
    noise = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5,
                                    (L, total_folds, n_classes))
                        .astype(np.float32))

    outs = {}
    for n in (1, 8):
        wavs = generate_multi_sharded(params, mels, voc, DSP,
                                      jax.random.PRNGKey(0), _mesh(n),
                                      use_pallas=False, noise=noise)
        outs[n] = [np.asarray(w) for w in wavs]

    assert len(outs[1]) == len(frames)
    for w1, w8, f in zip(outs[1], outs[8], frames):
        assert w1.shape == ((f - 1) * DSP.hop_length,)
        assert np.all(np.isfinite(w8))
        np.testing.assert_allclose(w8, w1, atol=1e-5)


def test_multi_sharded_prng_mode_runs(rng):
    """Production mode (no injected noise): per-shard PRNG keys, finite
    nontrivial audio of the right lengths."""
    voc = _voc()
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    frames = [8, 10]
    mels = [jnp.asarray(rng.uniform(0, 1, (DSP.num_mels, f))
                        .astype(np.float32)) for f in frames]
    wavs = generate_multi_sharded(params, mels, voc, DSP,
                                  jax.random.PRNGKey(3), _mesh(8),
                                  use_pallas=False)
    for w, f in zip(wavs, frames):
        w = np.asarray(w)
        assert w.shape == ((f - 1) * DSP.hop_length,)
        assert np.all(np.isfinite(w)) and w.std() > 0


def test_tts_to_wav_batch_on_mesh(rng):
    """tts_to_wav_batch(mesh=...): the decode runs GSPMD over the sentence
    batch and must produce the same mels as the single-device scan decode;
    the vocoder stage returns well-formed audio for every sentence."""
    from wavernn_tpu.config import TacotronConfig
    from wavernn_tpu.models import tacotron as taco
    from wavernn_tpu.synthesis import tts_to_wav_batch

    cfg = Config(voc=_voc(),
                 tts=TacotronConfig(embed_dims=32, encoder_dims=128,
                                    decoder_dims=256, postnet_dims=16,
                                    encoder_K=2, lstm_dims=32, postnet_K=2,
                                    num_highways=1))
    tparams = taco.init_tacotron(jax.random.PRNGKey(0), cfg.tts,
                                 cfg.dsp.num_mels)
    vparams = wr.init_wavernn(jax.random.PRNGKey(1), cfg.voc, cfg.dsp)
    texts = ["hello world", "a longer test sentence here", "ok",
             "four sentences now"]
    r = 2
    kw = dict(key=jax.random.PRNGKey(7), steps=4 * r, mel_buckets=(8,),
              use_pallas=False)
    ref = tts_to_wav_batch(tparams, vparams, texts, cfg, r, **kw)
    got = tts_to_wav_batch(tparams, vparams, texts, cfg, r, mesh=_mesh(8),
                           **kw)
    assert len(got) == len(texts)
    for (w_r, mel_r), (w_g, mel_g) in zip(ref, got):
        np.testing.assert_allclose(np.asarray(mel_g), np.asarray(mel_r),
                                   atol=1e-4)
        assert np.asarray(w_g).shape == np.asarray(w_r).shape
        assert np.all(np.isfinite(np.asarray(w_g)))


def test_multistream_on_mesh(rng):
    """MultiStreamVocoder with lanes sharded over the mesh: injected noise
    -> audio identical to the unsharded instance, lane for lane."""
    from wavernn_tpu.streaming import MultiStreamVocoder

    voc = _voc()
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    n_streams, chunk_frames = 8, 3
    T_total = 2000
    n_classes = voc.n_classes(DSP.bits)
    noise = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5,
                                    (T_total, n_streams, n_classes))
                        .astype(np.float32))
    feeds = [rng.uniform(0, 1, (DSP.num_mels, 5)).astype(np.float32)
             for _ in range(n_streams)]

    def run(mesh):
        msv = MultiStreamVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                                 n_streams=n_streams,
                                 chunk_frames=chunk_frames,
                                 use_pallas=False, noise=noise, mesh=mesh)
        got = {}
        for b in range(n_streams):
            for s, samp in msv.feed(b, feeds[b]).items():
                got.setdefault(s, []).append(samp)
        for b in range(n_streams):
            for s, samp in msv.flush(b).items():
                if len(samp):
                    got.setdefault(s, []).append(samp)
        return {s: np.concatenate(v) for s, v in got.items()}

    ref = run(None)
    got = run(_mesh(8))
    assert set(got) == set(ref)
    for s in ref:
        np.testing.assert_allclose(got[s], ref[s], atol=1e-5)


def test_multistream_reset_recycles_lane(rng):
    """reset(stream) (ADVICE r4): a flushed lane accepts a new session and
    reproduces a fresh lane's output exactly."""
    from wavernn_tpu.streaming import MultiStreamVocoder

    voc = _voc()
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    n_classes = voc.n_classes(DSP.bits)
    T_total = 2000
    noise = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T_total, 2, n_classes))
                        .astype(np.float32))
    mel = rng.uniform(0, 1, (DSP.num_mels, 5)).astype(np.float32)

    msv = MultiStreamVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                             n_streams=2, chunk_frames=3, use_pallas=False,
                             noise=noise)
    first = [np.asarray(s) for s in
             [msv.feed(0, mel).get(0, np.zeros(0, np.float32)),
              msv.flush(0)[0]]]
    msv.reset(0)
    second = [np.asarray(s) for s in
              [msv.feed(0, mel).get(0, np.zeros(0, np.float32)),
               msv.flush(0)[0]]]
    np.testing.assert_allclose(np.concatenate(second),
                               np.concatenate(first), atol=1e-6)
