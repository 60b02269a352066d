import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.ops import fold as F
from wavernn_tpu.ops.sample_loop import generate_scan

DSP = DSPConfig()


def _small_cfg(mode="MOL"):
    return WaveRNNConfig(mode=mode, rnn_dims=32, fc_dims=32, compute_dims=16,
                         res_out_dims=16, res_blocks=2, pad=2,
                         upsample_factors=(5, 5, 11))


def test_fold_with_overlap_parity(reference_modules, rng):
    import torch
    voc = _small_cfg()
    tm = _torch_model(reference_modules, voc)
    x = rng.randn(1, 5000, 7).astype(np.float32)
    ref = tm.fold_with_overlap(torch.tensor(x), target=1000, overlap=100)
    ours = F.fold_with_overlap(jnp.asarray(x), 1000, 100)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=0)


def test_xfade_and_unfold_parity(reference_modules, rng):
    voc = _small_cfg()
    tm = _torch_model(reference_modules, voc)
    y = rng.randn(4, 1000 + 200).astype(np.float64)
    ref = tm.xfade_and_unfold(y.copy(), target=1000, overlap=100)
    ours = F.xfade_and_unfold(y.copy(), 1000, 100)
    np.testing.assert_allclose(ours, ref, atol=0)
    ours_jax = np.asarray(F.xfade_and_unfold_jax(jnp.asarray(y.copy()), 100))
    np.testing.assert_allclose(ours_jax, ref, atol=1e-5)


def _torch_model(reference_modules, voc, mode="MOL"):
    import torch
    torch.manual_seed(0)
    m = reference_modules.wavernn.WaveRNN(
        rnn_dims=voc.rnn_dims, fc_dims=voc.fc_dims, bits=DSP.bits,
        pad=voc.pad, upsample_factors=voc.upsample_factors,
        feat_dims=DSP.num_mels, compute_dims=voc.compute_dims,
        res_out_dims=voc.res_out_dims, res_blocks=voc.res_blocks,
        hop_length=DSP.hop_length, sample_rate=DSP.sample_rate, mode=mode)
    m.eval()
    return m


def test_scan_loop_matches_naive_numpy(rng):
    """lax.scan loop vs a straight per-step numpy re-implementation."""
    voc = _small_cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    B, T = 2, 40
    R = voc.rnn_dims
    a = voc.aux_dims
    mels_up = rng.randn(B, T, DSP.num_mels).astype(np.float32)
    aux = rng.randn(B, T, voc.res_out_dims).astype(np.float32)
    nr_mix = 10
    u_mix = rng.uniform(1e-5, 1 - 1e-5, (T, B, nr_mix)).astype(np.float32)
    u_s = rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32)

    got = np.asarray(generate_scan(params, jnp.asarray(mels_up),
                                   jnp.asarray(aux), voc, DSP.bits,
                                   jax.random.PRNGKey(0),
                                   noise=(jnp.asarray(u_mix), jnp.asarray(u_s))))

    # naive numpy loop mirroring fatchord_version.py:201-241
    p = jax.tree_util.tree_map(np.asarray, params)

    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    def gru_cell(cp, x, h):
        H = h.shape[-1]
        gi = x @ cp["wi"] + cp["bi"]
        gh = h @ cp["wh"] + cp["bh"]
        r = sigmoid(gi[:, :H] + gh[:, :H])
        z = sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = np.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        return (1 - z) * n + z * h

    h1 = np.zeros((B, R), np.float32)
    h2 = np.zeros((B, R), np.float32)
    x = np.zeros((B, 1), np.float32)
    out = []
    for t in range(T):
        m_t = mels_up[:, t]
        a1, a2, a3, a4 = (aux[:, t, i * a:(i + 1) * a] for i in range(4))
        inp = np.concatenate([x, m_t, a1], axis=1) @ p["I"]["w"] + p["I"]["b"]
        h1 = gru_cell(p["rnn1"], inp, h1)
        xr = inp + h1
        h2 = gru_cell(p["rnn2"], np.concatenate([xr, a2], axis=1), h2)
        x2 = xr + h2
        hf = np.maximum(np.concatenate([x2, a3], axis=1) @ p["fc1"]["w"] + p["fc1"]["b"], 0)
        hf = np.maximum(np.concatenate([hf, a4], axis=1) @ p["fc2"]["w"] + p["fc2"]["b"], 0)
        logits = hf @ p["fc3"]["w"] + p["fc3"]["b"]
        # MOL sample with the same noise
        lp = logits[:, :nr_mix]
        am = np.argmax(lp - np.log(-np.log(u_mix[t])), axis=-1)
        means = logits[np.arange(B), nr_mix + am]
        log_s = np.maximum(logits[np.arange(B), 2 * nr_mix + am], np.log(1e-14))
        s = means + np.exp(log_s) * (np.log(u_s[t]) - np.log(1 - u_s[t]))
        s = np.clip(s, -1, 1)
        out.append(s)
        x = s[:, None].astype(np.float32)
    want = np.stack(out, axis=1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_generate_waveform_parity_vs_reference(reference_modules, rng):
    """Full unbatched generation vs the reference with identical noise."""
    import torch
    voc = _small_cfg("MOL")
    tm = _torch_model(reference_modules, voc)
    from wavernn_tpu.compat.torch_import import import_wavernn
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_wavernn(sd, voc, DSP)

    frames = 24  # wave_len must exceed the 20*hop tail fade (fatchord:256)
    T = (frames - 1) * DSP.hop_length  # wave_len
    T_gen = frames * DSP.hop_length    # loop steps after pad trim
    mels = rng.uniform(0, 1, (1, DSP.num_mels, frames)).astype(np.float32)

    nr_mix = 10
    u_mix = rng.uniform(1e-5, 1 - 1e-5, (T_gen, 1, nr_mix)).astype(np.float32)
    u_s = rng.uniform(1e-5, 1 - 1e-5, (T_gen, 1)).astype(np.float32)

    # reference path: intercept uniform_ draws and save_wav
    draws = []
    for t in range(T_gen):
        draws.append(torch.tensor(u_mix[t][None]))  # (1, 1, nr_mix)
        draws.append(torch.tensor(u_s[t][None]))    # (1, 1)
    it = iter(draws)
    orig = torch.Tensor.uniform_

    def fake_uniform_(self, a=0.0, b=1.0, **kw):
        # only intercept the MOL sampler's draws (distinctive range);
        # get_gru_cell's weight-init draws pass through untouched
        if (a, b) == (1e-5, 1.0 - 1e-5):
            self.copy_(next(it).reshape(self.shape))
            return self
        return orig(self, a, b, **kw)

    import sys
    saved = []
    sys.modules["librosa"].output = sys.modules.get("librosa.output")
    sys.modules["librosa.output"].write_wav = \
        lambda path, x, sr: saved.append(x)
    import utils.dsp as ref_dsp
    ref_dsp.save_wav = lambda x, path: saved.append(x)
    reference_modules.wavernn.save_wav = lambda x, path: saved.append(x)

    torch.Tensor.uniform_ = fake_uniform_
    try:
        ref_wav = tm.generate(torch.tensor(mels), "/tmp/ref_gen.wav",
                              batched=False, target=2000, overlap=100,
                              mu_law=False)
    finally:
        torch.Tensor.uniform_ = orig

    wav = wr.generate(params, mels, voc, DSP, jax.random.PRNGKey(0),
                      batched=False, mu_law=False,
                      noise=(jnp.asarray(u_mix), jnp.asarray(u_s)))
    assert wav.shape == ref_wav.shape == (T,)
    np.testing.assert_allclose(wav, ref_wav, atol=5e-4)


def test_generate_batched_runs(rng):
    voc = _small_cfg("RAW")
    params = wr.init_wavernn(jax.random.PRNGKey(2), voc, DSP)
    frames = 40
    mels = rng.uniform(0, 1, (1, DSP.num_mels, frames)).astype(np.float32)
    wav = wr.generate(params, mels, voc, DSP, jax.random.PRNGKey(0),
                      batched=True, target=2200, overlap=550)
    assert wav.shape == ((frames - 1) * DSP.hop_length,)
    # equal-power crossfade of two [-1,1] streams is bounded by sqrt(2)
    assert np.abs(wav).max() <= np.sqrt(2.0)


def test_generate_multi_batches_utterances(rng):
    """Serving path: several utterances vocoded in one kernel batch."""
    voc = _small_cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(3), voc, DSP)
    mels_list = [
        rng.uniform(0, 1, (DSP.num_mels, f)).astype(np.float32)
        for f in (30, 45, 24)
    ]
    outs = wr.generate_multi(params, mels_list, voc, DSP,
                             jax.random.PRNGKey(0), target=2200, overlap=550,
                             use_pallas=False)
    assert len(outs) == 3
    for mel, wav in zip(mels_list, outs):
        assert wav.shape == ((mel.shape[1] - 1) * DSP.hop_length,)
        assert np.isfinite(wav).all()

def test_batched_padded_upsample_matches_single(rng):
    """generate_multi's one-call padded upsample must equal per-utterance
    upsampling on each utterance's valid region (zero frames beyond an
    utterance cannot leak left of its boundary)."""
    import jax.numpy as jnp

    from wavernn_tpu.config import WaveRNNConfig
    voc = WaveRNNConfig(mode="MOL", rnn_dims=32, fc_dims=32, compute_dims=16,
                        res_out_dims=32, res_blocks=1, pad=2,
                        upsample_factors=(5, 5, 11))
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    hop = DSP.hop_length
    frames = [23, 57, 40]
    mels = [rng.uniform(0, 1, (DSP.num_mels, f)).astype(np.float32)
            for f in frames]

    T_max = -(-max(frames) // 64) * 64
    batch = np.zeros((3, DSP.num_mels, T_max), np.float32)
    for i, m in enumerate(mels):
        batch[i, :, :m.shape[-1]] = m
    mels_b = jnp.pad(jnp.asarray(batch), ((0, 0), (0, 0),
                                          (voc.pad, voc.pad)))
    mu_b, au_b, _ = wr._upsample_jit(params["upsample"], mels_b, voc)

    for i, m in enumerate(mels):
        single = jnp.pad(jnp.asarray(m)[None], ((0, 0), (0, 0),
                                                (voc.pad, voc.pad)))
        mu, au, _ = wr.upsample_apply(params["upsample"], single, voc,
                                      training=False)
        valid = frames[i] * hop
        np.testing.assert_allclose(np.asarray(mu_b[i, :valid]),
                                   np.asarray(mu[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(au_b[i, :valid]),
                                   np.asarray(au[0]), atol=1e-5)


def test_generate_multi_device_out_matches_host(rng):
    """device_out=True finishes on device (f32 xfade like generate_fast);
    must match the host-f64 path within float32 tolerance."""
    voc = _small_cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(3), voc, DSP)
    mels_list = [
        rng.uniform(0, 1, (DSP.num_mels, f)).astype(np.float32)
        for f in (30, 45, 24)
    ]
    host = wr.generate_multi(params, mels_list, voc, DSP,
                             jax.random.PRNGKey(0), target=2200, overlap=550,
                             use_pallas=False)
    dev = wr.generate_multi(params, mels_list, voc, DSP,
                            jax.random.PRNGKey(0), target=2200, overlap=550,
                            use_pallas=False, device_out=True)
    assert len(dev) == len(host) == 3
    for h, d in zip(host, dev):
        d = np.asarray(d)
        assert d.dtype == np.float32
        assert d.shape == h.shape
        np.testing.assert_allclose(d, h.astype(np.float32), atol=2e-4)


def test_generate_multi_single_program_fused(rng):
    """device_out + use_pallas: the whole batched pipeline compiles as ONE
    program (pad -> resnet -> fold gather -> fused kernel -> per-utterance
    device xfade). Same kernel + key as the eager fused host path, so the
    waveforms must agree to f32-xfade tolerance."""
    import jax.numpy as jnp

    from wavernn_tpu.ops import polyphase as P

    voc = _small_cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(3), voc, DSP)
    frames_l = (30, 45, 24)
    mels_list = [
        rng.uniform(0, 1, (DSP.num_mels, f)).astype(np.float32)
        for f in frames_l
    ]
    # injected noise over the combined fold batch (in-kernel PRNG is
    # TPU-only; interpret mode must replay)
    target, overlap = 2200, 550
    B_total = sum(P.fold_geometry(f * DSP.hop_length, target, overlap,
                                  DSP.hop_length)[0] for f in frames_l)
    T_fold = target + 2 * overlap
    nr_mix = voc.n_classes(DSP.bits) // 3
    noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5,
                                     (T_fold, B_total, nr_mix))
                         .astype(np.float32)),
             jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T_fold, B_total))
                         .astype(np.float32)))
    host = wr.generate_multi(params, mels_list, voc, DSP,
                             jax.random.PRNGKey(0), target=target,
                             overlap=overlap, use_pallas=True,
                             interpret=True, noise=noise)
    dev = wr.generate_multi(params, mels_list, voc, DSP,
                            jax.random.PRNGKey(0), target=target,
                            overlap=overlap, use_pallas=True,
                            interpret=True, noise=noise, device_out=True)
    assert len(dev) == len(host) == 3
    for h, d in zip(host, dev):
        d = np.asarray(d)
        assert d.shape == h.shape
        np.testing.assert_allclose(d, h.astype(np.float32), atol=2e-4)


def test_generate_multi_tail_fade_opt_out(rng):
    """tail_fade=False must skip the 20*hop end fade in BOTH the host and
    device post-processing paths (bucket-padded callers fade at the true
    utterance end themselves; a fade here would double-attenuate)."""
    import jax.numpy as jnp

    voc = _small_cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(3), voc, DSP)
    mels_list = [rng.uniform(0, 1, (DSP.num_mels, f)).astype(np.float32)
                 for f in (30, 24)]
    kw = dict(target=2200, overlap=550, use_pallas=False)

    for device_out in (False, True):
        faded = wr.generate_multi(params, mels_list, voc, DSP,
                                  jax.random.PRNGKey(0), tail_fade=True,
                                  device_out=device_out, **kw)
        plain = wr.generate_multi(params, mels_list, voc, DSP,
                                  jax.random.PRNGKey(0), tail_fade=False,
                                  device_out=device_out, **kw)
        for wf, wp in zip(faded, plain):
            wf, wp = np.asarray(wf), np.asarray(wp)
            n_fade = 20 * DSP.hop_length
            # identical before the fade window...
            np.testing.assert_allclose(wp[:-n_fade], wf[:-n_fade], atol=1e-6)
            # ...and the faded version attenuates toward zero at the end
            assert abs(wf[-1]) <= 1e-6
            assert not np.allclose(wp[-n_fade:], wf[-n_fade:])
