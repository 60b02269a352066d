import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.models import distribution as dist

DSP = DSPConfig()
VOC_MOL = WaveRNNConfig(mode="MOL")
VOC_RAW = WaveRNNConfig(mode="RAW")


def _small_cfg(mode="MOL"):
    return WaveRNNConfig(mode=mode, rnn_dims=32, fc_dims=32, compute_dims=16,
                         res_out_dims=16, res_blocks=2, pad=2,
                         upsample_factors=(5, 5, 11))


def test_param_count_matches_reference():
    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC_MOL, DSP)
    # trainable only: exclude batchnorm running stats
    n = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "mean" in keys or "var" in keys:
            continue
        n += leaf.size
    assert abs(n - 4_234_530) < 2000, n  # 4.234M (fatchord_version.py:425-430)


def test_forward_shapes():
    voc = _small_cfg()
    params = wr.init_wavernn(jax.random.PRNGKey(0), voc, DSP)
    B, frames = 2, 9  # seq window: (frames - 2*pad) * hop samples
    T = (frames - 2 * voc.pad) * DSP.hop_length
    x = jnp.zeros((B, T))
    mels = jnp.zeros((B, DSP.num_mels, frames))
    logits, new_params = wr.forward(params, x, mels, voc, training=False)
    assert logits.shape == (B, T, 30)


def _torch_ref_model(reference_modules, mode, voc, dsp):
    import torch
    torch.manual_seed(0)
    m = reference_modules.wavernn.WaveRNN(
        rnn_dims=voc.rnn_dims, fc_dims=voc.fc_dims, bits=dsp.bits,
        pad=voc.pad, upsample_factors=voc.upsample_factors,
        feat_dims=dsp.num_mels, compute_dims=voc.compute_dims,
        res_out_dims=voc.res_out_dims, res_blocks=voc.res_blocks,
        hop_length=dsp.hop_length, sample_rate=dsp.sample_rate, mode=mode)
    m.eval()
    return m


@pytest.mark.parametrize("mode", ["MOL", "RAW"])
def test_forward_parity_vs_reference(reference_modules, mode, rng):
    import torch
    from wavernn_tpu.compat.torch_import import import_wavernn
    voc = _small_cfg(mode)
    tm = _torch_ref_model(reference_modules, mode, voc, DSP)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_wavernn(sd, voc, DSP)

    B, frames = 2, 9
    T = (frames - 2 * voc.pad) * DSP.hop_length
    x = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    mels = rng.uniform(0, 1, (B, DSP.num_mels, frames)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(mels)).numpy()
    ours, _ = wr.forward(params, jnp.asarray(x), jnp.asarray(mels), voc,
                         training=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_upsample_parity_vs_reference(reference_modules, rng):
    import torch
    from wavernn_tpu.compat.torch_import import import_wavernn
    voc = _small_cfg()
    tm = _torch_ref_model(reference_modules, "MOL", voc, DSP)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_wavernn(sd, voc, DSP)

    mels = rng.uniform(0, 1, (1, DSP.num_mels, 12)).astype(np.float32)
    with torch.no_grad():
        ref_m, ref_a = tm.upsample(torch.tensor(mels))
    m, a, _ = wr.upsample_apply(params["upsample"], jnp.asarray(mels), voc)
    np.testing.assert_allclose(np.asarray(m), ref_m.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), ref_a.numpy(), atol=1e-5)


def test_mol_loss_parity_vs_reference(reference_modules, rng):
    import torch
    B, T, C = 3, 50, 30
    y_hat = rng.randn(B, T, C).astype(np.float32)
    y = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    # reference signature: y_hat (B, T, C) permuted internally; y (B, T, 1)
    ref = reference_modules.distribution.discretized_mix_logistic_loss(
        torch.tensor(y_hat).transpose(1, 2).unsqueeze(-1).squeeze(-1).permute(0, 2, 1),
        torch.tensor(y).unsqueeze(-1)).item()
    ours = dist.discretized_mix_logistic_loss(jnp.asarray(y_hat), jnp.asarray(y))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_mol_sampler_matches_manual(rng):
    """Sampler with injected noise vs straight numpy math."""
    B, C = 4, 30
    nr_mix = 10
    y = rng.randn(B, C).astype(np.float32)
    u_mix = rng.uniform(1e-5, 1 - 1e-5, (B, nr_mix)).astype(np.float32)
    u_s = rng.uniform(1e-5, 1 - 1e-5, (B,)).astype(np.float32)
    got = np.asarray(dist.sample_from_discretized_mix_logistic_with_noise(
        jnp.asarray(y), jnp.asarray(u_mix), jnp.asarray(u_s)))
    # manual
    logit = y[:, :nr_mix]
    am = np.argmax(logit - np.log(-np.log(u_mix)), axis=-1)
    means = y[np.arange(B), nr_mix + am]
    log_s = np.maximum(y[np.arange(B), 2 * nr_mix + am], dist.LOG_SCALE_MIN)
    want = means + np.exp(log_s) * (np.log(u_s) - np.log(1 - u_s))
    want = np.clip(want, -1, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mol_sampler_parity_vs_reference(reference_modules, rng):
    """Same noise -> same samples as the torch implementation."""
    import torch
    B, T = 2, 7
    nr_mix = 10
    y = rng.randn(B, T, 30).astype(np.float32)
    u_mix = rng.uniform(1e-5, 1 - 1e-5, (B, T, nr_mix)).astype(np.float32)
    u_s = rng.uniform(1e-5, 1 - 1e-5, (B, T)).astype(np.float32)

    # re-derive reference result with the same noise by monkeypatching uniform_
    draws = iter([torch.tensor(u_mix), torch.tensor(u_s)])
    orig = torch.Tensor.uniform_

    def fake_uniform_(self, a=0.0, b=1.0):
        self.copy_(next(draws))
        return self
    torch.Tensor.uniform_ = fake_uniform_
    try:
        ref = reference_modules.distribution.sample_from_discretized_mix_logistic(
            torch.tensor(y).permute(0, 2, 1)).numpy()
    finally:
        torch.Tensor.uniform_ = orig

    ours = np.asarray(dist.sample_from_discretized_mix_logistic_with_noise(
        jnp.asarray(y), jnp.asarray(u_mix), jnp.asarray(u_s)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_raw_sampler_range(rng):
    logits = jnp.asarray(rng.randn(8, 512).astype(np.float32))
    s = dist.sample_raw_categorical(jax.random.PRNGKey(0), logits)
    assert s.shape == (8,)
    assert float(s.min()) >= -1.0 and float(s.max()) <= 1.0
