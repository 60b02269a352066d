import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.ops.sample_loop import generate_scan
from wavernn_tpu.ops.pallas_gen import generate_pallas

DSP = DSPConfig()


def _cfg(mode="MOL"):
    return WaveRNNConfig(mode=mode, rnn_dims=64, fc_dims=64, compute_dims=16,
                         res_out_dims=32, res_blocks=1, pad=2,
                         upsample_factors=(5, 5, 11))


def test_pallas_matches_scan_mol(rng):
    """Persistent-weights kernel (interpret mode on CPU) vs the scan oracle,
    same injected noise -> identical waveform."""
    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    B, T = 8, 200
    mels_up = jnp.asarray(rng.randn(B, T, DSP.num_mels).astype(np.float32)) * 0.3
    aux = jnp.asarray(rng.randn(B, T, voc.res_out_dims).astype(np.float32)) * 0.3
    nr_mix = 10
    u_mix = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, nr_mix)).astype(np.float32))
    u_s = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32))

    want = np.asarray(generate_scan(params, mels_up, aux, voc, DSP.bits,
                                    jax.random.PRNGKey(0), noise=(u_mix, u_s)))
    got = np.asarray(generate_pallas(params, mels_up, aux, voc, DSP.bits,
                                     jax.random.PRNGKey(0), noise=(u_mix, u_s),
                                     chunk=64, compute_dtype=jnp.float32,
                                     interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pallas_raw_valid_samples(rng):
    voc = _cfg("RAW")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    B, T = 4, 100
    mels_up = jnp.asarray(rng.randn(B, T, DSP.num_mels).astype(np.float32)) * 0.3
    aux = jnp.asarray(rng.randn(B, T, voc.res_out_dims).astype(np.float32)) * 0.3
    noise = jnp.asarray(
        rng.uniform(1e-5, 1 - 1e-5, (T, B, 2 ** DSP.bits)).astype(np.float32))
    got = np.asarray(generate_pallas(params, mels_up, aux, voc, DSP.bits,
                                     jax.random.PRNGKey(0), noise=noise,
                                     chunk=50, compute_dtype=jnp.float32,
                                     interpret=True))
    assert got.shape == (B, T)
    assert got.min() >= -1.0 and got.max() <= 1.0
    # samples land exactly on the 2**bits RAW grid
    idx = (got + 1.0) * (2 ** DSP.bits - 1) / 2.0
    np.testing.assert_allclose(idx, np.round(idx), atol=1e-3)
    assert np.unique(np.round(idx)).size > 10  # actually random


def test_pallas_v2_matches_scan_mol(rng):
    from wavernn_tpu.ops.pallas_gen2 import generate_pallas_v2
    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    B, T = 4, 150
    mels_up = jnp.asarray(rng.randn(B, T, DSP.num_mels).astype(np.float32)) * 0.3
    aux = jnp.asarray(rng.randn(B, T, voc.res_out_dims).astype(np.float32)) * 0.3
    u_mix = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, 10)).astype(np.float32))
    u_s = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32))
    want = np.asarray(generate_scan(params, mels_up, aux, voc, DSP.bits,
                                    jax.random.PRNGKey(0), noise=(u_mix, u_s)))
    got = np.asarray(generate_pallas_v2(
        params, mels_up, aux, voc, DSP.bits, jax.random.PRNGKey(0),
        noise=(u_mix, u_s), chunk=50, compute_dtype=jnp.float32,
        stream_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pallas_bf16_gates_agreement(rng):
    """gates_dtype=bf16 (bf16 recurrence/state) must track the f32 scan
    trajectory closely — occasional rounding-flipped mixture picks are
    legitimate, so gate on agreement rate, not allclose."""
    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    B, T = 8, 200
    mels_up = jnp.asarray(rng.randn(B, T, DSP.num_mels).astype(np.float32)) * 0.3
    aux = jnp.asarray(rng.randn(B, T, voc.res_out_dims).astype(np.float32)) * 0.3
    u_mix = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, 10)).astype(np.float32))
    u_s = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32))
    want = np.asarray(generate_scan(params, mels_up, aux, voc, DSP.bits,
                                    jax.random.PRNGKey(0), noise=(u_mix, u_s)))
    got = np.asarray(generate_pallas(params, mels_up, aux, voc, DSP.bits,
                                     jax.random.PRNGKey(0), noise=(u_mix, u_s),
                                     chunk=64, compute_dtype=jnp.bfloat16,
                                     gates_dtype=jnp.bfloat16, interpret=True))
    agree = float(np.mean(np.isclose(got, want, atol=2e-2)))
    assert agree > 0.95, agree
