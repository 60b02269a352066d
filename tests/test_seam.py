"""Exact-seam fold generation: with enough handoff passes, parallel folded
generation reproduces sequential generation bit-for-bit (hard concat, no
crossfade)."""
import numpy as np
import jax
import jax.numpy as jnp

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.ops import fold as F
from wavernn_tpu.ops.sample_loop import generate_scan
from wavernn_tpu.parallel.gen_sharded import (concat_folds,
                                              generate_exact_seam)

DSP = DSPConfig()
VOC = WaveRNNConfig(mode="MOL", rnn_dims=32, fc_dims=32, compute_dims=16,
                    res_out_dims=16, res_blocks=1)


def test_exact_seam_matches_sequential(rng):
    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC, DSP)
    target, overlap, num_folds = 40, 10, 3
    seg = target + overlap
    total = num_folds * seg + overlap  # folds exactly, no padding
    nr_mix = 10

    mels_up = rng.randn(1, total, DSP.num_mels).astype(np.float32) * 0.3
    aux = rng.randn(1, total, VOC.res_out_dims).astype(np.float32) * 0.3
    u_mix_g = rng.uniform(1e-5, 1 - 1e-5, (total, 1, nr_mix)).astype(np.float32)
    u_s_g = rng.uniform(1e-5, 1 - 1e-5, (total, 1)).astype(np.float32)

    # sequential oracle over the whole utterance
    seq = np.asarray(generate_scan(
        params, jnp.asarray(mels_up), jnp.asarray(aux), VOC, DSP.bits,
        jax.random.PRNGKey(0), noise=(jnp.asarray(u_mix_g),
                                      jnp.asarray(u_s_g))))[0]

    # folded inputs + noise laid out so fold i local j == global i*seg + j
    mf = np.asarray(F.fold_with_overlap(jnp.asarray(mels_up), target, overlap))
    af = np.asarray(F.fold_with_overlap(jnp.asarray(aux), target, overlap))
    L = mf.shape[1]
    u_mix_f = np.zeros((L, num_folds, nr_mix), np.float32)
    u_s_f = np.zeros((L, num_folds), np.float32)
    for i in range(num_folds):
        for j in range(L):
            g = i * seg + j
            if g < total:
                u_mix_f[j, i] = u_mix_g[g, 0]
                u_s_f[j, i] = u_s_g[g, 0]

    samples, errs = generate_exact_seam(
        params, jnp.asarray(mf), jnp.asarray(af), VOC, DSP.bits,
        jax.random.PRNGKey(0), target, overlap,
        seam_passes=num_folds - 1,
        noise=(jnp.asarray(u_mix_f), jnp.asarray(u_s_f)))

    wave_len = total  # compare the full fold-covered range
    out = np.asarray(concat_folds(samples, target, overlap,
                                  num_folds * seg + overlap))
    np.testing.assert_allclose(out[:num_folds * seg], seq[:num_folds * seg],
                               atol=2e-4)
    # refinement error shrinks monotonically to ~0
    errs = np.asarray(errs)
    assert errs[-1] <= errs[0] + 1e-6


def test_seam_sharded_runs_on_mesh(rng):
    """Exact-seam path under an 8-device mesh (roll -> collective permute)."""
    from wavernn_tpu.parallel.gen_sharded import generate_sharded
    from wavernn_tpu.parallel.mesh import make_mesh
    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC, DSP)
    mesh = make_mesh()
    frames = 40
    mels = rng.uniform(0, 1, (1, DSP.num_mels, frames)).astype(np.float32)
    wav = generate_sharded(params, mels, VOC, DSP, jax.random.PRNGKey(0),
                           mesh=mesh, target=1100, overlap=275,
                           seam_passes=2)
    assert wav.shape == ((frames - 1) * DSP.hop_length,)
    assert np.isfinite(wav).all()

    wav_xf = generate_sharded(params, mels, VOC, DSP, jax.random.PRNGKey(0),
                              mesh=mesh, target=1100, overlap=275)
    assert wav_xf.shape == wav.shape
