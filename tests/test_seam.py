"""Exact-seam fold generation: with enough handoff passes, parallel folded
generation reproduces sequential generation bit-for-bit (hard concat, no
crossfade)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def test_pallas_state_kernel_matches_scan_state(rng):
    """State-I/O kernel (interpret) vs generate_scan_with_state: same
    samples, same boundary snapshot, honors init_state."""
    import jax.numpy as jnp
    from wavernn_tpu.ops.pallas_gen import generate_pallas_with_state
    from wavernn_tpu.ops.sample_loop import generate_scan_with_state
    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC, DSP)
    B, T, snap_at = 3, 60, 25
    mels_up = jnp.asarray(rng.randn(B, T, DSP.num_mels).astype(np.float32)) * 0.3
    aux = jnp.asarray(rng.randn(B, T, VOC.res_out_dims).astype(np.float32)) * 0.3
    u_mix = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, 10)).astype(np.float32))
    u_s = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32))
    h1 = jnp.asarray(rng.randn(B, VOC.rnn_dims).astype(np.float32)) * 0.1
    h2 = jnp.asarray(rng.randn(B, VOC.rnn_dims).astype(np.float32)) * 0.1
    x0 = jnp.asarray(rng.uniform(-1, 1, (B,)).astype(np.float32))

    want, want_snap = generate_scan_with_state(
        params, mels_up, aux, VOC, DSP.bits, jax.random.PRNGKey(0),
        noise=(u_mix, u_s), init_state=(h1, h2, x0),
        state_snapshot_at=snap_at)
    got, got_snap = generate_pallas_with_state(
        params, mels_up, aux, VOC, DSP.bits, jax.random.PRNGKey(0),
        noise=(u_mix, u_s), chunk=20, compute_dtype=jnp.float32,
        interpret=True, init_state=(h1, h2, x0), state_snapshot_at=snap_at)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    for a, b in zip(got_snap, want_snap):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_crossfade_sharded_fused_mesh(rng):
    """Crossfade mode on the frame-rate (fused-conditioning) path: explicit
    shard_map over the fold axis on an 8-device mesh produces a valid
    waveform, and the same key is deterministic for a fixed mesh size."""
    from wavernn_tpu.parallel.gen_sharded import generate_sharded
    from wavernn_tpu.parallel.mesh import make_mesh
    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC, DSP)
    mesh = make_mesh()
    frames = 40
    mels = rng.uniform(0, 1, (1, DSP.num_mels, frames)).astype(np.float32)
    a = generate_sharded(params, mels, VOC, DSP, jax.random.PRNGKey(0),
                         mesh=mesh, target=1100, overlap=275)
    b = generate_sharded(params, mels, VOC, DSP, jax.random.PRNGKey(0),
                         mesh=mesh, target=1100, overlap=275)
    c = generate_sharded(params, mels, VOC, DSP, jax.random.PRNGKey(0),
                         mesh=None, target=1100, overlap=275)
    assert a.shape == c.shape == ((frames - 1) * DSP.hop_length,)
    assert np.isfinite(a).all() and np.abs(a).max() <= np.sqrt(2) + 1e-5
    np.testing.assert_allclose(a, b)  # key-deterministic on the mesh
    assert np.isfinite(c).all()


def test_exact_seam_fused_matches_materialized(rng):
    """Fused-conditioning exact seam (public generate_exact_seam_fused entry,
    interpret mode) vs the materialized exact seam, same injected noise and
    pass count: identical refinement."""
    from wavernn_tpu.ops import polyphase as P
    from wavernn_tpu.parallel.gen_sharded import (concat_folds,
                                                  generate_exact_seam,
                                                  generate_exact_seam_fused)

    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC, DSP)
    geo = P.geometry(VOC.upsample_factors, VOC.pad)
    frames_n = 16
    target, overlap = 4 * geo.hop, geo.hop
    total = frames_n * geo.hop
    mels = jnp.asarray(
        rng.uniform(0, 1, (1, DSP.num_mels, frames_n)).astype(np.float32))
    mels_p = jnp.pad(mels, ((0, 0), (0, 0), (VOC.pad, VOC.pad)))
    num_folds, stride_f, fold_chunks, fold_len = P.fold_geometry(
        total, target, overlap, geo.hop)
    B = num_folds
    nr_mix = VOC.n_classes(DSP.bits) // 3
    noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B, nr_mix))
                         .astype(np.float32)),
             jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, B))
                         .astype(np.float32)))

    mels_up, aux, _ = wr.upsample_apply(params["upsample"], mels_p, VOC,
                                        training=False)
    mf = F.fold_with_overlap(mels_up, target, overlap)
    af = F.fold_with_overlap(aux, target, overlap)
    want, _ = generate_exact_seam(params, mf, af, VOC, DSP.bits,
                                  jax.random.PRNGKey(0), target, overlap,
                                  seam_passes=2, noise=noise,
                                  use_pallas=False)

    phi = P.phi_table(params["upsample"]["up_convs"], VOC.upsample_factors,
                      geo)
    aux_fr, _ = wr.melresnet_apply(params["upsample"]["resnet"], mels_p,
                                   training=False)
    frames = P.build_folded_frames(
        jnp.swapaxes(mels_p[0], 0, 1), jnp.swapaxes(aux_fr[0], 0, 1),
        num_folds, stride_f, fold_chunks, geo.K, geo.d_lo)

    got, errs = generate_exact_seam_fused(
        params, frames, phi, VOC, DSP.bits, jax.random.PRNGKey(0),
        geo.hop, -geo.d_lo, fold_chunks, target, overlap, seam_passes=2,
        noise=noise, compute_dtype=jnp.float32, interpret=True)

    # compare the concatenated (kept) output — every kept sample lies in
    # the exact-matching region of its fold
    wave_len = (frames_n - 1) * DSP.hop_length
    out_w = np.asarray(concat_folds(jnp.asarray(want), target, overlap,
                                    wave_len))
    out_g = np.asarray(concat_folds(jnp.asarray(got), target, overlap,
                                    wave_len))
    np.testing.assert_allclose(out_g, out_w, atol=2e-3)
    errs = np.asarray(errs)
    assert errs.shape == (2,) and errs[-1] <= errs[0] + 1e-6


@pytest.mark.tpu
def test_generate_sharded_fused_seam_single_device(rng):
    """generate_sharded's single-device fused exact-seam branch (mesh=None,
    use_pallas=True, seam_passes>0) — on-core PRNG, so hardware tier only —
    against the materialized seam path (shape/finiteness; noise sources
    differ by design)."""
    from wavernn_tpu.parallel.gen_sharded import generate_sharded
    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC, DSP)
    frames = 40
    mels = rng.uniform(0, 1, (1, DSP.num_mels, frames)).astype(np.float32)
    fused = generate_sharded(params, mels, VOC, DSP, jax.random.PRNGKey(0),
                             mesh=None, target=1100, overlap=275,
                             seam_passes=2, use_pallas=True)
    ref = generate_sharded(params, mels, VOC, DSP, jax.random.PRNGKey(0),
                           mesh=None, target=1100, overlap=275,
                           seam_passes=2, use_pallas=False)
    assert fused.shape == ref.shape == ((frames - 1) * DSP.hop_length,)
    assert np.isfinite(fused).all()
    assert np.isfinite(ref).all()
