"""Block-sparse sample kernel vs the scan oracle on block-pruned weights.

The reference's pruning prototype exists to make the sample loop cheap at
93.75% sparsity (notebooks/Pruning - Scratchpad.ipynb cells 4-5); here the
block-structured masks from train/pruning.py feed a mask-specialized Pallas
kernel that skips zero (8, 128) tiles entirely.  Skipped blocks contribute
exactly 0, so sparse output == dense-masked output bit-for-bit modulo
accumulation order.
"""
import numpy as np
import jax
import jax.numpy as jnp

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.ops.sample_loop import generate_scan
from wavernn_tpu.ops.pallas_gen import (
    _pack_block_sparse, generate_pallas, generate_pallas_sparse)
from wavernn_tpu.train.pruning import (
    PruneSpec, apply_masks, block_mask_from_matrix, init_masks)

DSP = DSPConfig()
Z = 0.9375  # the reference prune notebook's target sparsity


def _cfg(mode="MOL"):
    # dims chosen so every pruned matrix is (8,128)-tile divisible
    return WaveRNNConfig(mode=mode, rnn_dims=128, fc_dims=128,
                         compute_dims=16, res_out_dims=128, res_blocks=1,
                         pad=2, upsample_factors=(5, 5, 11))


def _block_pruned_params(voc, key=1):
    params = wr.init_wavernn(jax.random.PRNGKey(key), voc, DSP)
    spec = PruneSpec([(("rnn1", "wi"), 3), (("rnn1", "wh"), 3),
                      (("rnn2", "wi"), 3), (("rnn2", "wh"), 3),
                      (("fc1", "w"), 1), (("fc2", "w"), 1)])
    masks = init_masks(params, spec)
    for path, n_splits in spec.entries:
        k = "/".join(path)
        W = params[path[0]][path[1]]
        masks[k] = block_mask_from_matrix(W, jnp.asarray(Z), n_splits)
    return apply_masks(params, masks, spec)


def _inputs(rng, voc, B, T):
    mels_up = jnp.asarray(rng.randn(B, T, DSP.num_mels).astype(np.float32)) * 0.3
    aux = jnp.asarray(rng.randn(B, T, voc.res_out_dims).astype(np.float32)) * 0.3
    return mels_up, aux


def test_packer_detects_block_pattern():
    voc = _cfg("MOL")
    params = _block_pruned_params(voc)
    packed, rows = _pack_block_sparse(params["rnn1"]["wh"])
    n_blocks = sum(len(r) for r in rows)
    total = (voc.rnn_dims // 8) * (3 * voc.rnn_dims // 128)
    assert packed.shape == (max(n_blocks, 1) * 8, 128)
    # ~6.25% of blocks live (per-gate-split quantile -> small rounding slack)
    assert n_blocks <= int(total * (1 - Z) + 3 * 3)
    # dense fallback on a matrix with no zero blocks
    assert _pack_block_sparse(np.ones((128, 384), np.float32)) is None


def test_sparse_kernel_matches_scan_mol(rng):
    voc = _cfg("MOL")
    params = _block_pruned_params(voc)
    B, T = 8, 200
    mels_up, aux = _inputs(rng, voc, B, T)
    nr_mix = voc.n_classes(DSP.bits) // 3
    u_mix = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, nr_mix)).astype(np.float32))
    u_s = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32))

    want = np.asarray(generate_scan(params, mels_up, aux, voc, DSP.bits,
                                    jax.random.PRNGKey(0), noise=(u_mix, u_s)))
    got = np.asarray(generate_pallas_sparse(
        params, mels_up, aux, voc, DSP.bits, jax.random.PRNGKey(0),
        noise=(u_mix, u_s), chunk=64, compute_dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sparse_kernel_matches_dense_kernel_raw(rng):
    voc = _cfg("RAW")
    params = _block_pruned_params(voc)
    B, T = 4, 120
    mels_up, aux = _inputs(rng, voc, B, T)
    noise = jnp.asarray(
        rng.uniform(1e-5, 1 - 1e-5, (T, B, 2 ** DSP.bits)).astype(np.float32))
    want = np.asarray(generate_pallas(params, mels_up, aux, voc, DSP.bits,
                                      jax.random.PRNGKey(0), noise=noise,
                                      chunk=60, compute_dtype=jnp.float32,
                                      interpret=True))
    got = np.asarray(generate_pallas_sparse(
        params, mels_up, aux, voc, DSP.bits, jax.random.PRNGKey(0),
        noise=noise, chunk=60, compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_unpruned_params_fall_back_dense(rng):
    """Unpruned weights have no zero blocks -> the sparse entry must produce
    the plain dense kernel's output (and not crash or mis-specialize)."""
    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    B, T = 4, 100
    mels_up, aux = _inputs(rng, voc, B, T)
    nr_mix = voc.n_classes(DSP.bits) // 3
    u_mix = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, nr_mix)).astype(np.float32))
    u_s = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32))
    want = np.asarray(generate_pallas(params, mels_up, aux, voc, DSP.bits,
                                      jax.random.PRNGKey(0), noise=(u_mix, u_s),
                                      chunk=50, compute_dtype=jnp.float32,
                                      interpret=True))
    got = np.asarray(generate_pallas_sparse(
        params, mels_up, aux, voc, DSP.bits, jax.random.PRNGKey(0),
        noise=(u_mix, u_s), chunk=50, compute_dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sparse_kernel_br8_legacy_schedule(rng):
    """The (8,128) gathered schedule (allow_br8 opt-in: slower than dense
    on silicon, kept as the numerically exact consumer of legacy
    fine-grained masks) still matches the dense kernel."""
    voc = _cfg("MOL")
    params = _block_pruned_params(voc)
    B, T = 4, 80
    mels_up, aux = _inputs(rng, voc, B, T)
    nr_mix = voc.n_classes(DSP.bits) // 3
    u_mix = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, nr_mix)).astype(np.float32))
    u_s = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32))
    want = np.asarray(generate_pallas(params, mels_up, aux, voc, DSP.bits,
                                      jax.random.PRNGKey(0), noise=(u_mix, u_s),
                                      chunk=40, compute_dtype=jnp.float32,
                                      interpret=True))
    got = np.asarray(generate_pallas_sparse(
        params, mels_up, aux, voc, DSP.bits, jax.random.PRNGKey(0),
        noise=(u_mix, u_s), chunk=40, compute_dtype=jnp.float32,
        interpret=True, allow_br8=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pack_sparse_reused_across_calls(rng):
    """pack_sparse's one-time packing plugs into generate_pallas_sparse
    via packed= and gives the same output as implicit per-call packing
    (serving packs once after pruning freezes the masks)."""
    from wavernn_tpu.ops.pallas_gen import pack_sparse

    voc = _cfg("MOL")
    params = _block_pruned_params(voc)
    B, T = 4, 60
    mels_up, aux = _inputs(rng, voc, B, T)
    nr_mix = voc.n_classes(DSP.bits) // 3
    u_mix = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, nr_mix)).astype(np.float32))
    u_s = jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B)).astype(np.float32))
    packed = pack_sparse(params, voc, allow_br8=True)
    assert isinstance(packed, tuple) and len(packed) == 2
    kw = dict(noise=(u_mix, u_s), chunk=30, compute_dtype=jnp.float32,
              interpret=True)
    want = np.asarray(generate_pallas_sparse(
        params, mels_up, aux, voc, DSP.bits, jax.random.PRNGKey(0),
        allow_br8=True, **kw))
    got = np.asarray(generate_pallas_sparse(
        params, mels_up, aux, voc, DSP.bits, jax.random.PRNGKey(0),
        packed=packed, **kw))
    np.testing.assert_array_equal(got, want)


def _mxu_block_pruned(rng, mode="RAW"):
    """(128,128)-block-pruned full-width model + its packed schedule."""
    from wavernn_tpu.ops.pallas_gen import pack_sparse
    from wavernn_tpu.train.pruning import (PruneSpec, apply_masks,
                                           update_masks)

    voc = WaveRNNConfig(mode=mode, rnn_dims=256, fc_dims=256,
                        compute_dims=16, res_out_dims=128, res_blocks=1,
                        pad=2, upsample_factors=(5, 5, 11))
    dsp = DSPConfig(bits=8)
    params = wr.init_wavernn(jax.random.PRNGKey(2), voc, dsp)
    spec = PruneSpec([(("rnn1", "wi"), 3), (("rnn1", "wh"), 3),
                      (("rnn2", "wi"), 3), (("rnn2", "wh"), 3),
                      (("fc1", "w"), 1), (("fc2", "w"), 1)])
    masks = update_masks(params, None, jnp.asarray(1.0), spec, t0=0, S=1,
                         Z=0.9375, block=(128, 128))
    mparams = apply_masks(params, masks, spec)
    packed = pack_sparse(mparams, voc)
    assert packed[0], "expected block-sparse matrices after (128,128) prune"
    return mparams, voc, dsp, packed


def test_generate_multi_sparse_matches_dense(rng):
    """Batched serving of a pruned checkpoint: generate_multi with
    sparse_packed (one fused launch, device_out) matches the dense batched
    path on the same masked weights — pruned models serve BATCHED, not just
    single-utterance (VERDICT r3 item 4)."""
    from wavernn_tpu.models.wavernn import generate_multi

    from wavernn_tpu.ops import polyphase as Po

    mparams, voc, dsp, packed = _mxu_block_pruned(rng)
    target, overlap = 2200, 550
    frames = (14, 18)
    mels = [jnp.asarray(rng.uniform(0.2, 0.8, (dsp.num_mels, f))
                        .astype(np.float32)) for f in frames]
    # injected noise spans the CONCATENATED fold batch (interpret mode has
    # no on-core PRNG on CPU)
    fold_len = target + 2 * overlap
    n_folds = sum(Po.fold_geometry(f * dsp.hop_length, target, overlap,
                                   dsp.hop_length)[0] for f in frames)
    noise = jnp.asarray(rng.uniform(
        1e-5, 1 - 1e-5, (fold_len, n_folds, 2 ** dsp.bits))
        .astype(np.float32))
    kw = dict(target=target, overlap=overlap, mu_law=False, noise=noise,
              interpret=True, device_out=True)
    want = [np.asarray(w) for w in generate_multi(
        mparams, mels, voc, dsp, jax.random.PRNGKey(0), **kw)]
    got = [np.asarray(w) for w in generate_multi(
        mparams, mels, voc, dsp, jax.random.PRNGKey(0),
        sparse_packed=packed, **kw)]
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=2e-4)


def test_generate_sharded_sparse_matches_dense(rng):
    """Sharded serving of a pruned checkpoint: generate_sharded accepts
    sparse_packed on every path. On CPU meshes the crossfade program's
    kernel half needs the on-core PRNG (TPU-tier parity in
    test_tpu_hardware.py); here the scan twin must serve the pruned
    checkpoint identically with and without the packed schedule, across
    multiple virtual devices."""
    import jax as _jax
    from jax.sharding import Mesh
    from wavernn_tpu.parallel.gen_sharded import generate_sharded

    mparams, voc, dsp, packed = _mxu_block_pruned(rng)
    target, overlap = 2200, 550
    mels = rng.uniform(0.2, 0.8, (1, dsp.num_mels, 16)).astype(np.float32)
    mesh = Mesh(np.asarray(_jax.devices()[:2]), ("data",))
    kw = dict(target=target, overlap=overlap, use_pallas=False, mesh=mesh)
    want = generate_sharded(mparams, mels, voc, dsp, jax.random.PRNGKey(0),
                            **kw)
    got = generate_sharded(mparams, mels, voc, dsp, jax.random.PRNGKey(0),
                           sparse_packed=packed, **kw)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_streaming_sparse_matches_dense(rng):
    """Streaming a pruned checkpoint: StreamingVocoder with sparse_packed
    matches the dense stream under the same injected noise (state I/O on
    the sparse schedule is exact)."""
    from wavernn_tpu.streaming import StreamingVocoder

    mparams, voc, dsp, packed = _mxu_block_pruned(rng)
    frames = 16
    mels = rng.uniform(0.2, 0.8, (dsp.num_mels, frames)).astype(np.float32)
    T = frames * dsp.hop_length
    noise = jnp.asarray(rng.uniform(
        1e-9, 1.0, (T, 1, 2 ** dsp.bits)).astype(np.float32))

    def run(sparse_packed):
        sv = StreamingVocoder(mparams, voc, dsp, jax.random.PRNGKey(0),
                              chunk_frames=7, mu_law=False, noise=noise,
                              use_pallas=None, sparse_packed=sparse_packed)
        sv._pallas = True  # pallas state-I/O path (interpret shim below)
        return np.concatenate([sv.feed(mels), sv.flush()])

    # interpret mode: route the pallas state-I/O kernel through interpret
    import wavernn_tpu.streaming as S
    real = S._stream_block_jit

    def interp(params, window, key, state, noise, voc_, bits, T_, up,
               sparse_static=(), sparse_arrays=()):
        from wavernn_tpu.ops.pallas_gen import generate_pallas_with_state
        from wavernn_tpu.models.wavernn import upsample_apply
        w = window if window.ndim == 3 else window[None]
        mels_up, aux, _ = upsample_apply(params["upsample"], w, voc_,
                                         training=False)
        return generate_pallas_with_state(
            params, mels_up, aux, voc_, bits, key, noise=noise,
            init_state=state, state_snapshot_at=T_, interpret=True,
            sparse_static=sparse_static, sparse_arrays=sparse_arrays)

    S._stream_block_jit = interp
    try:
        want = run(None)
        got = run(packed)
    finally:
        S._stream_block_jit = real
    assert got.shape == want.shape == (T,)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_kernel_sparse_matches_dense(rng):
    """Pruned serving on the PRODUCTION path: generate_fast with
    sparse_packed (fused-conditioning kernel, per-step matmuls on the
    single-dot sparse schedule) matches the dense fused path on the same
    masked weights and injected noise."""
    from wavernn_tpu.models.wavernn import generate_fast
    from wavernn_tpu.ops.pallas_gen import pack_sparse
    from wavernn_tpu.train.pruning import PruneSpec, apply_masks, update_masks

    voc = WaveRNNConfig(mode="RAW", rnn_dims=256, fc_dims=256,
                        compute_dims=16, res_out_dims=128, res_blocks=1,
                        pad=2, upsample_factors=(5, 5, 11))
    dsp = DSPConfig(bits=8)
    params = wr.init_wavernn(jax.random.PRNGKey(2), voc, dsp)
    spec = PruneSpec([(("rnn1", "wi"), 3), (("rnn1", "wh"), 3),
                      (("rnn2", "wi"), 3), (("rnn2", "wh"), 3),
                      (("fc1", "w"), 1), (("fc2", "w"), 1)])
    masks = update_masks(params, None, jnp.asarray(1.0), spec, t0=0, S=1,
                         Z=0.9375, block=(128, 128))
    mparams = apply_masks(params, masks, spec)

    packed = pack_sparse(mparams, voc)
    assert packed[0], "expected block-sparse matrices after (128,128) prune"

    frames, target, overlap = 16, 2200, 550
    mels = rng.uniform(0.2, 0.8, (1, dsp.num_mels, frames)).astype(np.float32)
    # injected noise spans the fused fold batch: T = fold len, B = folds
    T_fold = target + 2 * overlap
    n_folds = 2
    noise = jnp.asarray(rng.uniform(
        1e-5, 1 - 1e-5, (T_fold, n_folds, 2 ** dsp.bits)).astype(np.float32))

    kw = dict(target=target, overlap=overlap, mu_law=False, noise=noise,
              compute_dtype=jnp.float32, interpret=True)
    want = np.asarray(generate_fast(mparams, mels, voc, dsp,
                                    jax.random.PRNGKey(0), **kw))
    got = np.asarray(generate_fast(mparams, mels, voc, dsp,
                                   jax.random.PRNGKey(0),
                                   sparse_packed=packed, **kw))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_multistream_sparse_matches_dense(rng):
    """Pruned MULTI-stream serving: MultiStreamVocoder with sparse_packed
    matches the dense stream under the same injected noise (the sparse
    schedule rides the same state-I/O block program)."""
    from wavernn_tpu.streaming import MultiStreamVocoder

    mparams, voc, dsp, packed = _mxu_block_pruned(rng)
    B, frames = 2, 16
    mels = [rng.uniform(0.2, 0.8, (dsp.num_mels, frames)).astype(np.float32)
            for _ in range(B)]
    T = frames * dsp.hop_length
    noise = jnp.asarray(rng.uniform(
        1e-9, 1.0, (T, B, 2 ** dsp.bits)).astype(np.float32))

    # interpret-mode shim for the pallas state-I/O path on CPU
    import wavernn_tpu.streaming as S
    real = S._stream_block_jit

    def interp(params, window, key, state, noise_, voc_, bits, T_, up,
               sparse_static=(), sparse_arrays=(), active=None, n_out=0,
               mu_decode=False, fold_idx=None):
        from wavernn_tpu.models.wavernn import upsample_apply
        from wavernn_tpu.ops.pallas_gen import generate_pallas_with_state
        if fold_idx is not None:
            key = jax.random.fold_in(key, fold_idx)
        w = window if window.ndim == 3 else window[None]
        mels_up, aux, _ = upsample_apply(params["upsample"], w, voc_,
                                         training=False)
        samples, new_state = generate_pallas_with_state(
            params, mels_up, aux, voc_, bits, key, noise=noise_,
            init_state=state, state_snapshot_at=T_, interpret=True,
            sparse_static=sparse_static, sparse_arrays=sparse_arrays)
        if active is not None and state is not None:
            new_state = tuple(
                jnp.where(active.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)
                for n, o in zip(new_state, state))
        if n_out:
            return tuple(samples[b] for b in range(n_out)), new_state
        return samples, new_state

    def run(sparse_packed):
        msv = MultiStreamVocoder(mparams, voc, dsp, jax.random.PRNGKey(0),
                                 n_streams=B, chunk_frames=7, mu_law=False,
                                 noise=noise, sparse_packed=sparse_packed)
        msv._pallas = True
        got = [[] for _ in range(B)]
        for b in range(B):
            for sb, y in msv.feed(b, mels[b]).items():
                got[sb].append(y)
        for b in range(B):
            for sb, y in msv.flush(b).items():
                got[sb].append(y)
        return [np.concatenate(g) for g in got]

    S._stream_block_jit = interp
    try:
        want = run(None)
        got = run(packed)
    finally:
        S._stream_block_jit = real
    for g, w in zip(got, want):
        assert g.shape == w.shape == (T,)
        np.testing.assert_allclose(g, w, atol=2e-4)
