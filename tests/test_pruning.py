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
