"""Parity tests for the training-recurrence Pallas kernels
(ops/pallas_gru.py): forward AND backward (custom VJP) vs the lax.scan
oracle, plus the full train step routed through recurrence="pallas".

Interpret mode on CPU; a hardware twin lives in test_tpu_hardware.py.
Reference hot path being replaced: cuDNN fused GRU over the training
window (train_wavernn.py:98-162, fatchord_version.py:154-159).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from wavernn_tpu.ops.pallas_gru import gru_seq_tm, gru_seq_ref


def _data(rng, T=37, B=8, H=64, dtype=jnp.float32):
    gi = jnp.asarray(rng.randn(T, B, 3 * H).astype(np.float32) * 0.5, dtype)
    wh = jnp.asarray(rng.randn(H, 3 * H).astype(np.float32) * 0.05, dtype)
    bh = jnp.asarray(rng.randn(3 * H).astype(np.float32) * 0.05, dtype)
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1, dtype)
    co = jnp.asarray(rng.randn(T, B, H).astype(np.float32) * 0.1, dtype)
    return gi, wh, bh, h0, co


@pytest.mark.parametrize("chunk", [8, 16])
def test_forward_matches_scan(rng, chunk):
    gi, wh, bh, h0, _ = _data(rng)
    ys = jax.jit(partial(gru_seq_tm, chunk=chunk, interpret=True))(
        gi, wh, bh, h0)
    want = gru_seq_ref(gi, wh, bh, h0)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(want), atol=2e-5)


def test_forward_ragged_tail(rng):
    """T not a chunk multiple: the padded tail must not leak into ys."""
    gi, wh, bh, h0, _ = _data(rng, T=29)
    ys = jax.jit(partial(gru_seq_tm, chunk=16, interpret=True))(
        gi, wh, bh, h0)
    want = gru_seq_ref(gi, wh, bh, h0)
    assert ys.shape == want.shape
    np.testing.assert_allclose(np.asarray(ys), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("T", [37, 29])
def test_backward_matches_scan(rng, T):
    """Custom VJP (reverse-grid kernel + full-sequence weight-grad GEMMs)
    vs autodiff of the scan, all four inputs, incl. the zero-padded-tail
    dh passthrough (T=29, chunk 16)."""
    gi, wh, bh, h0, co = _data(rng, T=T)

    def loss_k(*a):
        return jnp.sum(gru_seq_tm(*a, 16, True) * co)

    def loss_r(*a):
        return jnp.sum(gru_seq_ref(*a) * co)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))(gi, wh, bh, h0)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(gi, wh, bh, h0)
    for a, b, name in zip(gk, gr, ("dgi", "dwh", "dbh", "dh0")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4, err_msg=name)


def test_backward_bf16_close(rng):
    """bf16 streams (the mixed-precision training configuration): grads
    track the bf16 scan within bf16 tolerance."""
    gi, wh, bh, h0, co = _data(rng, dtype=jnp.bfloat16)

    def loss_k(*a):
        return jnp.sum(gru_seq_tm(*a, 16, True).astype(jnp.float32)
                       * co.astype(jnp.float32))

    def loss_r(*a):
        return jnp.sum(gru_seq_ref(*a).astype(jnp.float32)
                       * co.astype(jnp.float32))

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1)))(gi, wh, bh, h0)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(gi, wh, bh, h0)
    for a, b, name in zip(gk, gr, ("dgi", "dwh")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / scale < 5e-2, name


def test_train_step_loss_parity(rng):
    """Full WaveRNN train step, recurrence pallas(interpret) vs scan:
    same batch, same init -> same loss and near-identical updated params
    (VERDICT r4 item 1 'loss-parity vs the XLA step')."""
    from wavernn_tpu.config import DSPConfig, WaveRNNConfig
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.train import wavernn_train as wt

    dsp = DSPConfig()
    voc = WaveRNNConfig(mode="MOL", rnn_dims=64, fc_dims=64, compute_dims=16,
                        res_out_dims=32, res_blocks=1, pad=2,
                        upsample_factors=(5, 5, 11))
    seq_len = 2 * dsp.hop_length
    mel_win = seq_len // dsp.hop_length + 2 * voc.pad
    B = 4
    x = jnp.asarray(rng.uniform(-1, 1, (B, seq_len)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (B, seq_len)).astype(np.float32))
    m = jnp.asarray(rng.uniform(0, 1, (B, dsp.num_mels, mel_win))
                    .astype(np.float32))
    state = wt.create_train_state(jax.random.PRNGKey(0), voc, dsp, 1e-4)

    outs = {}
    for rec in ("scan", "pallas_interpret"):
        st, metrics = wt.train_step(state, x, y, m, voc, dsp, 1e-4, 4.0,
                                    "float32", None, rec)
        outs[rec] = (float(metrics["loss"]), st.params)
    l_s, p_s = outs["scan"]
    l_p, p_p = outs["pallas_interpret"]
    assert abs(l_s - l_p) < 1e-5 * max(1.0, abs(l_s))
    flat_s = jax.tree_util.tree_leaves(p_s)
    flat_p = jax.tree_util.tree_leaves(p_p)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_taco_train_step_loss_parity(rng):
    """Tacotron TF train step with the CBHG BiGRUs on the Pallas
    recurrence (interpret) vs scan: same loss, near-identical updates
    (the decoder scan is shared; only the encoder/postnet BiGRU engine
    changes — VERDICT r4 item 2)."""
    from wavernn_tpu.config import TacotronConfig
    from wavernn_tpu.train import tacotron_train as tt

    tts = TacotronConfig(embed_dims=32, encoder_dims=128, decoder_dims=256,
                         postnet_dims=16, encoder_K=2, lstm_dims=32,
                         postnet_K=2, num_highways=1)
    n_mels, r, B = 80, 2, 4
    state = tt.create_train_state(jax.random.PRNGKey(0), tts, n_mels, 1e-3)
    x_ids = jnp.asarray(rng.randint(1, 148, (B, 9)))
    m = jnp.asarray(rng.uniform(-4, 4, (B, n_mels, 6 * r)).astype(np.float32))
    key = jax.random.PRNGKey(5)

    outs = {}
    for rec in ("scan", "pallas_interpret"):
        st, metrics = tt.train_step_tf(state, x_ids, m, tts, r, 1e-3, key,
                                       recurrence=rec)
        outs[rec] = (float(metrics["loss"]), st.params)
    l_s, p_s = outs["scan"]
    l_p, p_p = outs["pallas_interpret"]
    assert abs(l_s - l_p) < 1e-5 * max(1.0, abs(l_s))
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_p)):
        # Adam divides by sqrt(v)+eps: rounding-level grad differences
        # amplify where v ~ 0, so the post-update tolerance is looser than
        # the loss gate
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
