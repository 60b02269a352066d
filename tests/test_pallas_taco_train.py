"""Parity: Pallas Tacotron TF-training decoder recurrence (fwd + custom
VJP) vs the XLA scan twin.

Interpret mode on CPU (Mosaic lowering is covered by the hardware tier in
tests/test_tpu_hardware.py).  The scan branch of models/tacotron.forward
is the spec: identical zoneout key stream, identical rounding points, so
f32 parity here is tight (~1e-5); the remaining delta is summation order.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import TacotronConfig
from wavernn_tpu.models import tacotron as taco
from wavernn_tpu.train.tacotron_train import loss_tf

N_MELS = 80


def _tts(**kw):
    base = dict(embed_dims=32, encoder_dims=128, decoder_dims=256,
                postnet_dims=32, encoder_K=2, lstm_dims=512, postnet_K=2,
                num_highways=1)
    base.update(kw)
    return TacotronConfig(**base)


def _setup(B=8, T_text=40, G=6, r=2, seed=0):
    tts = _tts()
    params = taco.init_tacotron(jax.random.PRNGKey(seed), tts, N_MELS)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randint(1, 148, (B, T_text)))
    m = jnp.asarray(rng.randn(B, N_MELS, G * r).astype(np.float32))
    return tts, params, x, m


@pytest.mark.parametrize("r", [2, 5])
def test_forward_parity(r):
    """Full forward (encoder + kernel decoder + postnet) matches the scan
    path group-for-group under identical dropout/zoneout draws."""
    tts, params, x, m = _setup(r=r)
    key = jax.random.PRNGKey(7)
    out_s = taco.forward(params, x, m, tts, r, key, mode="teacher_forcing",
                         training=True, recurrence="scan")
    out_k = taco.forward(params, x, m, tts, r, key, mode="teacher_forcing",
                         training=True, recurrence="pallas_interpret")
    for name, a, b in zip(("mel", "linear", "attn"), out_s[:3], out_k[:3]):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, atol=2e-5 * max(1.0, np.max(np.abs(a))),
            err_msg=f"TF kernel-vs-scan mismatch in {name}")


def test_forward_parity_odd_batch_and_groups():
    """B not a multiple of 8 (row padding) and G not a multiple of the
    chunk (step padding) both slice back to exact parity."""
    tts, params, x, m = _setup(B=5, T_text=33, G=7, r=2)
    key = jax.random.PRNGKey(3)
    out_s = taco.forward(params, x, m, tts, 2, key, mode="teacher_forcing",
                         training=True, recurrence="scan")
    out_k = taco.forward(params, x, m, tts, 2, key, mode="teacher_forcing",
                         training=True, recurrence="pallas_interpret")
    for a, b in zip(out_s[:3], out_k[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_grad_parity():
    """jax.grad of the TF loss through the custom VJP matches autodiff of
    the scan on every parameter leaf (worst observed ~2e-5 relative)."""
    tts, params, x, m = _setup()
    key = jax.random.PRNGKey(7)

    def grads(rec):
        return jax.grad(lambda p: loss_tf(p, x, m, tts, 2, key,
                                          recurrence=rec)[0])(params)

    gs = jax.tree_util.tree_flatten_with_path(grads("scan"))[0]
    gk = jax.tree_util.tree_leaves(grads("pallas_interpret"))
    for (path, a), b in zip(gs, gk):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(a)) + 1e-7
        err = np.max(np.abs(a - b)) / scale
        assert err < 1e-3, (f"grad mismatch at "
                            f"{jax.tree_util.keystr(path)}: rel={err:.2e}")


def test_bf16_loss_parity():
    """bf16 compute: the kernel runs f32 gate math over bf16 streams where
    the scan runs bf16 throughout — losses agree at bf16 resolution."""
    tts, params, x, m = _setup()
    key = jax.random.PRNGKey(7)
    ls = loss_tf(params, x, m, tts, 2, key, compute_dtype=jnp.bfloat16,
                 recurrence="scan")[0]
    lk = loss_tf(params, x, m, tts, 2, key, compute_dtype=jnp.bfloat16,
                 recurrence="pallas_interpret")[0]
    assert abs(float(ls) - float(lk)) / abs(float(ls)) < 2e-2


def test_ref_twin_matches_kernel():
    """The pure-JAX flat-operand twin (core_ref) and the interpret-mode
    kernel compute the same function — value AND scores."""
    from wavernn_tpu.ops.pallas_taco_train import (decoder_tf_train,
                                                   zoneout_masks)
    tts, params, x, m = _setup(G=6)
    key = jax.random.PRNGKey(11)
    k_enc, k_dec, k_pre = jax.random.split(key, 3)
    enc, _ = taco.encoder_apply(params["encoder"], x, k_enc, True,
                                tts.dropout)
    encp = taco.L.linear(params["encoder_proj"], enc)
    dec = params["decoder"]
    B, G, r = x.shape[0], 6, 2
    tf_in = jnp.concatenate(
        [jnp.zeros((B, N_MELS, 1), m.dtype), m[:, :, r - 1::r][:, :, :-1]],
        axis=2)
    pre_all = taco.prenet_apply(
        dec["prenet"], jnp.moveaxis(tf_in, 2, 0).reshape(G * B, N_MELS),
        k_pre, True, tts.dropout).reshape(G, B, -1)
    zm1, zm2 = zoneout_masks(k_dec, G, B, tts.lstm_dims)
    mel_r, at_r = decoder_tf_train(dec, enc, encp, pre_all, zm1, zm2,
                                   tts.max_r, r, N_MELS, impl="ref")
    mel_i, at_i = decoder_tf_train(dec, enc, encp, pre_all, zm1, zm2,
                                   tts.max_r, r, N_MELS,
                                   impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(mel_r), np.asarray(mel_i),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(at_r), np.asarray(at_i),
                               atol=2e-6)


def test_eval_mode_tf_parity():
    """Eval-mode TF forward (the AF-online teacher / GTA export path)
    rides the kernel with zero zoneout masks — exact vs the eval scan."""
    tts, params, x, m = _setup(G=6)
    key = jax.random.PRNGKey(5)
    out_s = taco.forward(params, x, m, tts, 2, key, mode="teacher_forcing",
                         training=False, recurrence="scan")
    out_k = taco.forward(params, x, m, tts, 2, key, mode="teacher_forcing",
                         training=False, recurrence="pallas_interpret")
    for a, b in zip(out_s[:3], out_k[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _attn_ref_for(tts, params, x, m, r):
    _, _, attn, _ = taco.forward(params, x, m, tts, r,
                                 jax.random.PRNGKey(99),
                                 mode="teacher_forcing", training=False)
    return jax.lax.stop_gradient(attn)


@pytest.mark.parametrize("training", [True, False])
def test_af_forward_parity(training):
    """Attention-forcing forward (context from attn_ref, in-kernel prenet
    with the scan's dropout key stream) matches the scan path."""
    tts, params, x, m = _setup(G=6)
    key = jax.random.PRNGKey(13)
    aref = _attn_ref_for(tts, params, x, m, 2)
    out_s = taco.forward(params, x, m, tts, 2, key,
                         mode="attention_forcing_online", training=training,
                         attn_ref=aref, recurrence="scan")
    out_k = taco.forward(params, x, m, tts, 2, key,
                         mode="attention_forcing_online", training=training,
                         attn_ref=aref, recurrence="pallas_interpret")
    for name, a, b in zip(("mel", "linear", "attn"), out_s[:3], out_k[:3]):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, atol=3e-5 * max(1.0, np.max(np.abs(a))),
            err_msg=f"AF kernel-vs-scan mismatch in {name}")


def test_af_grad_parity():
    """AF-offline loss (mel L1 + attention L1 -> nonzero scores cotangent
    AND attn_ref cotangent path) grads match autodiff of the scan."""
    from wavernn_tpu.train.tacotron_train import loss_af
    tts, params, x, m = _setup(G=6)
    key = jax.random.PRNGKey(13)
    aref = _attn_ref_for(tts, params, x, m, 2)

    def grads(rec):
        return jax.grad(
            lambda p: loss_af(p, x, m, aref, tts, 2, key, 1.0,
                              offline=True, recurrence=rec)[0])(params)

    gs = jax.tree_util.tree_flatten_with_path(grads("scan"))[0]
    gk = jax.tree_util.tree_leaves(grads("pallas_interpret"))
    for (path, a), b in zip(gs, gk):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-7)
        assert err < 1e-3, (f"AF grad mismatch at "
                            f"{jax.tree_util.keystr(path)}: rel={err:.2e}")
