"""Attention-forcing training modes end-to-end (the fork's contribution)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import TacotronConfig
from wavernn_tpu.models import tacotron as taco
from wavernn_tpu.train import tacotron_train as tt

TTS = TacotronConfig(embed_dims=32, encoder_dims=128, decoder_dims=256,
                     postnet_dims=16, encoder_K=2, lstm_dims=32,
                     postnet_K=2, num_highways=1,
                     mode="attention_forcing_online")
N_MELS = 80


def _batch(rng, B=2, T_text=8, steps=8):
    x = jnp.asarray(rng.randint(1, 148, (B, T_text)))
    m = jnp.asarray(rng.uniform(-4, 4, (B, N_MELS, steps)).astype(np.float32))
    return x, m


def test_af_online_step(rng):
    r = 2
    teacher = taco.init_tacotron(jax.random.PRNGKey(0), TTS, N_MELS)
    state = tt.create_train_state(jax.random.PRNGKey(1), TTS, N_MELS, 1e-3)
    x, m = _batch(rng)
    attn_ref = tt.teacher_attn_ref(teacher, x, m, TTS, r,
                                   jax.random.PRNGKey(2))
    assert attn_ref.shape == (2, m.shape[2] // r, x.shape[1])
    np.testing.assert_allclose(np.asarray(attn_ref.sum(-1)), 1.0, atol=1e-5)

    losses = []
    for i in range(5):
        state, metrics = tt.train_step_af(
            state, x, m, attn_ref, TTS, r, 1e-3, jax.random.PRNGKey(i),
            attn_loss_coeff=1.0, offline=False)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert float(metrics["loss_attn"]) >= 0  # KL is nonnegative


def test_af_offline_step(rng):
    r = 2
    state = tt.create_train_state(jax.random.PRNGKey(1), TTS, N_MELS, 1e-3)
    x, m = _batch(rng)
    attn_ref = rng.uniform(0, 1, (2, m.shape[2] // r, x.shape[1]))
    attn_ref = jnp.asarray((attn_ref / attn_ref.sum(-1, keepdims=True))
                           .astype(np.float32))
    state, metrics = tt.train_step_af(
        state, x, m, attn_ref, TTS, r, 1e-3, jax.random.PRNGKey(0),
        attn_loss_coeff=2.0, offline=True)
    assert np.isfinite(float(metrics["loss"]))
    # offline attn loss is the L1 of the maps (train_tacotron.py:387)
    assert float(metrics["loss_attn"]) == pytest.approx(
        float(jnp.mean(jnp.abs(metrics["attn"] - attn_ref))), rel=1e-5)


def test_attention_kl_properties(rng):
    a = rng.uniform(0.1, 1, (2, 4, 8)).astype(np.float32)
    a /= a.sum(-1, keepdims=True)
    assert float(tt.attention_kl(jnp.asarray(a), jnp.asarray(a))) \
        == pytest.approx(0.0, abs=1e-6)
    b = np.roll(a, 1, axis=-1)
    assert float(tt.attention_kl(jnp.asarray(b), jnp.asarray(a))) > 0


def test_session_for_step():
    sched = ((7, 1e-3, 10, 32), (5, 1e-4, 100, 32), (2, 1e-4, 180, 16))
    assert tt.session_for_step(sched, 0) == (7, 1e-3, 10, 32)
    assert tt.session_for_step(sched, 10) == (5, 1e-4, 100, 32)
    assert tt.session_for_step(sched, 150) == (2, 1e-4, 180, 16)
    assert tt.session_for_step(sched, 999) == (2, 1e-4, 180, 16)


def test_af_train_step_on_mesh():
    """AF-offline step data-parallel over the 8-device CPU mesh (the scan
    path — resolve_recurrence keeps pallas off meshes): finite loss,
    params stay replicated. TF has this coverage in test_train.py; this
    pins the AF step's sharding behavior too."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wavernn_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    mesh = make_mesh()
    B, G, r = 16, 3, 2
    state = tt.create_train_state(jax.random.PRNGKey(0), TTS, 80, 1e-3)
    state = tt.TTSTrainState(replicate(mesh, state.params),
                             replicate(mesh, state.opt_state),
                             jax.device_put(state.step,
                                            NamedSharding(mesh, P())))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, 148, (B, 24)))
    m = jnp.asarray(rng.randn(B, 80, G * r).astype(np.float32))
    ar = rng.rand(B, G, 24).astype(np.float32)
    ar = jnp.asarray(ar / ar.sum(-1, keepdims=True))
    x, m, ar = shard_batch(mesh, (x, m, ar))
    state, metrics = tt.train_step_af(state, x, m, ar, TTS, r, 1e-3,
                                      jax.random.PRNGKey(1), offline=True)
    assert np.isfinite(float(metrics["loss"]))
    leaf = state.params["decoder"]["mel_proj"]["w"]
    assert leaf.sharding.is_fully_replicated
