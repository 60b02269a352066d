import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import TacotronConfig
from wavernn_tpu.models import tacotron as taco

TTS = TacotronConfig()
# the architecture couples encoder_dims=128 / decoder_dims=256 to the fixed
# PreNet dims (tacotron.py:136); shrink everything else
SMALL = TacotronConfig(embed_dims=32, encoder_dims=128, decoder_dims=256,
                       postnet_dims=16, encoder_K=4, lstm_dims=48,
                       postnet_K=3, num_highways=2)
N_MELS = 80


def _torch_ref(reference_modules, tts, n_mels=N_MELS, num_chars=148,
               mode="teacher_forcing"):
    import torch
    torch.manual_seed(0)
    m = reference_modules.tacotron.Tacotron(
        embed_dims=tts.embed_dims, num_chars=num_chars,
        encoder_dims=tts.encoder_dims, decoder_dims=tts.decoder_dims,
        n_mels=n_mels, fft_bins=n_mels, postnet_dims=tts.postnet_dims,
        encoder_K=tts.encoder_K, lstm_dims=tts.lstm_dims,
        postnet_K=tts.postnet_K, num_highways=tts.num_highways,
        dropout=tts.dropout, stop_threshold=tts.stop_threshold, mode=mode)
    return m


def test_param_count_matches_reference():
    params = taco.init_tacotron(jax.random.PRNGKey(0), TTS, N_MELS)
    n = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "mean" in keys or "var" in keys:
            continue
        n += leaf.size
    assert abs(n - 11_088_000) < 5000, n  # 11.088M (tacotron.py:514-519)


def test_forward_shapes(rng):
    tts = SMALL
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, N_MELS, 148)
    B, T_text, r, steps = 2, 11, 2, 12
    x = jnp.asarray(rng.randint(1, 148, (B, T_text)))
    m = jnp.asarray(rng.uniform(-4, 4, (B, N_MELS, steps)).astype(np.float32))
    mel, linear, attn, _ = taco.forward(params, x, m, tts, r,
                                        jax.random.PRNGKey(1))
    assert mel.shape == (B, N_MELS, steps)
    assert linear.shape == (B, N_MELS, steps)
    assert attn.shape == (B, steps // r, T_text)
    # smooth attention rows sum to 1
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.parametrize("r", [1, 2, 5])
def test_forward_parity_vs_reference(reference_modules, rng, r):
    """GTA (eval-mode teacher-forced) forward parity with the reference."""
    import torch
    from wavernn_tpu.compat.torch_import import import_tacotron
    tts = SMALL
    tm = _torch_ref(reference_modules, tts)
    tm.r = r
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_tacotron(sd, tts)

    B, T_text, steps = 2, 9, 5 * r
    x = rng.randint(1, 148, (B, T_text))
    m = rng.uniform(-4, 4, (B, N_MELS, steps)).astype(np.float32)

    with torch.no_grad():
        ref_mel, ref_lin, ref_attn = tm(torch.tensor(x), torch.tensor(m),
                                        generate_gta=True)
    mel, lin, attn, _ = taco.forward(params, jnp.asarray(x), jnp.asarray(m),
                                     tts, r, jax.random.PRNGKey(0),
                                     training=False, generate_gta=True)
    np.testing.assert_allclose(np.asarray(mel), ref_mel.numpy(), atol=5e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(lin), ref_lin.numpy(), atol=5e-4,
                               rtol=1e-3)
    # reference attn: (B, n_groups, T_text) after cat along dim 1
    np.testing.assert_allclose(np.asarray(attn),
                               ref_attn.detach().numpy().reshape(
                                   B, steps // r, T_text),
                               atol=1e-4)


def test_attention_forcing_uses_ref_context(reference_modules, rng):
    """attention_forcing parity: context comes from attn_ref, scores still
    computed (tacotron.py:250-257)."""
    import torch
    from wavernn_tpu.compat.torch_import import import_tacotron
    tts = SMALL
    r = 2
    tm = _torch_ref(reference_modules, tts, mode="attention_forcing_offline")
    tm.r = r
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_tacotron(sd, tts)

    B, T_text, steps = 2, 9, 8
    x = rng.randint(1, 148, (B, T_text))
    m = rng.uniform(-4, 4, (B, N_MELS, steps)).astype(np.float32)
    attn_ref = rng.uniform(0, 1, (B, steps // r, T_text)).astype(np.float32)
    attn_ref /= attn_ref.sum(-1, keepdims=True)

    with torch.no_grad():
        # reference eval-mode forward would re-enable train(); bypass via
        # generate_gta=False but force eval by patching train()
        tm.train = lambda *a, **k: tm  # freeze eval mode
        ref_mel, ref_lin, ref_attn = tm(torch.tensor(x), torch.tensor(m),
                                        attn_ref=torch.tensor(attn_ref))
    mel, lin, attn, _ = taco.forward(params, jnp.asarray(x), jnp.asarray(m),
                                     tts, r, jax.random.PRNGKey(0),
                                     mode="attention_forcing_offline",
                                     training=False,
                                     attn_ref=jnp.asarray(attn_ref))
    np.testing.assert_allclose(np.asarray(mel), ref_mel.numpy(), atol=5e-4,
                               rtol=1e-3)


def test_generate_stops_and_shapes(rng):
    tts = SMALL
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, N_MELS, 148)
    x = rng.randint(1, 148, (7,))
    mel, linear, attn = taco.generate(params, x, tts, r=2, steps=40)
    assert mel.shape[0] == N_MELS
    assert mel.shape[1] <= 40 and mel.shape[1] % 2 == 0
    assert linear.shape == mel.shape
    assert attn.shape == (mel.shape[1] // 2, 7)


def test_generate_batch(rng):
    tts = SMALL
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, N_MELS, 148)
    sentences = [rng.randint(1, 148, (n,)) for n in (5, 9, 7)]
    outs = taco.generate_batch(params, sentences, tts, r=2, steps=30)
    assert len(outs) == 3
    for x, (mel, lin, attn) in zip(sentences, outs):
        assert mel.shape[0] == N_MELS and mel.shape[1] <= 30
        assert lin.shape == mel.shape
        assert attn.shape == (mel.shape[1] // 2, len(x))


def test_generate_batch_matches_single(rng):
    """Padding + per-element stop masks must not change a single utterance's
    output (modulo identical PRNG stream)."""
    tts = SMALL
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, N_MELS, 148)
    x = rng.randint(1, 148, (8,))
    single = taco.generate(params, x, tts, r=2, steps=20,
                           key=jax.random.PRNGKey(5))
    batched = taco.generate_batch(params, [x], tts, r=2, steps=20,
                                  key=jax.random.PRNGKey(5))[0]
    np.testing.assert_allclose(batched[0], single[0], atol=1e-5)


def test_generate_batch_mixed_lengths_matches_single(rng):
    """The round-3 hole: a SHORT utterance batched with longer ones must
    decode identically to running it alone. Unmasked smooth attention
    (sigmoid/sum over the padded axis) put 67% of a 5-token utterance's
    attention mass on pad positions; the fix masks the LSA normalization
    AND makes the encoder length-aware (conv re-zeroing + right-aligned
    backward GRU), so this asserts exact per-utterance parity."""
    tts = SMALL
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, N_MELS, 148)
    sentences = [rng.randint(1, 148, (n,)) for n in (5, 15, 9)]
    key = jax.random.PRNGKey(5)
    batched = taco.generate_batch(params, sentences, tts, r=2, steps=20,
                                  key=key)
    for x, got in zip(sentences, batched):
        single = taco.generate(params, x, tts, r=2, steps=20, key=key)
        assert got[0].shape == single[0].shape  # same stop step
        np.testing.assert_allclose(got[0], single[0], atol=2e-5)  # mel
        np.testing.assert_allclose(got[1], single[1], atol=2e-5)  # linear
        np.testing.assert_allclose(got[2], single[2], atol=2e-5)  # attn


def test_generate_batch_no_attention_on_padding(rng):
    """Per-utterance attention rows must renormalize over real text only."""
    tts = SMALL
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, N_MELS, 148)
    sentences = [rng.randint(1, 148, (n,)) for n in (5, 15)]
    outs = taco.generate_batch(params, sentences, tts, r=2, steps=12,
                               key=jax.random.PRNGKey(2))
    for x, (_, _, attn) in zip(sentences, outs):
        assert attn.shape[1] == len(x)
        # mass over the REAL positions is the full budget
        np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-5)

def test_generate_chunked_early_exit_matches_full_scan(rng):
    """Early-exit while_loop decode must be bit-identical to an unchunked
    scan over all groups — including mel/linear beyond the stop step (the
    postnet BiGRU sees the whole buffer) — in both the stopping and the
    never-stopping regime."""
    import dataclasses

    params = taco.init_tacotron(jax.random.PRNGKey(0), SMALL, N_MELS, 148)
    x = jnp.asarray(rng.randint(1, 148, (2, 9)))
    r, steps = 2, 64
    key = jax.random.PRNGKey(3)
    # stop_threshold above any output -> every utterance stops at t>10
    tts_stop = dataclasses.replace(SMALL, stop_threshold=1e9)

    for tts in (SMALL, tts_stop):
        full = taco._generate_scan(params, x, tts, r, steps, N_MELS, key,
                                   chunk_groups=steps // r)  # one chunk
        chunked = taco._generate_scan(params, x, tts, r, steps, N_MELS, key,
                                      chunk_groups=4)
        for a, b in zip(chunked, full):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    # and the stop actually fired early
    *_, n_valid = taco._generate_scan(params, x, tts_stop, r, steps, N_MELS,
                                      key, chunk_groups=4)
    assert int(np.asarray(n_valid).max()) * r < steps


def test_cumulative_attention_stays_f32_under_bf16():
    """The location-sensitive attention accumulator is summed over every
    decoder group; in bf16 its ulp exceeds a per-step attention weight past
    ~256 so the location feature would freeze on long utterances. The carry
    must stay f32 even when the decoder computes in bf16."""
    state = taco.init_decoder_state(2, 11, SMALL, N_MELS, jnp.bfloat16)
    assert state.cumulative.dtype == jnp.float32
    assert state.attention.dtype == jnp.bfloat16

    # an f32 accumulator still moves when fed tiny bf16 increments on top of
    # a large running total (the bf16 accumulator would be stuck)
    big = jnp.float32(512.0)
    inc = jnp.bfloat16(0.25)
    assert big + inc.astype(jnp.float32) > big
    assert jnp.bfloat16(512.0) + inc == jnp.bfloat16(512.0)  # why f32 matters


def test_forward_bf16_cumulative_not_frozen(rng):
    """bf16 forward over enough groups that a bf16 accumulator would start
    dropping increments; the attention rows must remain normalized and the
    output finite."""
    tts = SMALL
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, N_MELS, 148)
    B, T_text, r, steps = 1, 7, 5, 40
    x = jnp.asarray(rng.randint(1, 148, (B, T_text)))
    m = jnp.asarray(rng.uniform(-4, 4, (B, N_MELS, steps)).astype(np.float32))
    mel, linear, attn, _ = taco.forward(params, x, m, tts, r,
                                        jax.random.PRNGKey(1),
                                        compute_dtype=jnp.bfloat16)
    assert mel.dtype == jnp.float32 and np.isfinite(np.asarray(mel)).all()
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=2e-2)
