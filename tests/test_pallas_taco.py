"""Parity: Pallas Tacotron decode kernel vs the XLA scan oracle.

Interpret mode on CPU (Mosaic-lowering behavior is covered by the
hardware tier in tests/test_tpu_hardware.py and the bench parity gate).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import TacotronConfig
from wavernn_tpu.models import tacotron as taco
from wavernn_tpu.ops.pallas_taco import G_CHUNK, decode_pallas

N_MELS = 80


def _tts(**kw):
    # full-size decoder dims (the kernel's production shapes); small
    # encoder/postnet to keep the XLA halves quick
    base = dict(embed_dims=32, encoder_dims=128, decoder_dims=256,
                postnet_dims=32, encoder_K=2, lstm_dims=512, postnet_K=2,
                num_highways=1)
    base.update(kw)
    return TacotronConfig(**base)


def _setup(tts, T_text=70, seed=0):
    params = taco.init_tacotron(jax.random.PRNGKey(seed), tts, N_MELS)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randint(1, 148, (1, T_text)))
    k = jax.random.PRNGKey(3)
    enc, _ = taco.encoder_apply(params["encoder"], x, k, False, tts.dropout)
    encp = taco.L.linear(params["encoder_proj"], enc)
    mask = jnp.ones((T_text,), jnp.float32)
    return params, x, enc, encp, mask


def _scan_decoder_outputs(params, x, tts, r, steps):
    mel, linear, attn, n_valid = taco._generate_scan(
        params, x, tts, r, steps, N_MELS, jax.random.PRNGKey(3))
    return np.asarray(mel), np.asarray(attn), np.asarray(n_valid)


@pytest.mark.parametrize("r", [2, 5])
def test_decode_parity_no_stop(r):
    """Fresh xavier weights never hit the stop threshold: every group is a
    live decode step — checks the full recurrence (attention state, LSTM
    carries, frame-major mel layout)."""
    tts = _tts()
    params, x, enc, encp, mask = _setup(tts)
    steps = -(-130 // r) * r
    mel_k, attn_k, nv_k = decode_pallas(params, enc, encp, mask, tts, r,
                                        steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_decoder_outputs(params, x, tts, r, steps)

    assert int(nv_k[0]) == int(nv_s[0]) == steps // r
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def test_decode_parity_early_stop_and_freeze():
    """stop_threshold=+10 forces the stop at the first group with t > 10;
    the kernel must freeze state, replay the frozen-state group for the
    remaining output (exactly what the scan's frozen-state recompute
    emits), and report the same n_valid."""
    r = 2
    tts = dataclasses.replace(_tts(), stop_threshold=10.0)
    params, x, enc, encp, mask = _setup(tts, seed=1)
    steps = 64
    mel_k, attn_k, nv_k = decode_pallas(params, enc, encp, mask, tts, r,
                                        steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_decoder_outputs(params, x, tts, r, steps)

    assert int(nv_k[0]) == int(nv_s[0]) < steps // r
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)
    # the replay really is frozen: trailing groups identical
    tail = np.asarray(mel_k)[0, :, -r:]
    np.testing.assert_array_equal(np.asarray(mel_k)[0, :, -2 * r:-r], tail)


def test_generate_kernel_full_pipeline():
    """`generate(impl=...)` end-to-end (encoder + kernel decode + postnet)
    matches the scan implementation, including the n_valid trim."""
    tts = _tts()
    params = taco.init_tacotron(jax.random.PRNGKey(2), tts, N_MELS)
    rng = np.random.RandomState(2)
    ids = rng.randint(1, 148, (40,))

    # interpret-mode kernel via the jitted wrapper
    x = jnp.asarray(ids)[None]
    mel_k, lin_k, attn_k, nv_k = taco._generate_kernel(
        params, x, tts, 2, 120, N_MELS, jax.random.PRNGKey(0),
        interpret=True)
    mel_s, lin_s, attn_s, nv_s = taco._generate_scan(
        params, x, tts, 2, 120, N_MELS, jax.random.PRNGKey(0))
    assert int(nv_k[0]) == int(nv_s[0])
    np.testing.assert_allclose(np.asarray(mel_k), np.asarray(mel_s),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(lin_k), np.asarray(lin_s),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(attn_k), np.asarray(attn_s),
                               atol=2e-5)


def test_long_text_padding():
    """T_text above 113 crosses into the next 128-lane tile (the zero-wrap
    invariant pads to T_text + 15): the banded rolls must stay exact."""
    tts = _tts()
    params, x, enc, encp, mask = _setup(tts, T_text=150, seed=4)
    steps = 40
    mel_k, attn_k, nv_k = decode_pallas(params, enc, encp, mask, tts, 2,
                                        steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_decoder_outputs(params, x, tts, 2, steps)
    assert int(nv_k[0]) == int(nv_s[0])
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def _setup_batch(tts, lens, seed=0):
    params = taco.init_tacotron(jax.random.PRNGKey(seed), tts, N_MELS)
    rng = np.random.RandomState(seed)
    max_len = max(lens)
    x = jnp.asarray(np.stack(
        [np.pad(rng.randint(1, 148, (n,)), (0, max_len - n))
         for n in lens]))
    lens_a = jnp.asarray(lens)
    k_enc, _ = jax.random.split(jax.random.PRNGKey(3))
    enc, _ = taco.encoder_apply(params["encoder"], x, k_enc, False,
                                tts.dropout, lens=lens_a)
    encp = taco.L.linear(params["encoder_proj"], enc)
    tm = (jnp.arange(max_len)[None, :] < lens_a[:, None]).astype(jnp.float32)
    enc = enc * tm[..., None]
    encp = encp * tm[..., None]
    return params, x, lens_a, enc, encp, tm


def _scan_batch(params, x, lens, tts, r, steps):
    mel, linear, attn, n_valid = taco._generate_scan(
        params, x, tts, r, steps, N_MELS, jax.random.PRNGKey(3),
        text_lens=lens)
    return np.asarray(mel), np.asarray(attn), np.asarray(n_valid)


def test_batched_decode_parity_mixed_lengths():
    """B=4 mixed-length batch through the batched kernel == the masked
    scan: per-utterance pad-masked attention, lane-block replicated
    location conv, per-row state."""
    from wavernn_tpu.ops.pallas_taco import decode_pallas_batch

    tts = _tts()
    lens = [5, 15, 9, 12]
    params, x, lens_a, enc, encp, tm = _setup_batch(tts, lens)
    r, steps = 2, 24
    mel_k, attn_k, nv_k = decode_pallas_batch(params, enc, encp, tm, tts, r,
                                              steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def test_batched_decode_per_utterance_stop_and_freeze():
    """Per-row stop masks: each utterance freezes at ITS stop group, the
    frozen rows replay while live rows continue, and once all rows stop
    the whole group replays — n_valid and every emitted group must match
    the scan's per-element freeze semantics."""
    from wavernn_tpu.ops.pallas_taco import decode_pallas_batch

    r = 2
    tts = dataclasses.replace(_tts(), stop_threshold=10.0)
    lens = [7, 11, 4]
    params, x, lens_a, enc, encp, tm = _setup_batch(tts, lens, seed=5)
    steps = 64
    mel_k, attn_k, nv_k = decode_pallas_batch(params, enc, encp, tm, tts, r,
                                              steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    assert int(np.asarray(nv_k).max()) < steps // r  # stop actually fired
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def test_generate_batch_kernel_impl_matches_scan():
    """generate_batch(impl='pallas') full pipeline (length-aware encoder +
    batched kernel + postnet + per-utterance trim) == impl='scan'."""
    import functools

    tts = _tts()
    params = taco.init_tacotron(jax.random.PRNGKey(2), tts, N_MELS)
    rng = np.random.RandomState(2)
    sentences = [rng.randint(1, 148, (n,)) for n in (6, 14, 10)]
    key = jax.random.PRNGKey(7)
    # route the interpret flag through the jitted wrapper
    orig = taco._generate_kernel_batch
    taco._generate_kernel_batch = functools.partial(orig, interpret=True)
    try:
        got = taco.generate_batch(params, sentences, tts, r=2, steps=20,
                                  key=key, impl="pallas")
    finally:
        taco._generate_kernel_batch = orig
    want = taco.generate_batch(params, sentences, tts, r=2, steps=20,
                               key=key, impl="scan")
    for (mk, lk, ak), (ms, ls, asn) in zip(got, want):
        assert mk.shape == ms.shape
        np.testing.assert_allclose(mk, ms, atol=2e-4)
        np.testing.assert_allclose(lk, ls, atol=2e-3)
        np.testing.assert_allclose(ak, asn, atol=2e-5)


def test_batched_decode_long_text_two_tiles():
    """T_text > 113 pushes T_pad to 256 (two sublane tiles): the shared
    rolls of the replicated attention planes and the per-b context dots
    must stay exact across the tile boundary."""
    from wavernn_tpu.ops.pallas_taco import decode_pallas_batch

    tts = _tts()
    lens = [150, 40, 120]
    params, x, lens_a, enc, encp, tm = _setup_batch(tts, lens, seed=7)
    r, steps = 2, 16
    mel_k, attn_k, nv_k = decode_pallas_batch(params, enc, encp, tm, tts, r,
                                              steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def test_batched_decode_multiple_grid_chunks():
    """steps/r beyond one G_CHUNK(=128) grid step: output indexing, LIVE
    state carry-over across the grid boundary (no-stop regime), and the
    all-stopped replay spanning later chunks (stop regime)."""
    from wavernn_tpu.ops.pallas_taco import decode_pallas_batch

    r = 2
    lens = [9, 6]
    # stop regime: everything freezes in chunk 0, chunks 1-2 replay
    tts_stop = dataclasses.replace(_tts(), stop_threshold=10.0)
    params, x, lens_a, enc, encp, tm = _setup_batch(tts_stop, lens, seed=9)
    steps = 2 * G_CHUNK * r + 8  # 2 full grid chunks + a partial third
    mel_k, attn_k, nv_k = decode_pallas_batch(params, enc, encp, tm,
                                              tts_stop, r, steps, N_MELS,
                                              interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts_stop, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)

    # no-stop regime: live recurrent state must cross the chunk boundary
    tts = _tts()
    params, x, lens_a, enc, encp, tm = _setup_batch(tts, lens, seed=9)
    steps = (G_CHUNK + 4) * r
    mel_k, attn_k, nv_k = decode_pallas_batch(params, enc, encp, tm, tts, r,
                                              steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def test_batched_decode_b16_group_tiling():
    """B=16 mixed-length batch: two 8-row utterance groups tiled across
    the kernel grid in ONE launch (VERDICT r4 weak #3) == the masked scan,
    per-utterance n_valid included."""
    from wavernn_tpu.ops.pallas_taco import decode_pallas_batch

    tts = _tts()
    lens = [5, 15, 9, 12, 7, 14, 6, 11, 13, 4, 10, 8, 15, 5, 9, 12]
    params, x, lens_a, enc, encp, tm = _setup_batch(tts, lens, seed=11)
    r, steps = 2, 24
    mel_k, attn_k, nv_k = decode_pallas_batch(params, enc, encp, tm, tts, r,
                                              steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def test_batched_decode_b12_ragged_last_group():
    """B=12: the second utterance group has 4 padding rows — they must
    start stopped and never perturb the live rows."""
    from wavernn_tpu.ops.pallas_taco import decode_pallas_batch

    tts = _tts()
    lens = [5, 15, 9, 12, 7, 14, 6, 11, 13, 4, 10, 8]
    params, x, lens_a, enc, encp, tm = _setup_batch(tts, lens, seed=3)
    r, steps = 2, 24
    mel_k, attn_k, nv_k = decode_pallas_batch(params, enc, encp, tm, tts, r,
                                              steps, N_MELS, interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def test_stacked_decode_parity_mixed_lengths():
    """B=10 mixed-length batch through the LANE-STACKED decode kernel ==
    the masked scan: every utterance advances in the same plane ops per
    step (the B > 8 serving path, models/tacotron._generate_kernel_batch
    routing)."""
    from wavernn_tpu.ops.pallas_taco import decode_pallas_stacked

    tts = _tts()
    lens = [5, 15, 9, 12, 7, 14, 6, 11, 13, 8]
    params, x, lens_a, enc, encp, tm = _setup_batch(tts, lens)
    r, steps = 2, 24
    mel_k, attn_k, nv_k = decode_pallas_stacked(params, enc, encp, tm, tts,
                                                r, steps, N_MELS,
                                                interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)


def test_stacked_decode_stop_and_freeze():
    """Per-utterance stops in the stacked kernel: stopped rows freeze
    (state rows AND attention lanes) while live rows continue; the
    triggering group counts as valid; all-stopped replays the held
    group."""
    from wavernn_tpu.ops.pallas_taco import decode_pallas_stacked

    r = 2
    tts = dataclasses.replace(_tts(), stop_threshold=10.0)
    lens = [7, 11, 4, 9, 13, 5, 8, 10, 6]
    params, x, lens_a, enc, encp, tm = _setup_batch(tts, lens, seed=5)
    steps = 64
    mel_k, attn_k, nv_k = decode_pallas_stacked(params, enc, encp, tm, tts,
                                                r, steps, N_MELS,
                                                interpret=True)
    mel_s, attn_s, nv_s = _scan_batch(params, x, lens_a, tts, r, steps)
    np.testing.assert_array_equal(np.asarray(nv_k), nv_s)
    assert int(np.asarray(nv_k).max()) < steps // r
    np.testing.assert_allclose(np.asarray(mel_k), mel_s, atol=2e-4)
    np.testing.assert_allclose(np.asarray(attn_k), attn_s, atol=2e-5)
