"""Opt-in hardware tier: Pallas kernel correctness on the live TPU backend.

Run with ``WAVERNN_TPU_TESTS=1 python -m pytest tests -m tpu``. These are
the checks interpret-mode CPU parity cannot cover — Mosaic lowering of the
real kernel (the round-1 bf16 `vector.broadcast` verifier bug is exactly
this class). bench.py embeds the same gates so every driver bench run
records them in BENCH_r{N}.json.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    import jax
    if jax.devices()[0].platform not in ("tpu",):
        pytest.skip("no TPU backend available")
    return jax.devices()[0]


def test_kernel_parity_on_hardware(tpu_backend):
    """Scan oracle vs Pallas kernel, identical injected noise, on silicon:
    MOL f32, RAW f32, state-I/O snapshot+resume, bf16-weights agreement."""
    from wavernn_tpu.benchmarks import parity_checks

    out = parity_checks(B=8, T=512)
    assert out["parity_ok_mol"], out
    assert out["parity_ok_raw"], out
    assert out["parity_ok_state"], out
    assert out["parity_ok_mol_bf16"], out
    assert out["parity_ok_mol_bf16_gates"], out
    assert out["parity_ok_fused"], out


def test_block_sparse_kernel_on_hardware(tpu_backend):
    """Mask-specialized block-sparse kernel lowers through Mosaic and
    matches the dense kernel exactly on block-pruned weights (timing +
    parity also recorded by bench.py's kernel_variants_bench)."""
    from wavernn_tpu.benchmarks import kernel_variants_bench

    out = kernel_variants_bench(B=8, T=1024)
    assert out["parity_ok_sparse"], out


def test_generate_fast_waveform_sane_on_hardware(tpu_backend):
    """End-to-end generate_fast on the chip produces a bounded, non-trivial
    waveform (the round-1 bench asserted only shape)."""
    import jax

    from wavernn_tpu.config import Config
    from wavernn_tpu.models import wavernn as wr

    cfg = Config()
    params = wr.init_wavernn(jax.random.PRNGKey(1), cfg.voc, cfg.dsp)
    rng = np.random.RandomState(0)
    frames = 200
    mels = rng.uniform(0.2, 0.8, (1, cfg.dsp.num_mels, frames)).astype(np.float32)
    wav = np.asarray(wr.generate_fast(params, mels, cfg.voc, cfg.dsp,
                                      jax.random.PRNGKey(0)))
    assert wav.shape == ((frames - 1) * cfg.dsp.hop_length,)
    assert np.all(np.isfinite(wav))
    # per-fold samples are in [-1,1]; equal-power crossfade of untrained
    # near-full-scale folds can legitimately sum to sqrt(2) in overlaps
    assert np.abs(wav).max() <= np.sqrt(2) + 1e-5
    assert np.abs(wav).std() > 1e-4  # not silence/constant


def test_streaming_pallas_on_hardware(tpu_backend):
    """StreamingVocoder's Pallas state-I/O path (block-to-block RNN state
    handoff through the kernel's snapshot outputs) matches the scan
    streaming path on silicon with shared injected noise."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import Config
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.streaming import StreamingVocoder

    cfg = Config()
    params = wr.init_wavernn(jax.random.PRNGKey(1), cfg.voc, cfg.dsp)
    rng = np.random.RandomState(0)
    frames = 40
    mels = rng.uniform(0.2, 0.8, (cfg.dsp.num_mels, frames)).astype(np.float32)
    T = frames * cfg.dsp.hop_length
    nr_mix = cfg.voc.n_classes(cfg.dsp.bits) // 3
    noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, 1, nr_mix))
                         .astype(np.float32)),
             jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, 1))
                         .astype(np.float32)))

    outs = {}
    for name, use_pallas in [("pallas", True), ("scan", False)]:
        sv = StreamingVocoder(params, cfg.voc, cfg.dsp, jax.random.PRNGKey(0),
                              chunk_frames=16, use_pallas=use_pallas,
                              noise=noise)
        outs[name] = np.concatenate([sv.feed(mels), sv.flush()])
    assert outs["pallas"].shape == outs["scan"].shape == (T,)
    # same autoregressive trajectory, f32 rounding-level differences
    np.testing.assert_allclose(outs["pallas"], outs["scan"], atol=1e-3)


def test_tacotron_decode_kernel_on_hardware(tpu_backend):
    """Persistent-weights Tacotron decode kernel (ops/pallas_taco.py) vs
    the scan oracle on silicon: full-size decoder, r=2, 500 groups."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import Config
    from wavernn_tpu.models import tacotron as taco

    cfg = Config()
    params = taco.init_tacotron(jax.random.PRNGKey(0), cfg.tts,
                                cfg.dsp.num_mels)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, 148, (1, 70)))
    key = jax.random.PRNGKey(3)
    mel_k, lin_k, attn_k, nv_k = taco._generate_kernel(
        params, x, cfg.tts, 2, 1000, cfg.dsp.num_mels, key)
    mel_s, lin_s, attn_s, nv_s = taco._generate_scan(
        params, x, cfg.tts, 2, 1000, cfg.dsp.num_mels, key)
    assert int(nv_k[0]) == int(nv_s[0])
    np.testing.assert_allclose(np.asarray(attn_k), np.asarray(attn_s),
                               atol=5e-4)
    # autoregressive f32 trajectories accumulate rounding differences
    # (different matmul tilings); lockstep keeps them at noise level
    np.testing.assert_allclose(np.asarray(mel_k), np.asarray(mel_s),
                               atol=5e-3)


def test_in_kernel_prng_sampling_on_hardware(tpu_backend):
    """Production sampling noise comes from the on-core PRNG (no (T, B, ·)
    uniforms tensor in HBM). No oracle exists for the hardware PRNG stream,
    so gate on: finite + bounded + non-degenerate draws, key-determinism,
    and key-sensitivity — for both MOL and RAW. (Would have caught the
    signed-shift bug: prng_random_bits >> 8 sign-fills, u < 0 -> log NaN.)"""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import DSPConfig, WaveRNNConfig
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.ops.pallas_gen import generate_pallas

    dsp = DSPConfig()
    rng = np.random.RandomState(0)
    for mode in ("MOL", "RAW"):
        voc = WaveRNNConfig(mode=mode)
        params = wr.init_wavernn(jax.random.PRNGKey(1), voc, dsp)
        B, T = 8, 512
        mels_up = jnp.asarray(
            rng.randn(B, T, dsp.num_mels).astype(np.float32)) * 0.3
        aux = jnp.asarray(
            rng.randn(B, T, voc.res_out_dims).astype(np.float32)) * 0.3
        a = np.asarray(generate_pallas(params, mels_up, aux, voc, dsp.bits,
                                       jax.random.PRNGKey(0)))
        b = np.asarray(generate_pallas(params, mels_up, aux, voc, dsp.bits,
                                       jax.random.PRNGKey(7)))
        c = np.asarray(generate_pallas(params, mels_up, aux, voc, dsp.bits,
                                       jax.random.PRNGKey(0)))
        assert np.isfinite(a).all(), mode
        assert a.min() >= -1.0 and a.max() <= 1.0, mode
        assert a.std() > 1e-3, mode
        assert not np.allclose(a, b), mode   # key-sensitive
        np.testing.assert_allclose(a, c)     # key-deterministic


def test_fused_sparse_kernel_on_hardware(tpu_backend):
    """Pruned serving on the production path: the fused-conditioning
    kernel with the single-dot sparse schedule lowers through Mosaic and
    matches the dense fused kernel on block-pruned weights with shared
    injected noise."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import DSPConfig, WaveRNNConfig
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.ops.pallas_gen import pack_sparse
    from wavernn_tpu.train.pruning import PruneSpec, apply_masks, update_masks

    voc = WaveRNNConfig(mode="MOL")
    dsp = DSPConfig()
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, dsp)
    spec = PruneSpec([(("rnn1", "wi"), 3), (("rnn1", "wh"), 3),
                      (("rnn2", "wi"), 3), (("rnn2", "wh"), 3),
                      (("fc1", "w"), 1), (("fc2", "w"), 1)])
    masks = update_masks(params, None, jnp.asarray(1.0), spec, t0=0, S=1,
                         Z=0.9375, block=(128, 128))
    mparams = apply_masks(params, masks, spec)
    packed = pack_sparse(mparams, voc)
    assert packed[0]

    from wavernn_tpu.ops.polyphase import fold_geometry

    rng = np.random.RandomState(0)
    frames = 56  # target=2200/overlap=550 -> small fold batch
    mels = rng.uniform(0.2, 0.8, (1, dsp.num_mels, frames)).astype(np.float32)
    n_folds, _, _, T_fold = fold_geometry(frames * dsp.hop_length, 2200, 550,
                                          dsp.hop_length)
    nr_mix = voc.n_classes(dsp.bits) // 3
    noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5,
                                     (T_fold, n_folds, nr_mix))
                         .astype(np.float32)),
             jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T_fold, n_folds))
                         .astype(np.float32)))
    kw = dict(target=2200, overlap=550, noise=noise,
              compute_dtype=jnp.float32)
    want = np.asarray(wr.generate_fast(mparams, mels, voc, dsp,
                                       jax.random.PRNGKey(0), **kw))
    got = np.asarray(wr.generate_fast(mparams, mels, voc, dsp,
                                      jax.random.PRNGKey(0),
                                      sparse_packed=packed, **kw))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_sparse_serving_surfaces_on_hardware(tpu_backend):
    """Every serving entry point serves a pruned checkpoint through the
    sparse schedule on silicon: generate_multi (batched), generate_sharded
    (crossfade shard_map), and the streaming block. Gate: finite, bounded,
    non-degenerate output that stays close to the dense path under shared
    noise where noise injection exists (multi), and sane under the on-core
    PRNG where it does not (sharded)."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import DSPConfig, WaveRNNConfig
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.ops import polyphase as Po
    from wavernn_tpu.ops.pallas_gen import pack_sparse
    from wavernn_tpu.parallel.gen_sharded import generate_sharded
    from wavernn_tpu.train.pruning import PruneSpec, apply_masks, update_masks

    voc = WaveRNNConfig(mode="MOL")
    dsp = DSPConfig()
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, dsp)
    spec = PruneSpec([(("rnn1", "wi"), 3), (("rnn1", "wh"), 3),
                      (("rnn2", "wi"), 3), (("rnn2", "wh"), 3),
                      (("fc1", "w"), 1), (("fc2", "w"), 1)])
    masks = update_masks(params, None, jnp.asarray(1.0), spec, t0=0, S=1,
                         Z=0.9375, block=(128, 128))
    mparams = apply_masks(params, masks, spec)
    packed = pack_sparse(mparams, voc)
    assert packed[0]
    rng = np.random.RandomState(0)
    target, overlap = 2200, 550

    # batched serving (one fused launch), shared injected noise vs dense
    frames = (56, 40)
    mels = [jnp.asarray(rng.uniform(0.2, 0.8, (dsp.num_mels, f))
                        .astype(np.float32)) for f in frames]
    fold_len = target + 2 * overlap
    n_folds = sum(Po.fold_geometry(f * dsp.hop_length, target, overlap,
                                   dsp.hop_length)[0] for f in frames)
    nr_mix = voc.n_classes(dsp.bits) // 3
    noise = (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5,
                                     (fold_len, n_folds, nr_mix))
                         .astype(np.float32)),
             jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (fold_len, n_folds))
                         .astype(np.float32)))
    kw = dict(target=target, overlap=overlap, noise=noise, device_out=True)
    want = [np.asarray(w) for w in wr.generate_multi(
        mparams, mels, voc, dsp, jax.random.PRNGKey(0), **kw)]
    got = [np.asarray(w) for w in wr.generate_multi(
        mparams, mels, voc, dsp, jax.random.PRNGKey(0),
        sparse_packed=packed, **kw)]
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=5e-4)

    # sharded crossfade serving (PRNG noise; gate on sanity)
    wav = generate_sharded(mparams, mels[0][None], voc, dsp,
                           jax.random.PRNGKey(0), target=target,
                           overlap=overlap, use_pallas=True,
                           sparse_packed=packed)
    assert wav.shape == ((frames[0] - 1) * dsp.hop_length,)
    assert np.isfinite(wav).all() and np.abs(wav).std() > 1e-4


def test_batched_tacotron_decode_kernel_on_hardware(tpu_backend):
    """Batched (B<=8) persistent-weights decode kernel vs the masked scan
    on silicon: mixed lengths, per-utterance stop masks, full-size
    decoder."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import Config
    from wavernn_tpu.models import tacotron as taco

    cfg = Config()
    params = taco.init_tacotron(jax.random.PRNGKey(0), cfg.tts,
                                cfg.dsp.num_mels)
    rng = np.random.RandomState(0)
    lens = [70, 45, 60, 30]
    x = jnp.asarray(np.stack(
        [np.pad(rng.randint(1, 148, (n,)), (0, max(lens) - n))
         for n in lens]))
    lens_a = jnp.asarray(lens)
    key = jax.random.PRNGKey(3)
    mel_k, lin_k, attn_k, nv_k = taco._generate_kernel_batch(
        params, x, lens_a, cfg.tts, 2, 500, cfg.dsp.num_mels, key)
    mel_s, lin_s, attn_s, nv_s = taco._generate_scan(
        params, x, cfg.tts, 2, 500, cfg.dsp.num_mels, key, text_lens=lens_a)
    np.testing.assert_array_equal(np.asarray(nv_k), np.asarray(nv_s))
    np.testing.assert_allclose(np.asarray(attn_k), np.asarray(attn_s),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(mel_k), np.asarray(mel_s),
                               atol=5e-3)


def test_training_gru_kernels_on_hardware(tpu_backend):
    """Training-recurrence kernels (ops/pallas_gru.py) on silicon: fwd
    parity vs the scan and custom-VJP gradients at the production shape
    (B=32, T=1375, H=512), f32 and bf16."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from wavernn_tpu.ops.pallas_gru import gru_seq_tm, gru_seq_ref

    T, B, H = 1375, 32, 512
    rng = np.random.RandomState(0)
    gi = jnp.asarray(rng.randn(T, B, 3 * H).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.randn(H, 3 * H).astype(np.float32) * 0.04)
    bh = jnp.asarray(rng.randn(3 * H).astype(np.float32) * 0.04)
    h0 = jnp.zeros((B, H), jnp.float32)
    co = jnp.asarray(rng.randn(T, B, H).astype(np.float32) * 0.1)

    for dt, tol_y, tol_g in ((jnp.float32, 2e-3, 5e-3),
                             (jnp.bfloat16, 2e-2, 1.5e-1)):
        a = tuple(v.astype(dt) for v in (gi, wh, bh, h0))
        ys_k = jax.jit(partial(gru_seq_tm, chunk=64))(*a)
        ys_r = jax.jit(gru_seq_ref)(*a)
        err = float(jnp.max(jnp.abs(ys_k.astype(jnp.float32)
                                    - ys_r.astype(jnp.float32))))
        assert err < tol_y, (dt, err)

        lk = lambda *q: jnp.sum(gru_seq_tm(*q) * co.astype(dt))
        lr_ = lambda *q: jnp.sum(gru_seq_ref(*q) * co.astype(dt))
        gk = jax.jit(jax.grad(lk, argnums=(0, 1)))(*a)
        gr = jax.jit(jax.grad(lr_, argnums=(0, 1)))(*a)
        for x_, y_, name in zip(gk, gr, ("dgi", "dwh")):
            x_ = np.asarray(x_, np.float32)
            y_ = np.asarray(y_, np.float32)
            rel = np.abs(x_ - y_).max() / (np.abs(y_).max() + 1e-6)
            assert rel < tol_g, (dt, name, rel)


def test_train_step_pallas_recurrence_on_hardware(tpu_backend):
    """Full WaveRNN train step, recurrence=pallas vs scan on silicon:
    loss parity at the production shape (the BENCH train rows measure the
    pallas path — this gates its numerics)."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import Config
    from wavernn_tpu.train import wavernn_train as wt

    cfg = Config()
    dsp, voc = cfg.dsp, cfg.voc
    seq_len = cfg.voc_train.seq_len
    mel_win = seq_len // dsp.hop_length + 2 * voc.pad
    rng = np.random.RandomState(0)
    B = 32
    x = jnp.asarray(rng.uniform(-1, 1, (B, seq_len)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (B, seq_len)).astype(np.float32))
    m = jnp.asarray(rng.uniform(0, 1, (B, dsp.num_mels, mel_win))
                    .astype(np.float32))
    state = wt.create_train_state(jax.random.PRNGKey(0), voc, dsp, 1e-4)

    losses = {}
    for rec in ("scan", "pallas"):
        _, metrics = wt.train_step(state, x, y, m, voc, dsp, 1e-4, 4.0,
                                   "bfloat16", None, rec)
        losses[rec] = float(metrics["loss"])
    assert abs(losses["scan"] - losses["pallas"]) < 2e-3 * abs(
        losses["scan"]), losses


def test_taco_tf_decoder_train_kernels_on_hardware(tpu_backend):
    """Tacotron TF-decoder training kernels (fwd + custom VJP,
    ops/pallas_taco_train.py) on silicon: forward parity and per-leaf
    gradient parity vs the scan run at f32-highest matmul precision (the
    BENCH taco_train rows measure this path — this gates its numerics)."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import TacotronConfig
    from wavernn_tpu.models import tacotron as taco
    from wavernn_tpu.train.tacotron_train import loss_tf

    tts = TacotronConfig(embed_dims=32, encoder_dims=128, decoder_dims=256,
                         postnet_dims=32, encoder_K=2, lstm_dims=512,
                         postnet_K=2, num_highways=1)
    B, T_text, r, G = 16, 72, 2, 12
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, 80)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, 148, (B, T_text)))
    m = jnp.asarray(rng.randn(B, 80, G * r).astype(np.float32))
    key = jax.random.PRNGKey(7)

    with jax.default_matmul_precision("float32"):
        grads, fwds = {}, {}
        for rec in ("scan", "pallas"):
            grads[rec] = jax.grad(
                lambda p: loss_tf(p, x, m, tts, r, key,
                                  recurrence=rec)[0])(params)
            fwds[rec] = taco.forward(params, x, m, tts, r, key,
                                     mode="teacher_forcing", training=True,
                                     recurrence=rec)
    for name, a, b in zip(("mel", "linear", "attn"), fwds["scan"][:3],
                          fwds["pallas"][:3]):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-3, f"fwd {name}: rel={err:.2e}"
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(grads["scan"])[0],
            jax.tree_util.tree_leaves(grads["pallas"])):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-7)
        assert err < 2e-3, (f"grad mismatch at "
                            f"{jax.tree_util.keystr(path)}: rel={err:.2e}")


def test_taco_af_decoder_train_kernels_on_hardware(tpu_backend):
    """Attention-forcing decoder training kernels on silicon (fwd + custom
    VJP through the in-kernel prenet and the attn_ref context): gradient
    parity vs the scan at f32-highest precision.  Tolerance is looser than
    the TF gate: AF feeds the mel output back through the prenet, so the
    forward is recurrent through mel and summation-order differences
    amplify (~3e-3 observed; the same-order CPU interpret test pins the
    math at <1e-3, tests/test_pallas_taco_train.py::test_af_grad_parity)."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import TacotronConfig
    from wavernn_tpu.models import tacotron as taco
    from wavernn_tpu.train.tacotron_train import loss_af

    tts = TacotronConfig(embed_dims=32, encoder_dims=128, decoder_dims=256,
                         postnet_dims=32, encoder_K=2, lstm_dims=512,
                         postnet_K=2, num_highways=1)
    B, T_text, r, G = 16, 72, 2, 12
    params = taco.init_tacotron(jax.random.PRNGKey(0), tts, 80)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, 148, (B, T_text)))
    m = jnp.asarray(rng.randn(B, 80, G * r).astype(np.float32))
    key = jax.random.PRNGKey(7)
    aref = jax.lax.stop_gradient(
        taco.forward(params, x, m, tts, r, jax.random.PRNGKey(99),
                     mode="teacher_forcing", training=False)[2])

    with jax.default_matmul_precision("float32"):
        grads = {rec: jax.grad(
            lambda p: loss_af(p, x, m, aref, tts, r, key, 1.0,
                              offline=True, recurrence=rec)[0])(params)
            for rec in ("scan", "pallas")}
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(grads["scan"])[0],
            jax.tree_util.tree_leaves(grads["pallas"])):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-7)
        assert err < 1e-2, (f"AF grad mismatch at "
                            f"{jax.tree_util.keystr(path)}: rel={err:.2e}")
