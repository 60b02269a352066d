import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from wavernn_tpu.models import deepmind as dm
from wavernn_tpu.dsp.audio import split_signal, combine_signal


def test_param_count_matches_reference():
    params = dm.init_deepmind(jax.random.PRNGKey(0))
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    assert abs(n - 3_050_000) < 10_000, n  # 3.050M (deepmind:171-176)


def test_cell_parity_vs_reference(reference_modules, rng):
    import torch
    torch.manual_seed(0)
    tm = reference_modules.deepmind.WaveRNN(hidden_size=64, quantisation=256)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {
        "R": {"w": jnp.asarray(sd["R.weight"].T)},
        "O1": {"w": jnp.asarray(sd["O1.weight"].T), "b": jnp.asarray(sd["O1.bias"])},
        "O2": {"w": jnp.asarray(sd["O2.weight"].T), "b": jnp.asarray(sd["O2.bias"])},
        "O3": {"w": jnp.asarray(sd["O3.weight"].T), "b": jnp.asarray(sd["O3.bias"])},
        "O4": {"w": jnp.asarray(sd["O4.weight"].T), "b": jnp.asarray(sd["O4.bias"])},
        "I_coarse": {"w": jnp.asarray(sd["I_coarse.weight"].T)},
        "I_fine": {"w": jnp.asarray(sd["I_fine.weight"].T)},
        "bias_u": jnp.asarray(sd["bias_u"]),
        "bias_r": jnp.asarray(sd["bias_r"]),
        "bias_e": jnp.asarray(sd["bias_e"]),
    }
    B = 3
    prev_y = rng.uniform(-1, 1, (B, 2)).astype(np.float32)
    hidden = rng.uniform(-1, 1, (B, 64)).astype(np.float32)
    cur_c = rng.uniform(-1, 1, (B, 1)).astype(np.float32)
    with __import__("torch").no_grad():
        import torch
        rc, rf, rh = tm(torch.tensor(prev_y), torch.tensor(hidden),
                        torch.tensor(cur_c))
    oc, of, h = dm.cell(params, jnp.asarray(prev_y), jnp.asarray(hidden),
                        jnp.asarray(cur_c))
    np.testing.assert_allclose(np.asarray(oc), rc.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(of), rf.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), rh.numpy(), atol=1e-5)


def test_generate_shapes():
    params = dm.init_deepmind(jax.random.PRNGKey(0), hidden_size=64)
    sig, c, f = dm.generate(params, 50, jax.random.PRNGKey(1))
    assert sig.shape == c.shape == f.shape == (50,)
    assert c.min() >= 0 and c.max() <= 255
    np.testing.assert_allclose(
        np.asarray(sig),
        np.asarray(combine_signal(np.asarray(c), np.asarray(f))))


def test_sine_fit_convergence(rng):
    """NB1 smoke test (BASELINE config #1): fit a sine wave, loss drops."""
    hidden = 64
    params = dm.init_deepmind(jax.random.PRNGKey(0), hidden_size=hidden)
    sr, T = 24000, 48
    t = np.arange(sr // 4) / sr
    x = np.sin(2 * np.pi * 440 * t) * 0.9
    sig16 = (x * 2 ** 15).astype(np.int64)
    coarse, fine = split_signal(sig16)

    B = 16
    starts = rng.randint(0, len(x) - T - 1, B)
    cb = np.stack([coarse[s:s + T + 1] for s in starts])
    fb = np.stack([fine[s:s + T + 1] for s in starts])

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p):
        oc, of = dm.forward_seq(p, jnp.asarray(cb), jnp.asarray(fb))
        tc = jnp.asarray(cb[:, 1:])
        tf_ = jnp.asarray(fb[:, 1:])
        lc = -jnp.mean(jnp.take_along_axis(jax.nn.log_softmax(oc),
                                           tc[..., None], axis=-1))
        lf = -jnp.mean(jnp.take_along_axis(jax.nn.log_softmax(of),
                                           tf_[..., None], axis=-1))
        return lc + lf

    step = jax.jit(lambda p, o: (lambda l, g: (
        l, *[x for x in [optax.apply_updates(p, tx.update(g, o, p)[0]),
                         tx.update(g, o, p)[1]]]))(
        *jax.value_and_grad(loss_fn)(p)))

    losses = []
    for i in range(60):
        l, params, opt_state = step(params, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 1.0, (losses[0], losses[-1])
