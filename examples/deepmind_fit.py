"""Shared harness for the single-signal DeepMind WaveRNN notebook recipes.

Reference notebooks NB2/NB3 both do: split one wav into coarse/fine bytes,
train the dual-softmax WaveRNN on random seq_len-960 windows (truncated
BPTT), then free-run the model and save the wav (NB2 cells 6-13, NB3 cells
13-20). Only the source signal, batch size and step budget differ — this
module holds the common loop, the nb2/nb3 scripts set the configs.

TPU-first shape: the reference trains with a per-sample Python loop over
960 steps; here forward_seq is a lax.scan with hoisted input GEMMs, so one
jit'd step consumes the whole window.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def fit_and_generate(signal_i16, sample_rate, *, steps, batch, seq_len,
                     gen_len, out_path, hidden=896, lr=1e-3, log_every=25,
                     seed=0):
    """Train on random windows of one int16 signal; save the free-run wav."""
    import jax
    import jax.numpy as jnp
    import optax

    from wavernn_tpu.dsp.audio import save_wav, split_signal
    from wavernn_tpu.models import deepmind as dm

    coarse, fine = split_signal(signal_i16.astype(np.int64))

    params = dm.init_deepmind(jax.random.PRNGKey(seed), hidden)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    rng = np.random.RandomState(seed)

    @jax.jit
    def step(params, opt_state, cb, fb):
        def loss_fn(p):
            oc, of = dm.forward_seq(p, cb, fb)
            lc = -jnp.mean(jnp.take_along_axis(
                jax.nn.log_softmax(oc), cb[:, 1:, None].astype(jnp.int32),
                axis=-1))
            lf = -jnp.mean(jnp.take_along_axis(
                jax.nn.log_softmax(of), fb[:, 1:, None].astype(jnp.int32),
                axis=-1))
            return lc + lf
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    start = time.time()
    for i in range(1, steps + 1):
        starts = rng.randint(0, len(coarse) - seq_len - 1, batch)
        cb = jnp.asarray(np.stack([coarse[s:s + seq_len + 1] for s in starts]))
        fb = jnp.asarray(np.stack([fine[s:s + seq_len + 1] for s in starts]))
        params, opt_state, loss = step(params, opt_state, cb, fb)
        if i % log_every == 0 or i == steps:
            speed = i / (time.time() - start)
            print(f"step {i}/{steps} loss {float(loss):.3f} "
                  f"({speed:.1f} steps/s)")

    print(f"generating {gen_len} samples...")
    sig, _, _ = dm.generate(params, gen_len, jax.random.PRNGKey(seed + 1))
    wav = np.asarray(sig) / 2 ** 15
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    save_wav(wav, out_path, sample_rate)
    print(f"saved {out_path}")
    return wav
