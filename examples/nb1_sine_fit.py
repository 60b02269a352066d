#!/usr/bin/env python
"""NB1 equivalent: fit the DeepMind coarse/fine WaveRNN to a sine wave and
generate from it (reference notebooks/NB1 - Fit a Sine Wave.ipynb;
BASELINE config #1).

    python examples/nb1_sine_fit.py --steps 300 --out outputs/nb1
"""
import argparse
import sys
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
import time
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--hidden", type=int, default=896)
    parser.add_argument("--seq_len", type=int, default=960)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--gen_len", type=int, default=10_000)
    parser.add_argument("--sample_rate", type=int, default=24_000)
    parser.add_argument("--out", default="outputs/nb1")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from wavernn_tpu.dsp.audio import save_wav, split_signal
    from wavernn_tpu.models import deepmind as dm

    sr = args.sample_rate
    t = np.arange(sr * 5) / sr
    x = np.sin(2 * np.pi * 220 * t) * 0.8
    coarse, fine = split_signal((x * 2 ** 15).astype(np.int64))

    params = dm.init_deepmind(jax.random.PRNGKey(0), args.hidden)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)

    @jax.jit
    def step(params, opt_state, cb, fb):
        def loss_fn(p):
            oc, of = dm.forward_seq(p, cb, fb)
            lc = -jnp.mean(jnp.take_along_axis(
                jax.nn.log_softmax(oc), cb[:, 1:, None], axis=-1))
            lf = -jnp.mean(jnp.take_along_axis(
                jax.nn.log_softmax(of), fb[:, 1:, None], axis=-1))
            return lc + lf
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    start = time.time()
    for i in range(1, args.steps + 1):
        starts = rng.randint(0, len(x) - args.seq_len - 1, args.batch)
        cb = jnp.asarray(np.stack([coarse[s:s + args.seq_len + 1]
                                   for s in starts]))
        fb = jnp.asarray(np.stack([fine[s:s + args.seq_len + 1]
                                   for s in starts]))
        params, opt_state, loss = step(params, opt_state, cb, fb)
        if i % 25 == 0:
            speed = i / (time.time() - start)
            print(f"step {i}/{args.steps} loss {float(loss):.3f} "
                  f"({speed:.1f} steps/s)")

    print(f"generating {args.gen_len} samples...")
    sig, c, f = dm.generate(params, args.gen_len, jax.random.PRNGKey(1))
    wav = np.asarray(sig) / 2 ** 15
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_wav(wav, out / "model_output.wav", sr)
    print(f"saved {out / 'model_output.wav'}")


if __name__ == "__main__":
    main()
