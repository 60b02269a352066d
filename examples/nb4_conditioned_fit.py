#!/usr/bin/env python
"""NB2/NB3/NB4 equivalent: fit the conditioned (fatchord) WaveRNN to a
single wav and copy-synthesize it back (reference notebooks NB2-NB4b,
the "alternative model" RAW/NLL training path).

    python examples/nb4_conditioned_fit.py --wav path/to.wav --steps 500
Without --wav it trains on a synthetic harmonic signal.
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
    parser.add_argument("--wav", default=None)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--out", default="outputs/nb4")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import Config, WaveRNNConfig
    from wavernn_tpu.data.dataset import collate_vocoder
    from wavernn_tpu.data.preprocess import convert_file
    from wavernn_tpu.dsp.audio import load_wav, save_wav
    from wavernn_tpu.dsp.mel import melspectrogram_np
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.train import wavernn_train as wt

    cfg = Config(voc=WaveRNNConfig(mode="RAW"))
    if args.wav:
        y = load_wav(args.wav, cfg.dsp.sample_rate)
    else:
        sr = cfg.dsp.sample_rate
        t = np.arange(sr * 8) / sr
        y = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.25 * np.sin(2 * np.pi * 440 * t)
             + 0.12 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    from wavernn_tpu.dsp.audio import encode_mu_law
    mel = melspectrogram_np(y, cfg.dsp)
    quant = encode_mu_law(y, 2 ** cfg.dsp.bits).astype(np.int64)

    state = wt.create_train_state(jax.random.PRNGKey(0), cfg.voc, cfg.dsp,
                                  lr=1e-3)
    rng = np.random.RandomState(0)
    start = time.time()
    for i in range(1, args.steps + 1):
        batch = [(mel, quant)] * args.batch
        x, yb, m = collate_vocoder(batch, cfg, rng)
        state, metrics = wt.train_step(state, jnp.asarray(x), jnp.asarray(yb),
                                       jnp.asarray(m), cfg.voc, cfg.dsp,
                                       1e-3, 4.0)
        if i % 25 == 0:
            print(f"step {i}/{args.steps} loss {float(metrics['loss']):.3f} "
                  f"({i / (time.time() - start):.1f} steps/s)")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    n_frames = min(mel.shape[1], 200)
    print("generating...")
    wav = wr.generate(state.params, mel[None, :, :n_frames], cfg.voc, cfg.dsp,
                      jax.random.PRNGKey(1), batched=True, target=11000,
                      overlap=550, mu_law=True)
    save_wav(wav, out / "copy_synthesis.wav", cfg.dsp.sample_rate)
    save_wav(y[: len(wav)], out / "target.wav", cfg.dsp.sample_rate)
    print(f"saved {out}/copy_synthesis.wav")


if __name__ == "__main__":
    main()
