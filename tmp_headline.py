"""Diagnose pipelined-vs-latency inversion: host-input vs device-resident."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr

dsp = DSPConfig()
voc = WaveRNNConfig(mode="MOL")
params = wr.init_wavernn(jax.random.PRNGKey(1), voc, dsp)
frames = 5377
rng = np.random.RandomState(0)
mels_np = rng.uniform(0.2, 0.8, (1, dsp.num_mels, frames)).astype(np.float32)
mels_dev = jnp.asarray(mels_np)
np.asarray(jnp.sum(mels_dev))
wave_len = (frames - 1) * dsp.hop_length

t0 = time.time()
np.asarray(jnp.sum(wr.generate_fast(params, mels_dev, voc, dsp,
                                    jax.random.PRNGKey(0))))
print(f"warmup: {time.time()-t0:.1f}s", flush=True)

def measure(mels, label):
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(wr.generate_fast(params, mels, voc, dsp,
                                            jax.random.PRNGKey(i + 1))))
        ts.append(time.perf_counter() - t0)
    lat = float(np.median(ts))
    reps = 6
    t0 = time.perf_counter()
    sums = [jnp.sum(wr.generate_fast(params, mels, voc, dsp,
                                     jax.random.PRNGKey(100 + i)))
            for i in range(reps)]
    np.asarray(jnp.stack(sums))
    pip = (time.perf_counter() - t0) / reps
    print(f"{label}: latency {lat*1e3:.0f} ms, pipelined {pip*1e3:.0f} ms/utt"
          f" -> {wave_len/pip/1e3:.0f} kHz", flush=True)

measure(mels_np, "numpy-input ")
measure(mels_dev, "device-input")
measure(mels_dev, "device-again")
