#!/usr/bin/env python
"""Scaling benchmark: generated audio-seconds/s at 1 chip vs N chips
(BASELINE.md target: >= 80% efficiency to 2 hosts).

Folds are the data-parallel axis; each device runs the sample loop on its
shard of the fold batch with zero mid-loop communication (crossfade mode).
On single-chip hardware this still reports the 1-device row and validates
the N-device path on a forced-host-device CPU mesh when requested:

    python bench_scaling.py            # real devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py --cpu  # 8 virtual devices
"""
import argparse
import json
import sys
import time

import numpy as np


def fold_batch_sweep(steps: int = 16384, batches=(1, 2, 4, 8, 16, 32, 64, 128)):
    """Single-chip saturation curve: sample-kernel throughput vs fold batch.

    The sample loop is latency-bound per step, so samples/s should scale
    near-linearly with the fold batch until per-step cost starts growing —
    this measures where (BASELINE.md scaling row, 1-chip granularity).
    Long runs + a scalar-reduction fence keep the per-launch tunnel
    overhead (~35 ms) and the wav export out of the marginal number.
    """
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import DSPConfig, WaveRNNConfig
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.ops.pallas_gen import generate_pallas

    dsp = DSPConfig()
    voc = WaveRNNConfig(mode="MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, dsp)
    curve = {}
    for B in batches:
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        mels_up = jax.random.normal(k1, (B, steps, dsp.num_mels),
                                    jnp.float32) * 0.3
        aux = jax.random.normal(k2, (B, steps, voc.res_out_dims),
                                jnp.float32) * 0.3
        np.asarray(jnp.sum(mels_up))  # fence input placement

        def one(k):
            return jnp.sum(generate_pallas(params, mels_up, aux, voc,
                                           dsp.bits, jax.random.PRNGKey(k)))

        dt = _timed_pipeline(one)
        curve[B] = B * steps / dt
        print(f"fold batch {B:4d}: {dt / steps * 1e6:7.2f} us/step  "
              f"{curve[B] / 1e6:6.3f} Msamples/s", file=sys.stderr)
    return curve


def _timed_pipeline(one, reps: int = 4):
    """Dispatch `reps` launches back to back, ONE scalar fence — keeps the
    per-launch tunnel RTT (~35 ms) out of the marginal number. The fence
    stack program is pre-compiled outside the timing (the r3 inversion
    artifact, bench.py headline note)."""
    import jax.numpy as jnp

    np.asarray(jnp.sum(one(0)))  # compile the launch
    np.asarray(jnp.stack([jnp.sum(jnp.zeros(1)) for _ in range(reps)]))
    t0 = time.perf_counter()
    np.asarray(jnp.stack([one(i + 1) for i in range(reps)]))
    return (time.perf_counter() - t0) / reps


def fold_batch_sweep_fused(steps: int = 16384,
                           batches=(1, 2, 4, 8, 16, 32, 64, 128)):
    """Same saturation curve for the fused-conditioning kernel (the
    production path: frame-rate streams + in-kernel polyphase upsample)."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import DSPConfig, WaveRNNConfig
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.ops import polyphase as P
    from wavernn_tpu.ops.pallas_gen import generate_pallas_fused

    dsp = DSPConfig()
    voc = WaveRNNConfig(mode="MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, dsp)
    geo = P.geometry(voc.upsample_factors, voc.pad)
    phi = P.phi_table(params["upsample"]["up_convs"], voc.upsample_factors,
                      geo)
    fold_chunks = steps // geo.hop
    Tf = fold_chunks * geo.hop
    curve = {}
    for B in batches:
        frames = jax.random.normal(
            jax.random.PRNGKey(7),
            (fold_chunks + geo.K - 1, B, dsp.num_mels + voc.res_out_dims),
            jnp.float32) * 0.3
        np.asarray(jnp.sum(frames))  # fence input placement

        def one(k):
            return jnp.sum(generate_pallas_fused(
                params, frames, phi, voc, dsp.bits, jax.random.PRNGKey(k),
                geo.hop, -geo.d_lo, fold_chunks))

        dt = _timed_pipeline(one)
        curve[B] = B * Tf / dt
        print(f"fused fold batch {B:4d}: {dt / Tf * 1e6:7.2f} us/step  "
              f"{curve[B] / 1e6:6.3f} Msamples/s", file=sys.stderr)
    return curve


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend (virtual device mesh)")
    parser.add_argument("--sweep", action="store_true",
                        help="also run the single-chip fold-batch sweep")
    parser.add_argument("--frames", type=int, default=1345)
    parser.add_argument("--target", type=int, default=None)
    parser.add_argument("--overlap", type=int, default=None)
    args = parser.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wavernn_tpu.config import DSPConfig, WaveRNNConfig
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.parallel.gen_sharded import generate_sharded
    from wavernn_tpu.parallel.mesh import make_mesh

    dsp = DSPConfig()
    voc = WaveRNNConfig(mode="MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, dsp)
    rng = np.random.RandomState(0)
    mels = rng.uniform(0.2, 0.8, (1, dsp.num_mels, args.frames)).astype(np.float32)
    audio_seconds = (args.frames - 1) * dsp.hop_length / dsp.sample_rate

    from wavernn_tpu.parallel import gen_sharded as gs

    n_all = len(jax.devices())
    sizes = sorted({1, 2, n_all} & set(range(1, n_all + 1)))
    results = {}
    shard_stats = {}
    for n in sizes:
        mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
        # device_out + scalar fence: symmetric with the generate_fast gate
        # below (neither pays the 5.9 MB wav export, which on the remote
        # tunnel would otherwise dominate both timings)
        run = lambda k: np.asarray(jnp.sum(generate_sharded(
            params, mels, voc, dsp, jax.random.PRNGKey(k), mesh=mesh,
            target=args.target, overlap=args.overlap,
            use_pallas=not args.cpu, device_out=True)))
        run(0)  # compile
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            run(i + 1)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        results[n] = audio_seconds / dt
        # fold-layout imbalance evidence (crossfade mode has zero mid-loop
        # communication, so imbalance is THE cross-device efficiency bound)
        shard_stats[n] = dict(gs.last_stats)
        print(f"{n} device(s): {dt*1e3:.0f} ms -> "
              f"{results[n]:.1f} audio-s/s  {gs.last_stats}", file=sys.stderr)

    # partition-overhead gate (VERDICT r2 item 4): the 1-device sharded
    # path vs the single-program fast path on the same utterance
    run_fast = lambda k: np.asarray(jnp.sum(wr.generate_fast(
        params, mels, voc, dsp, jax.random.PRNGKey(k),
        target=args.target, overlap=args.overlap,
        use_pallas=not args.cpu)))
    run_fast(0)  # compile
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        run_fast(i + 1)
        ts.append(time.perf_counter() - t0)
    fast_rate = audio_seconds / float(np.median(ts))
    print(f"generate_fast 1 device: {fast_rate:.1f} audio-s/s "
          f"(sharded/fast = {results[1]/fast_rate:.2f})", file=sys.stderr)

    base = results[1]
    eff = {n: results[n] / (n * base) for n in results}
    largest = max(results)
    out = {
        "metric": f"gen_audio_seconds_per_s_{largest}dev",
        "value": round(results[largest], 2),
        "unit": "audio-s/s",
        "vs_baseline": round(results[largest] / 5.0, 2),  # 5x RT target
        "platform": jax.devices()[0].platform,
        "per_device": {str(n): round(v, 2) for n, v in results.items()},
        "scaling_efficiency": {str(n): round(e, 3) for n, e in eff.items()},
        "per_shard_stats": {str(n): s for n, s in shard_stats.items()},
        "generate_fast_1dev": round(fast_rate, 2),
        "sharded_over_fast_1dev": round(results[1] / fast_rate, 3),
    }
    if args.sweep:
        out["fold_batch_samples_per_s"] = {
            str(b): round(v, 0) for b, v in fold_batch_sweep().items()}
        out["fold_batch_samples_per_s_fused"] = {
            str(b): round(v, 0) for b, v in fold_batch_sweep_fused().items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
