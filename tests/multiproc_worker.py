"""Worker for the real multi-process SPMD test (tests/test_multiprocess.py).

Launched as `python multiproc_worker.py <out.json>` with the cluster
described by JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
— exactly the wiring scripts/submit.sh sets up on a TPU pod — so this
exercises the production `initialize_distributed` bring-up path plus
cross-process collectives (gradient psum, xfade overlap-add reductions,
and the exact-seam rolled state handoff) over a gloo CPU backend.

The workload itself lives in `run_workload(mesh)` so the single-process
test can run the identical computation on its in-process 8-device mesh
and compare numbers.
"""
import json
import sys

import numpy as np


def run_workload(mesh):
    """Deterministic workload on an 8-way `data` mesh. Every process
    constructs the same host-side inputs (seeded) and contributes its local
    shards via `make_global_array`."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import DSPConfig, WaveRNNConfig
    from wavernn_tpu.models import wavernn as wr
    from wavernn_tpu.models.wavernn import upsample_apply
    from wavernn_tpu.ops import fold as F
    from wavernn_tpu.ops.sample_loop import generate_scan
    from wavernn_tpu.parallel.gen_sharded import generate_exact_seam
    from wavernn_tpu.parallel.mesh import make_global_array, replicate
    from wavernn_tpu.train import wavernn_train as wt

    dsp = DSPConfig()
    voc = WaveRNNConfig(mode="MOL", rnn_dims=32, fc_dims=32, compute_dims=16,
                        res_out_dims=16, res_blocks=1, pad=2,
                        upsample_factors=(5, 5, 11))
    out = {"n_devices": jax.device_count(),
           "n_processes": jax.process_count()}

    # ---- training: 3 steps, batch sharded 8-way, grads psum'd ----
    state = wt.create_train_state(jax.random.PRNGKey(0), voc, dsp, lr=1e-3)
    state = wt.TrainState(replicate(mesh, state.params),
                          replicate(mesh, state.opt_state),
                          state.step)
    rng = np.random.RandomState(0)
    B, frames = 8, 7
    T = (frames - 2 * voc.pad) * dsp.hop_length
    x = make_global_array(mesh, rng.uniform(-1, 1, (B, T)).astype(np.float32))
    y = make_global_array(mesh, rng.uniform(-1, 1, (B, T)).astype(np.float32))
    m = make_global_array(
        mesh, rng.uniform(0, 1, (B, dsp.num_mels, frames)).astype(np.float32))
    losses = []
    for _ in range(3):
        state, metrics = wt.train_step(state, x, y, m, voc, dsp, 1e-3, 4.0)
        losses.append(float(metrics["loss"]))
    out["train_losses"] = losses
    out["grad_norm"] = float(metrics["grad_norm"])

    # ---- sharded generation: folds on the data axis ----
    target, overlap = 220, 110
    frames_g = 11
    mels = rng.uniform(0.2, 0.8, (1, dsp.num_mels, frames_g)).astype(np.float32)
    wave_len = (frames_g - 1) * dsp.hop_length
    mels_j = jnp.pad(jnp.asarray(mels), ((0, 0), (0, 0), (voc.pad, voc.pad)))
    mels_up, aux, _ = upsample_apply(state.params["upsample"], mels_j, voc,
                                     training=False)
    mels_up = np.asarray(F.fold_with_overlap(mels_up, target, overlap))
    aux = np.asarray(F.fold_with_overlap(aux, target, overlap))
    pad_folds = (-mels_up.shape[0]) % mesh.shape["data"]
    mels_up = np.pad(mels_up, ((0, pad_folds), (0, 0), (0, 0)))
    aux = np.pad(aux, ((0, pad_folds), (0, 0), (0, 0)))
    out["n_folds"] = mels_up.shape[0]
    mels_up = make_global_array(mesh, mels_up)
    aux = make_global_array(mesh, aux)

    samples = generate_scan(state.params, mels_up, aux, voc, dsp.bits,
                            jax.random.PRNGKey(3))
    wav = F.xfade_and_unfold_jax(samples, overlap)[:wave_len]
    out["gen_checksum"] = float(jnp.sum(wav))
    out["gen_std"] = float(jnp.std(wav))
    out["gen_len"] = int(wav.shape[0])

    # ---- exact-seam: rolled state handoff = cross-process ppermute ----
    seam_samples, errs = generate_exact_seam(
        state.params, mels_up, aux, voc, dsp.bits, jax.random.PRNGKey(3),
        target, overlap, seam_passes=2)
    out["seam_checksum"] = float(jnp.sum(seam_samples))
    out["seam_errs"] = [float(e) for e in np.asarray(errs)]
    return out


def main():
    out_path = sys.argv[1]
    # distributed bring-up must precede first backend use; mesh.py selects
    # gloo CPU collectives for the cross-process transport
    from wavernn_tpu.parallel.mesh import initialize_distributed, make_mesh
    initialize_distributed()

    import jax
    assert jax.process_count() > 1, "worker expected a multi-process cluster"
    result = run_workload(make_mesh())
    result["process_id"] = jax.process_index()
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
