"""Real multi-process jax.distributed test (SURVEY §2.2/§5 "distributed
comm backend").

Spawns TWO separate Python processes, each owning 4 virtual CPU devices,
joined into one 8-device cluster through `initialize_distributed` (the
same env-var wiring scripts/submit.sh uses on a TPU pod, with gloo as the
CPU cross-process transport standing in for ICI/DCN). The workload runs
sharded training steps (cross-process gradient psum), fold-sharded
generation (cross-process overlap-add), and exact-seam generation (the
rolled state handoff lowers to a cross-process collective permute).

Checks:
  * both processes compute identical replicated results (SPMD consistency);
  * those results match the identical workload run single-process on the
    in-process 8-device mesh (partitioning is layout-invariant).
"""
import importlib.util
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"proc{pid}.json"
        outs.append(out)
        env = {
            "PATH": os.environ.get("PATH", ""),
            "HOME": os.environ.get("HOME", "/root"),
            "PYTHONPATH": REPO,  # drop any sitecustomize dirs
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(out)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = []
    for p, out in zip(procs, outs):
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_cluster_shape(worker_results):
    for r in worker_results:
        assert r["n_devices"] == 8
        assert r["n_processes"] == 2
    assert {r["process_id"] for r in worker_results} == {0, 1}


def test_processes_agree(worker_results):
    """Replicated outputs must be identical on every process — the SPMD
    contract (each rank sees the same psum/ppermute results)."""
    a, b = worker_results
    assert a["train_losses"] == pytest.approx(b["train_losses"], abs=1e-6)
    assert a["grad_norm"] == pytest.approx(b["grad_norm"], abs=1e-6)
    assert a["gen_checksum"] == pytest.approx(b["gen_checksum"], abs=1e-5)
    assert a["seam_checksum"] == pytest.approx(b["seam_checksum"], abs=1e-5)
    assert a["seam_errs"] == pytest.approx(b["seam_errs"], abs=1e-6)


def test_matches_single_process(worker_results):
    """The 2-process cluster computes the same numbers as the identical
    workload on an in-process 8-device mesh: resharding the batch across
    process boundaries must not change the math (collective reduction
    order may differ at float32 rounding level)."""
    spec = importlib.util.spec_from_file_location("multiproc_worker", WORKER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from wavernn_tpu.parallel.mesh import make_mesh
    want = mod.run_workload(make_mesh())

    got = worker_results[0]
    assert got["n_folds"] == want["n_folds"]
    assert got["gen_len"] == want["gen_len"]
    np.testing.assert_allclose(got["train_losses"], want["train_losses"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got["grad_norm"], want["grad_norm"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["gen_checksum"], want["gen_checksum"],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(got["gen_std"], want["gen_std"], rtol=1e-4)
    np.testing.assert_allclose(got["seam_checksum"], want["seam_checksum"],
                               rtol=1e-4, atol=1e-3)
    # pass-2 seam error must collapse toward zero in both runs (the state
    # handoff converges to sequential generation)
    assert got["seam_errs"][-1] < 1e-3 and want["seam_errs"][-1] < 1e-3
