"""WaveRNN training step + loop (reference train_wavernn.py:18-162).

The step is one jit-compiled SPMD program: batch sharded over the mesh's
``data`` axis, parameters replicated, gradient psum inserted by GSPMD.
Loss: RAW -> cross-entropy over 2**bits classes; MOL -> discretized
mixture-of-logistics NLL; grad-clip by global norm 4 (hparams.py:55).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config, DSPConfig, WaveRNNConfig
from ..models import wavernn as wr
from ..models.distribution import discretized_mix_logistic_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer(lr: float, clip_grad_norm: Optional[float] = 4.0):
    """Adam with global-norm clipping (train_wavernn.py:70,134-138)."""
    parts = []
    if clip_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    parts.append(optax.adam(lr))
    return optax.chain(*parts)


def create_train_state(key, voc: WaveRNNConfig, dsp: DSPConfig, lr: float,
                       clip_grad_norm: Optional[float] = 4.0) -> TrainState:
    params = wr.init_wavernn(key, voc, dsp)
    tx = make_optimizer(lr, clip_grad_norm)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def loss_fn(params, x, y, mels, voc: WaveRNNConfig, dsp: DSPConfig,
            compute_dtype=None, recurrence: str = "scan"):
    """Returns (loss, new_params-with-updated-BN-stats). The loss itself is
    always computed in f32 (logits are upcast on the way out of forward)."""
    logits, new_params = wr.forward(params, x, mels, voc, training=True,
                                    compute_dtype=compute_dtype,
                                    recurrence=recurrence)
    if voc.mode == "RAW":
        labels = y.astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[..., None],
                                             axis=-1))
    elif voc.mode == "MOL":
        loss = discretized_mix_logistic_loss(logits, y.astype(jnp.float32))
    else:
        raise ValueError(voc.mode)
    return loss, new_params


@partial(jax.jit, static_argnames=("voc", "dsp", "lr", "clip_grad_norm",
                                   "precision", "recurrence"))
def train_step(state: TrainState, x, y, mels, voc: WaveRNNConfig,
               dsp: DSPConfig, lr: float,
               clip_grad_norm: Optional[float] = 4.0,
               precision: str = "float32", masks=None,
               recurrence: str = "scan"):
    """One optimizer step. Returns (new_state, metrics).

    precision="bfloat16" runs the core GRU/FC stack (forward AND backward)
    in bf16 with f32 master weights, f32 optimizer state, and f32 BatchNorm
    statistics — bf16 shares f32's exponent range, so no loss scaling is
    needed (unlike f16). Measured ~2x step throughput on one chip.

    ``recurrence``: "scan" or "pallas" — run the two 1375-step GRU
    recurrences (forward AND backward) as persistent-weights Pallas
    kernels with a custom VJP (ops/pallas_gru.py) instead of lax.scan;
    same math, measured ~2x step throughput on v5e on top of bf16.
    utils.backend.resolve_recurrence picks per backend.

    ``masks``: optional pruning-mask pytree ('/'-joined param path -> 0/1
    mask, train/pruning.py). Applied to the weights AFTER the optimizer
    update, so the next forward sees pruned weights every step once pruning
    is active (reference Pruner.apply_or_not: every step past t0).
    """
    compute_dtype = (jnp.bfloat16 if precision == "bfloat16" else None)
    (loss, new_params), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, x, y, mels, voc, dsp, compute_dtype, recurrence)
    tx = make_optimizer(lr, clip_grad_norm)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    # carry over the batchnorm running stats computed in the forward
    params = _merge_bn_stats(params, new_params)
    if masks is not None:
        from .pruning import apply_masks
        params = apply_masks(params, masks)
    gnorm = optax.global_norm(grads)
    return (TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "grad_norm": gnorm})


def _merge_bn_stats(params, bn_source):
    """Copy BatchNorm running mean/var (non-trainable state) from
    `bn_source` into `params`."""
    def merge(path, p_leaf, s_leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "mean" in keys or "var" in keys:
            return s_leaf
        return p_leaf
    return jax.tree_util.tree_map_with_path(merge, params, bn_source)


def train_loop(cfg: Config, workspace, dataset, state: TrainState,
               lr: Optional[float] = None, total_steps: Optional[int] = None,
               log=print, checkpoint_every: Optional[int] = None,
               on_checkpoint=None, mesh=None, profile_dir=None,
               profile_steps: int = 20):
    """Epoch loop (train_wavernn.py:98-162): periodic named checkpoints,
    per-epoch latest checkpoint + log line.

    ``mesh``: SPMD device mesh (parallel/mesh.py). Parameters/optimizer
    state are replicated, every batch's leading axis is sharded over the
    ``data`` axis, and GSPMD inserts the gradient psums — the in-path
    equivalent of the reference's in-loop DataParallel
    (train_wavernn.py:116-117, utils/__init__.py:22-36). mesh=None trains
    on the default device.

    ``profile_dir``: capture a jax.profiler trace (XProf/TensorBoard) of
    the first ``profile_steps`` steps — the --profile_dir CLI flag.

    Observability: a structured JSONL stream (utils/metrics.MetricsLogger)
    lands next to the checkpoints (workspace.voc_metrics) with one record
    per epoch and per checkpoint — the machine-readable counterpart of the
    reference's carriage-return counters (train_wavernn.py:155-156) and
    log.txt line (161).

    Throughput-critical detail: the loop never syncs the host on a per-step
    basis — metrics accumulate as lazy device scalars and the step counter
    for checkpoint scheduling is tracked Python-side, so XLA's async
    dispatch pipelines step N+1 while step N executes. Batches are staged
    on device (pre-sharded when a mesh is given) by a prefetch thread (the
    reference used 2 DataLoader worker processes, utils/dataset.py:54-60).
    """
    import time

    from ..data.prefetch import prefetch
    from ..utils.metrics import MetricsLogger, StepTimer, profile_trace
    from .checkpoints import save_checkpoint

    lr = cfg.voc_train.lr if lr is None else lr
    total_steps = cfg.voc_train.total_steps if total_steps is None else total_steps
    checkpoint_every = (cfg.voc_train.checkpoint_every
                        if checkpoint_every is None else checkpoint_every)

    from ..utils.backend import resolve_recurrence
    recurrence = resolve_recurrence(cfg.voc_train.recurrence, mesh)

    stage = None
    if mesh is not None:
        from ..parallel.mesh import replicate, stage_batch
        state = TrainState(replicate(mesh, state.params),
                           replicate(mesh, state.opt_state),
                           replicate(mesh, state.step))
        stage = lambda b: stage_batch(mesh, b)

    pruner = None
    if cfg.voc_train.prune:
        from .pruning import Pruner, wavernn_prune_spec
        vt = cfg.voc_train
        pruner = Pruner(wavernn_prune_spec(vt.prune_rnn_input),
                        vt.prune_start, vt.prune_steps, vt.prune_sparsity,
                        vt.prune_every, block=vt.prune_block)
        if int(state.step) > vt.prune_start:  # resume: recompute at step t
            pruner.restart(state.params, int(state.step))

    metrics_log = MetricsLogger(workspace.voc_metrics)
    timer = StepTimer()
    profiler = None
    if profile_dir is not None:
        profiler = profile_trace(profile_dir)
        profiler.__enter__()
    profile_until = int(state.step) + profile_steps

    step = int(state.step)
    while step < total_steps:
        start = time.time()
        running = jnp.zeros((), jnp.float32)     # lazy device accumulators
        nonfinite = jnp.zeros((), jnp.int32)
        i = 0
        for x, y, m in prefetch(dataset, stage=stage):
            i += 1
            masks = (pruner.masks_for_step(state.params, step)
                     if pruner is not None else None)
            state, metrics = train_step(state, x, y, m, cfg.voc, cfg.dsp, lr,
                                        cfg.voc_train.clip_grad_norm,
                                        cfg.voc_train.precision, masks,
                                        recurrence)
            running = running + metrics["loss"]
            nonfinite = nonfinite + (
                ~jnp.isfinite(metrics["grad_norm"])).astype(jnp.int32)
            step += 1
            timer.tick()  # host-side rolling steps/s, no device sync
            if profiler is not None and step >= profile_until:
                profiler.__exit__(None, None, None)
                profiler = None
            if step % checkpoint_every == 0:
                k_steps = step // 1000
                save_checkpoint("voc", workspace, state.params,
                                state.opt_state, step,
                                name=f"wave_step{k_steps}K", log=log)
                metrics_log.log(event="checkpoint", step=step,
                                loss=round(float(metrics["loss"]), 6),
                                steps_per_s=round(timer.steps_per_sec, 3))
                if on_checkpoint is not None:
                    on_checkpoint(state)
            if step >= total_steps:
                break
        n_bad = int(nonfinite)                   # one sync per epoch
        if n_bad:
            log(f"grad_norm was non-finite on {n_bad} step(s)!")
        speed = i / max(time.time() - start, 1e-9)
        avg = float(running) / max(i, 1)
        msg = (f"| Epoch done | Loss: {avg:.4f} | {speed:.1f} steps/s "
               f"| Step: {step // 1000}k |")
        log(msg)
        with open(workspace.voc_log, "a") as f:
            print(msg, file=f)
        metrics_log.log(event="epoch", step=step, loss=round(avg, 6),
                        steps_per_s=round(speed, 3),
                        nonfinite_grad_steps=n_bad)
        save_checkpoint("voc", workspace, state.params, state.opt_state,
                        step, log=log)
    if profiler is not None:
        profiler.__exit__(None, None, None)
    return state
