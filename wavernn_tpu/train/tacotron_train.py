"""Tacotron training: progressive schedule + the fork's three loss modes
(reference train_tacotron.py:98-430).

  * teacher forcing (TF):    loss = L1(m1, m) + L1(m2, m)
  * attention forcing online (AF-online): a frozen TF teacher produces
    attn_ref per batch; student runs attention-forcing; extra loss =
    attn_loss_coeff * KL(log(student_attn) || teacher_attn) summed over the
    encoder axis, meaned elsewhere (train_tacotron.py:286-294)
  * attention forcing offline (AF-offline): attn_ref loaded from disk;
    extra loss = L1 of the attention maps (train_tacotron.py:387)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config, TacotronConfig
from ..models import tacotron as taco
from .wavernn_train import make_optimizer


class TTSTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def create_train_state(key, tts: TacotronConfig, n_mels: int, lr: float,
                       clip_grad_norm: Optional[float] = 1.0,
                       num_chars: int = 148) -> TTSTrainState:
    params = taco.init_tacotron(key, tts, n_mels, num_chars)
    tx = make_optimizer(lr, clip_grad_norm)
    return TTSTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def session_for_step(schedule, step: int) -> Tuple[int, float, int, int]:
    """Pick the (r, lr, max_step, batch_size) session for the current step
    (train_tacotron.py:98-118)."""
    for r, lr, max_step, bs in schedule:
        if step < max_step:
            return r, lr, max_step, bs
    return schedule[-1]


def attention_kl(student_attn, teacher_attn, eps: float = 1e-10):
    """KL(teacher || student) over the encoder axis, matching the
    reference's F.kl_div(log(student), teacher, reduction sum-over-enc /
    mean-over-rest) (train_tacotron.py:286-294)."""
    t = teacher_attn
    s = jnp.log(jnp.maximum(student_attn, eps))
    kl = t * (jnp.log(jnp.maximum(t, eps)) - s)      # pointwise KL terms
    return jnp.mean(jnp.sum(kl, axis=-1))


def loss_tf(params, x_ids, m, tts, r, key, compute_dtype=None,
            recurrence="scan"):
    mel, linear, attn, new_params = taco.forward(
        params, x_ids, m, tts, r, key, mode="teacher_forcing", training=True,
        compute_dtype=compute_dtype, recurrence=recurrence)
    loss = jnp.mean(jnp.abs(mel - m)) + jnp.mean(jnp.abs(linear - m))
    return loss, (new_params, attn)


def loss_af(params, x_ids, m, attn_ref, tts, r, key, attn_loss_coeff,
            offline: bool, compute_dtype=None, recurrence="scan"):
    mode = ("attention_forcing_offline" if offline
            else "attention_forcing_online")
    mel, linear, attn, new_params = taco.forward(
        params, x_ids, m, tts, r, key, mode=mode, training=True,
        attn_ref=attn_ref, compute_dtype=compute_dtype,
        recurrence=recurrence)
    loss_out = jnp.mean(jnp.abs(mel - m)) + jnp.mean(jnp.abs(linear - m))
    if offline:
        loss_attn = jnp.mean(jnp.abs(attn - attn_ref))
    else:
        loss_attn = attention_kl(attn, attn_ref)
    return loss_out + attn_loss_coeff * loss_attn, (new_params, attn,
                                                    loss_out, loss_attn)


@partial(jax.jit, static_argnames=("tts", "r", "lr", "clip_grad_norm",
                                   "precision", "recurrence"))
def train_step_tf(state: TTSTrainState, x_ids, m, tts: TacotronConfig,
                  r: int, lr: float, key,
                  clip_grad_norm: Optional[float] = 1.0,
                  precision: str = "float32", recurrence: str = "scan"):
    cd = jnp.bfloat16 if precision == "bfloat16" else None
    (loss, (new_params, attn)), grads = jax.value_and_grad(
        loss_tf, has_aux=True)(state.params, x_ids, m, tts, r, key, cd,
                               recurrence)
    tx = make_optimizer(lr, clip_grad_norm)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = _merge_bn(params, new_params)
    return (TTSTrainState(params, opt_state, state.step + 1),
            {"loss": loss, "attn": attn})


@partial(jax.jit, static_argnames=("tts", "r", "lr", "clip_grad_norm",
                                   "offline", "attn_loss_coeff",
                                   "precision", "recurrence"))
def train_step_af(state: TTSTrainState, x_ids, m, attn_ref,
                  tts: TacotronConfig, r: int, lr: float, key,
                  attn_loss_coeff: float = 1.0,
                  clip_grad_norm: Optional[float] = 1.0,
                  offline: bool = False, precision: str = "float32",
                  recurrence: str = "scan"):
    cd = jnp.bfloat16 if precision == "bfloat16" else None
    (loss, (new_params, attn, l_out, l_attn)), grads = jax.value_and_grad(
        loss_af, has_aux=True)(state.params, x_ids, m, attn_ref, tts, r, key,
                               attn_loss_coeff, offline, cd, recurrence)
    tx = make_optimizer(lr, clip_grad_norm)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = _merge_bn(params, new_params)
    return (TTSTrainState(params, opt_state, state.step + 1),
            {"loss": loss, "loss_out": l_out, "loss_attn": l_attn,
             "attn": attn})


@partial(jax.jit, static_argnames=("tts", "r", "recurrence"))
def teacher_attn_ref(teacher_params, x_ids, m, tts: TacotronConfig, r: int,
                     key, recurrence: str = "scan"):
    """AF-online: frozen TF teacher produces attn_ref for a batch, no grads
    (train_tacotron.py:268-278).  recurrence="pallas" runs the eval-mode
    TF decode on the training kernels (zero zoneout masks)."""
    _, _, attn, _ = taco.forward(teacher_params, x_ids, m, tts, r, key,
                                 mode="teacher_forcing", training=False,
                                 recurrence=recurrence)
    return jax.lax.stop_gradient(attn)


def _merge_bn(params, bn_source):
    def merge(path, p_leaf, s_leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "mean" in keys or "var" in keys:
            return s_leaf
        return p_leaf
    return jax.tree_util.tree_map_with_path(merge, params, bn_source)


def train_loop(cfg: Config, workspace, state: TTSTrainState,
               make_dataset, teacher_params=None, log=print,
               max_steps: Optional[int] = None, key=None,
               on_checkpoint=None, mesh=None, profile_dir=None,
               profile_steps: int = 20):
    """Progressive-schedule training driver (train_tacotron.py:98-430).

    make_dataset(r, batch_size) -> iterable of batches.  Dispatches on
    cfg.tts.mode to the TF / AF-online / AF-offline steps; checkpoints every
    cfg.tts_train.checkpoint_every steps plus a named snapshot.

    ``mesh``: SPMD device mesh — params (and the AF-online frozen teacher)
    replicated, batches sharded over ``data``, psums by GSPMD; the in-path
    counterpart of the reference's DataParallel at
    train_tacotron.py:178-179/264-266/379-380.

    ``profile_dir``: jax.profiler trace of the first ``profile_steps``
    steps (--profile_dir CLI flag).  Structured JSONL metrics land at
    workspace.tts_metrics (one record per checkpoint/session).
    """
    import jax as _jax

    from ..data.prefetch import prefetch
    from ..utils.metrics import MetricsLogger, StepTimer, profile_trace
    from .checkpoints import save_checkpoint

    key = key if key is not None else jax.random.PRNGKey(0)
    mode = cfg.tts.mode
    from ..utils.backend import resolve_recurrence
    recurrence = resolve_recurrence(cfg.tts_train.recurrence, mesh)
    offline = mode == "attention_forcing_offline"
    online = mode == "attention_forcing_online"

    stage = None
    if mesh is not None:
        from ..parallel.mesh import replicate, stage_batch
        state = TTSTrainState(replicate(mesh, state.params),
                              replicate(mesh, state.opt_state),
                              replicate(mesh, state.step))
        if teacher_params is not None:
            teacher_params = replicate(mesh, teacher_params)
        stage = lambda b: stage_batch(mesh, b)

    metrics_log = MetricsLogger(workspace.tts_metrics)
    timer = StepTimer()
    profiler = None
    if profile_dir is not None:
        profiler = profile_trace(profile_dir)
        profiler.__enter__()
    profile_until = int(state.step) + profile_steps

    step = int(state.step)
    for session_idx, (r, lr, max_step, bs) in enumerate(cfg.tts_train.schedule):
        if step >= max_step:
            continue
        if max_steps is not None:
            max_step = min(max_step, max_steps)
        dataset = make_dataset(r, bs)
        log(f"Session {session_idx}: r={r} lr={lr} until step {max_step} bs={bs}")
        while step < max_step:
            for batch in prefetch(dataset, stage=stage):
                key, k_step, k_teacher = _jax.random.split(key, 3)
                if offline:
                    chars, mel, ids, mel_lens, attn_ref = batch
                    state, metrics = train_step_af(
                        state, jnp.asarray(chars), jnp.asarray(mel),
                        jnp.asarray(attn_ref), cfg.tts, r, lr, k_step,
                        cfg.tts_train.attn_loss_coeff,
                        cfg.tts_train.clip_grad_norm, offline=True,
                        precision=cfg.tts_train.precision,
                        recurrence=recurrence)
                elif online:
                    chars, mel, ids, mel_lens = batch
                    attn_ref = teacher_attn_ref(teacher_params,
                                                jnp.asarray(chars),
                                                jnp.asarray(mel), cfg.tts, r,
                                                k_teacher,
                                                recurrence=recurrence)
                    state, metrics = train_step_af(
                        state, jnp.asarray(chars), jnp.asarray(mel), attn_ref,
                        cfg.tts, r, lr, k_step,
                        cfg.tts_train.attn_loss_coeff,
                        cfg.tts_train.clip_grad_norm, offline=False,
                        precision=cfg.tts_train.precision,
                        recurrence=recurrence)
                else:
                    chars, mel, ids, mel_lens = batch
                    state, metrics = train_step_tf(
                        state, jnp.asarray(chars), jnp.asarray(mel), cfg.tts,
                        r, lr, k_step, cfg.tts_train.clip_grad_norm,
                        precision=cfg.tts_train.precision,
                        recurrence=recurrence)

                step += 1  # host-side mirror of state.step (no device sync)
                timer.tick()
                if profiler is not None and step >= profile_until:
                    profiler.__exit__(None, None, None)
                    profiler = None
                if step % cfg.tts_train.checkpoint_every == 0:
                    save_checkpoint("tts", workspace, state.params,
                                    state.opt_state, step,
                                    name=f"taco_step{step // 1000}K", log=log,
                                    extra_meta={"r": r})
                    metrics_log.log(event="checkpoint", step=step, r=r,
                                    loss=round(float(metrics["loss"]), 6),
                                    steps_per_s=round(timer.steps_per_sec,
                                                      3))
                    if on_checkpoint is not None:
                        on_checkpoint(state, metrics, ids)
                if step >= max_step or (max_steps is not None
                                        and step >= max_steps):
                    break
            else:
                continue
            break
        save_checkpoint("tts", workspace, state.params, state.opt_state,
                        step, log=log, extra_meta={"r": r})
        msg = f"| Session {session_idx} done | loss {float(metrics['loss']):.4f} | step {step} |"
        log(msg)
        with open(workspace.tts_log, "a") as f:
            print(msg, file=f)
        metrics_log.log(event="session", session=session_idx, step=step,
                        r=r, loss=round(float(metrics["loss"]), 6),
                        steps_per_s=round(timer.steps_per_sec, 3))
        if max_steps is not None and step >= max_steps:
            break
    if profiler is not None:
        profiler.__exit__(None, None, None)
    return state


# --------------------------------------------------------------------------
# GTA / attention-ref export (train_tacotron.py:433-485)
# --------------------------------------------------------------------------

def create_gta_features(params, dataset, tts: TacotronConfig, r: int,
                        save_dir, log=print, recurrence: str = "scan"):
    """Teacher-forced eval forward over the train set; save postnet output
    rescaled (mel+4)/8, truncated to the true mel length.  On a TPU
    backend pass recurrence="pallas" to run the eval-mode TF decode on
    the training kernels."""
    import numpy as np
    save_dir.mkdir(parents=True, exist_ok=True)
    for i, (x_ids, m, ids, mel_lens) in enumerate(dataset):
        _, gta, _, _ = taco.forward(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x_ids),
            jnp.asarray(m), tts, r, jax.random.PRNGKey(0),
            mode="teacher_forcing", training=False, generate_gta=True,
            recurrence=recurrence)
        gta = np.asarray(gta)
        gta = (gta + 4.0) / 8.0
        for j, item_id in enumerate(ids):
            np.save(save_dir / f"{item_id}.npy",
                    gta[j, :, : int(mel_lens[j])], allow_pickle=False)
        log(f"GTA batch {i + 1} saved")


def create_attn_ref(params, dataset, tts: TacotronConfig, r: int, save_dir,
                    log=print, recurrence: str = "scan"):
    """Save teacher-forced attention maps for offline attention forcing."""
    import numpy as np
    save_dir.mkdir(parents=True, exist_ok=True)
    for i, (x_ids, m, ids, mel_lens) in enumerate(dataset):
        _, _, attn, _ = taco.forward(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x_ids),
            jnp.asarray(m), tts, r, jax.random.PRNGKey(0),
            mode="teacher_forcing", training=False, generate_gta=True,
            recurrence=recurrence)
        attn = np.asarray(attn)
        for j, item_id in enumerate(ids):
            np.save(save_dir / f"{item_id}.npy", attn[j], allow_pickle=False)
        log(f"attn_ref batch {i + 1} saved")
