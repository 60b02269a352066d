"""Shared CLI plumbing: config loading, workspace, checkpoint/weights I/O."""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..config import Config
from ..paths import Workspace
from ..train.checkpoints import load_tree, save_tree


def force_cpu_backend() -> None:
    """--force_cpu (reference: every CLI, e.g. train_wavernn.py:26):
    run on the host CPU even when an accelerator is present.  Effective
    only before the first computation initializes the backend — after
    that the platform switch is silently ignored by jax, so verify and
    warn (library callers that already touched the device)."""
    jax.config.update("jax_platforms", "cpu")
    if jax.devices()[0].platform != "cpu":
        print("| WARNING: --force_cpu ignored (jax backend already "
              "initialized on an accelerator)")


def load_config(hp_file: str | None) -> Config:
    if hp_file and Path(hp_file).exists():
        return Config.from_hparams_file(hp_file)
    return Config()


def make_workspace(cfg: Config, output_root: str = ".") -> Workspace:
    return Workspace(cfg.data_path, cfg.voc_model_id, cfg.tts_model_id,
                     ignore_voc=cfg.ignore_voc, ignore_tts=cfg.ignore_tts,
                     output_root=output_root)


def load_voc_weights(path, cfg: Config):
    """Load vocoder weights from .npz (ours) or .pyt/.pt (reference)."""
    path = Path(path)
    if path.suffix in (".pyt", ".pt", ".pth"):
        from ..compat.torch_import import (import_wavernn,
                                           import_wavernn_step,
                                           load_torch_state_dict)
        sd = load_torch_state_dict(path)
        return import_wavernn(sd, cfg.voc, cfg.dsp), import_wavernn_step(sd)
    from ..models.wavernn import init_wavernn
    like = init_wavernn(jax.random.PRNGKey(0), cfg.voc, cfg.dsp)
    loaded = load_tree(path, {"params": like, "meta": {"step": np.asarray(0)}})
    return loaded["params"], int(loaded["meta"]["step"])


def load_tts_weights(path, cfg: Config):
    """Load Tacotron weights from .npz (ours) or .pyt/.pt (reference);
    returns (params, step, r)."""
    path = Path(path)
    if path.suffix in (".pyt", ".pt", ".pth"):
        from ..compat.torch_import import (import_tacotron, import_tacotron_r,
                                           load_torch_state_dict)
        sd = load_torch_state_dict(path)
        step = int(np.asarray(sd.get("step", 0)).reshape(-1)[0]) \
            if "step" in sd else 0
        return import_tacotron(sd, cfg.tts), step, import_tacotron_r(sd)
    from ..models.tacotron import init_tacotron
    from ..train.checkpoints import flat_to_tree
    like = init_tacotron(jax.random.PRNGKey(0), cfg.tts, cfg.dsp.num_mels)
    flat = load_tree(path)
    params = flat_to_tree({k[len("params/"):]: v for k, v in flat.items()
                           if k.startswith("params/")}, like)
    step = int(flat.get("meta/step", 0))
    if "meta/r" in flat:
        r = int(flat["meta/r"])
    else:  # derive from the training schedule session for this step
        from ..train.tacotron_train import session_for_step
        r = session_for_step(cfg.tts_train.schedule, max(step - 1, 0))[0]
    return params, step, r


def save_tts_weights(path, params, step: int, r: int):
    save_tree(path, {"params": params,
                     "meta": {"step": np.asarray(step), "r": np.asarray(r)}})
