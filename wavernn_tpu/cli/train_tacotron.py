"""CLI: Tacotron training (reference train_tacotron.py).

    python -m wavernn_tpu.cli.train_tacotron [--force_gta] [--force_attn]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import get_tts_datasets
from ..train import tacotron_train as tt
from ..train.checkpoints import restore_checkpoint
from ..utils.display import save_attention, simple_table
from .common import load_config, load_tts_weights, make_workspace


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train Tacotron TTS")
    parser.add_argument("--force_train", "-f", action="store_true")
    parser.add_argument("--force_gta", "-g", action="store_true")
    parser.add_argument("--force_attn", "-a", action="store_true")
    parser.add_argument("--hp_file", default=None)
    parser.add_argument("--force_cpu", "-c", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of the first "
                             "training steps into this directory "
                             "(view with TensorBoard/XProf)")
    args = parser.parse_args(argv)
    if args.force_cpu:
        from .common import force_cpu_backend
        force_cpu_backend()

    from ..parallel.mesh import initialize_distributed
    initialize_distributed()  # multi-host no-op when single process
    cfg = load_config(args.hp_file)
    if cfg.random_seed is not None:
        args.seed = cfg.random_seed
        from ..utils.seeding import set_global_seeds
        set_global_seeds(cfg.random_seed)
    ws = make_workspace(cfg)

    state = tt.create_train_state(jax.random.PRNGKey(args.seed), cfg.tts,
                                  cfg.dsp.num_mels,
                                  cfg.tts_train.schedule[0][1],
                                  cfg.tts_train.clip_grad_norm)
    params, opt_state, step = restore_checkpoint(
        "tts", ws, state.params, state.opt_state, create_if_missing=True,
        init_weights_path=cfg.tts_train.init_weights_path)
    state = tt.TTSTrainState(params, opt_state, jnp.asarray(step, jnp.int32))

    teacher_params = None
    if cfg.tts.mode == "attention_forcing_online":
        assert cfg.tts_train.model_tf_path, \
            "AF-online needs model_tf_path (train_tacotron.py:78-92)"
        teacher_params, _, _ = load_tts_weights(cfg.tts_train.model_tf_path,
                                                cfg)

    if args.force_gta or args.force_attn:
        from ..utils.backend import resolve_recurrence
        rec = resolve_recurrence(cfg.tts_train.recurrence)
        r = tt.session_for_step(cfg.tts_train.schedule, int(state.step))[0]
        ds, _ = get_tts_datasets(ws.data, 8, r, cfg, seed=args.seed)
        if args.force_gta:
            tt.create_gta_features(state.params, ds, cfg.tts, r, ws.gta,
                                   recurrence=rec)
        if args.force_attn:
            tt.create_attn_ref(state.params, ds, cfg.tts, r, ws.attn,
                               recurrence=rec)
        return

    # in-path SPMD over every device (reference in-loop DataParallel,
    # train_tacotron.py:178-179/264-266/379-380). One mesh must serve every
    # session of the progressive schedule, so size it by the gcd of the
    # per-session batch sizes (sessions only shrink the batch, hparams:84-87)
    import math
    from ..parallel.mesh import training_mesh
    mesh = training_mesh(math.gcd(*(bs for _, _, _, bs
                                    in cfg.tts_train.schedule)))

    simple_table([
        ("Mode", cfg.tts.mode),
        ("Step", int(state.step)),
        ("Schedule", len(cfg.tts_train.schedule)),
        ("Max mel len", cfg.tts_train.max_mel_len),
        ("Devices", f"{mesh.shape['data']} data-parallel"),
    ])

    def make_dataset(r, bs):
        ds, attn_example = get_tts_datasets(
            ws.data, bs, r, cfg, seed=args.seed,
            num_shards=max(jax.process_count(), 1),
            shard_index=jax.process_index())
        make_dataset.attn_example = attn_example
        return ds

    def on_checkpoint(st, metrics, ids):
        # attention plot for monitoring (train_tacotron.py:216-219)
        ex = getattr(make_dataset, "attn_example", None)
        if ex is not None and ex in ids:
            idx = list(ids).index(ex)
            save_attention(np.asarray(metrics["attn"])[idx],
                           ws.tts_attention / f"{int(st.step)}")
            from ..utils.display import save_spectrogram
            if "mel" in metrics:
                save_spectrogram(np.asarray(metrics["mel"])[idx],
                                 ws.tts_mel_plot / f"{int(st.step)}")

    tt.train_loop(cfg, ws, state, make_dataset,
                  teacher_params=teacher_params,
                  key=jax.random.PRNGKey(args.seed),
                  on_checkpoint=on_checkpoint, mesh=mesh,
                  profile_dir=args.profile_dir)
    print("Training Complete.")


if __name__ == "__main__":
    main()
