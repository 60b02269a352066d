"""CLI: vocoder training (reference train_wavernn.py).

    python -m wavernn_tpu.cli.train_wavernn [--gta] [--lr 1e-4] [--batch_size 32]
"""
from __future__ import annotations

import argparse
import math

import jax

from ..data.dataset import get_vocoder_datasets
from ..models.wavernn import num_params
from ..synthesis import gen_testset
from ..train import wavernn_train as wt
from ..train.checkpoints import restore_checkpoint
from ..utils.display import simple_table
from .common import load_config, make_workspace


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train the WaveRNN vocoder")
    parser.add_argument("--lr", "-l", type=float)
    parser.add_argument("--batch_size", "-b", type=int)
    parser.add_argument("--force_train", "-f", action="store_true")
    parser.add_argument("--gta", "-g", action="store_true",
                        help="train on GTA features")
    parser.add_argument("--prune", action="store_true",
                        help="enable magnitude pruning (cubic sparsity "
                             "schedule; reference Pruning notebook) even if "
                             "the hparams file doesn't set voc_prune")
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

    from ..parallel.mesh import initialize_distributed, training_mesh
    initialize_distributed()  # multi-host no-op when single process
    cfg = load_config(args.hp_file)
    if args.prune and not cfg.voc_train.prune:
        import dataclasses
        cfg = cfg.replace(voc_train=dataclasses.replace(cfg.voc_train,
                                                        prune=True))
    lr = args.lr or cfg.voc_train.lr
    batch_size = args.batch_size or cfg.voc_train.batch_size
    ws = make_workspace(cfg)

    # the upsample factors must exactly factorise hop (train_wavernn.py:68)
    assert math.prod(cfg.voc.upsample_factors) == cfg.dsp.hop_length

    n_hosts = jax.process_count()
    assert batch_size % max(n_hosts, 1) == 0, \
        "batch size must be divisible by host count"
    # in-path SPMD: batch sharded over every device, params replicated
    # (reference in-loop DataParallel, train_wavernn.py:116-117)
    mesh = training_mesh(batch_size)

    state = wt.create_train_state(jax.random.PRNGKey(args.seed), cfg.voc,
                                  cfg.dsp, lr, cfg.voc_train.clip_grad_norm)
    print(f"Trainable Parameters: {num_params(state.params) / 1e6:.3f}M")
    params, opt_state, step = restore_checkpoint(
        "voc", ws, state.params, state.opt_state, create_if_missing=True,
        init_weights_path=cfg.voc_train.init_weights_path)
    state = wt.TrainState(params, opt_state,
                          jax.numpy.asarray(step, jax.numpy.int32))

    train_set, test_set = get_vocoder_datasets(
        ws.data, batch_size, cfg, train_gta=args.gta,
        tts_model_id=cfg.tts_model_id if args.gta else "", seed=args.seed,
        num_shards=max(n_hosts, 1), shard_index=jax.process_index())

    total_steps = (10_000_000 if args.force_train
                   else cfg.voc_train.total_steps)
    simple_table([
        ("Remaining", f"{(total_steps - int(state.step)) // 1000}k Steps"),
        ("Batch Size", batch_size),
        ("LR", lr),
        ("Sequence Len", cfg.voc_train.seq_len),
        ("GTA Train", args.gta),
        ("Devices", f"{mesh.shape['data']} data-parallel"
                    f" x {max(n_hosts, 1)} host(s)"),
        ("Pruning", (f"{cfg.voc_train.prune_sparsity:.2%} by step "
                     f"{cfg.voc_train.prune_start + cfg.voc_train.prune_steps}"
                     if cfg.voc_train.prune else "off")),
    ])

    def on_checkpoint(st):
        gen_testset(st.params, test_set, cfg.voc_train.gen_at_checkpoint,
                    cfg.voc.gen_batched, cfg.voc.target, cfg.voc.overlap,
                    ws.voc_output, cfg, step=int(st.step))

    wt.train_loop(cfg, ws, train_set, state, lr=lr, total_steps=total_steps,
                  on_checkpoint=on_checkpoint, mesh=mesh,
                  profile_dir=args.profile_dir)
    print("Training Complete.")


if __name__ == "__main__":
    main()
