"""CLI: vocoder copy-synthesis (reference gen_wavernn.py).

    python -m wavernn_tpu.cli.gen_wavernn [--file x.wav|mel.npy] [--weights w.npz]
"""
from __future__ import annotations

import argparse

import jax

from ..data.dataset import get_vocoder_datasets
from ..synthesis import gen_from_file, gen_testset
from ..utils.display import simple_table
from .common import load_config, load_voc_weights, make_workspace


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate WaveRNN samples")
    parser.add_argument("--batched", "-b", dest="batched", action="store_true")
    parser.add_argument("--unbatched", "-u", dest="batched",
                        action="store_false")
    parser.set_defaults(batched=None)
    parser.add_argument("--samples", "-s", type=int)
    parser.add_argument("--target", "-t", type=int)
    parser.add_argument("--overlap", "-o", type=int)
    parser.add_argument("--file", "-f", help="wav or mel npy to vocode")
    parser.add_argument("--weights", "--voc_weights", "-w", dest="weights",
                        help="weights file (.npz or .pyt)")
    parser.add_argument("--gta", "-g", action="store_true")
    parser.add_argument("--pallas", dest="pallas", action="store_true",
                        default=None,
                        help="force the persistent-weights TPU kernel "
                             "(default: auto — kernel on TPU, scan on CPU)")
    parser.add_argument("--no_pallas", dest="pallas", action="store_false",
                        help="force the portable lax.scan sample loop")
    parser.add_argument("--sparse", action="store_true",
                        help="serve a block-pruned checkpoint through the "
                             "sparse sample-loop schedule (weights are "
                             "packed once at load; matrices that are not "
                             "block-sparse stay dense)")
    parser.add_argument("--hp_file", default=None)
    parser.add_argument("--force_cpu", "-c", action="store_true")
    args = parser.parse_args(argv)
    if args.force_cpu:
        from .common import force_cpu_backend
        force_cpu_backend()

    cfg = load_config(args.hp_file)
    ws = make_workspace(cfg)
    batched = cfg.voc.gen_batched if args.batched is None else args.batched
    samples = args.samples or cfg.voc_train.gen_at_checkpoint
    target = args.target or cfg.voc.target
    overlap = args.overlap or cfg.voc.overlap

    weights = args.weights or ws.voc_latest_weights
    params, step = load_voc_weights(weights, cfg)

    sparse_packed = None
    if args.sparse:
        from ..ops.pallas_gen import pack_sparse
        sparse_packed = pack_sparse(params, cfg.voc)
        if not sparse_packed[0]:
            print("| --sparse: no (128,128)-block-sparse matrices found in "
                  "the checkpoint; serving dense")

    simple_table([
        ("Generation Mode", "Batched" if batched else "Unbatched"),
        ("Target Samples", target if batched else "N/A"),
        ("Overlap Samples", overlap if batched else "N/A"),
        ("Step", f"{step // 1000}k"),
    ])

    if args.file:
        gen_from_file(params, args.file, ws.voc_output, batched, target,
                      overlap, cfg, step=step, use_pallas=args.pallas,
                      sparse_packed=sparse_packed)
    else:
        _, test_set = get_vocoder_datasets(ws.data, 1, cfg, train_gta=args.gta)
        gen_testset(params, test_set, samples, batched, target, overlap,
                    ws.voc_output, cfg, step=step,
                    sparse_packed=sparse_packed)
    print("\nExiting...")


if __name__ == "__main__":
    main()
