"""CLI: dataset preprocessing (reference preprocess.py).

    python -m wavernn_tpu.cli.preprocess --path /data/LJSpeech-1.1/wavs
"""
from __future__ import annotations

import argparse
from multiprocessing import cpu_count

from ..data.preprocess import preprocess
from ..utils.display import simple_table
from .common import load_config, make_workspace


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Preprocessing for WaveRNN and Tacotron")
    parser.add_argument("--path", "-p", help="dataset wav dir (overrides "
                        "hparams wav_path)")
    parser.add_argument("--extension", "-e", default=".wav")
    parser.add_argument("--num_workers", "-w", type=int,
                        default=max(1, cpu_count() - 1))
    parser.add_argument("--hp_file", default=None)
    parser.add_argument("--force_cpu", "-c", action="store_true")
    args = parser.parse_args(argv)
    if args.force_cpu:
        from .common import force_cpu_backend
        force_cpu_backend()

    cfg = load_config(args.hp_file)
    ws = make_workspace(cfg)
    simple_table([
        ("Sample Rate", cfg.dsp.sample_rate),
        ("Bit Depth", cfg.dsp.bits),
        ("Mu Law", cfg.dsp.mu_law),
        ("Hop Length", cfg.dsp.hop_length),
        ("CPU Usage", f"{args.num_workers}/{cpu_count()}"),
    ])
    dataset = preprocess(cfg, ws, wav_path=args.path or cfg.wav_path,
                         extension=args.extension,
                         n_workers=args.num_workers)
    if dataset:
        print('Completed. Ready to run "python -m wavernn_tpu.cli.'
              'train_tacotron" or "python -m wavernn_tpu.cli.train_wavernn".')


if __name__ == "__main__":
    main()
