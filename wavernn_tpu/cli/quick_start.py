"""CLI: quick start from pretrained weights (reference quick_start.py).

Loads pretrained Tacotron + WaveRNN weights (reference .pyt checkpoints —
optionally inside the released zips — or our .npz) and synthesizes the
standard test sentences with the batched fold/xfade pipeline
(target=11000, overlap=550, quick_start.py:120).

    python -m wavernn_tpu.cli.quick_start \
        --voc_weights pretrained/ljspeech.wavernn.mol.800k/latest_weights.pyt \
        --tts_weights pretrained/ljspeech.tacotron.r2.180k/latest_weights.pyt
"""
from __future__ import annotations

import argparse
import zipfile
from pathlib import Path

import jax

from ..dsp.audio import save_wav
from ..synthesis import tts_to_wav
from ..utils.display import save_attention, simple_table
from .common import load_config, load_tts_weights, load_voc_weights


def _maybe_unzip(pretrained_dir: Path):
    """Extract any pretrained zips in place (quick_start.py:12-21)."""
    for z in pretrained_dir.glob("*.zip"):
        out = pretrained_dir / z.stem
        if not out.exists():
            with zipfile.ZipFile(z) as f:
                f.extractall(out)
            print(f"Extracted {z.name}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TTS quick start")
    parser.add_argument("--input_text", "-i", default=None)
    parser.add_argument("--batched", "-b", dest="unbatched",
                        action="store_false", help="fold-batched generation "
                        "(the default, like quick_start.py:29)")
    parser.add_argument("--unbatched", "-u", action="store_true")
    parser.add_argument("--voc_weights", default=None)
    parser.add_argument("--tts_weights", default=None)
    parser.add_argument("--pretrained_dir", default="pretrained")
    parser.add_argument("--save_attention", "-a", action="store_true")
    parser.add_argument("--hp_file", default=None)
    parser.add_argument("--force_cpu", "-c", action="store_true")
    args = parser.parse_args(argv)
    if args.force_cpu:
        from .common import force_cpu_backend
        force_cpu_backend()

    cfg = load_config(args.hp_file)
    batched = not args.unbatched

    pre = Path(args.pretrained_dir)
    if pre.exists():
        _maybe_unzip(pre)
    voc_weights = args.voc_weights or next(
        pre.rglob("*wavernn*/latest_weights.pyt"), None)
    tts_weights = args.tts_weights or next(
        pre.rglob("*tacotron*/latest_weights.pyt"), None)
    if voc_weights is None or tts_weights is None:
        raise SystemExit("No pretrained weights found; pass --voc_weights / "
                         "--tts_weights")

    voc_params, voc_step = load_voc_weights(voc_weights, cfg)
    tts_params, tts_step, r = load_tts_weights(tts_weights, cfg)

    simple_table([
        ("WaveRNN", f"{voc_step // 1000}k"),
        ("Tacotron", f"{tts_step // 1000}k"), ("r", r),
        ("Generation Mode", "Batched" if batched else "Unbatched"),
        ("Target Samples", cfg.voc.target if batched else "N/A"),
        ("Overlap Samples", cfg.voc.overlap if batched else "N/A"),
    ])

    if args.input_text:
        inputs = [args.input_text.strip()]
    else:
        with open("test_sentences/sentences.txt") as f:
            inputs = [line.strip() for line in f if line.strip()]

    out_dir = Path("quick_start_output")
    out_dir.mkdir(exist_ok=True)
    for i, text in enumerate(inputs, 1):
        print(f"| Generating {i}/{len(inputs)}: {text[:40]}")
        wav, m, attention = tts_to_wav(tts_params, voc_params, text, cfg, r,
                                       key=jax.random.PRNGKey(i),
                                       batched=batched)
        save_path = out_dir / f"{i}_batched{batched}_{tts_step // 1000}k.wav"
        if args.save_attention:
            save_attention(attention, save_path)
        save_wav(wav, save_path, cfg.dsp.sample_rate)
    print("Done.")


if __name__ == "__main__":
    main()
