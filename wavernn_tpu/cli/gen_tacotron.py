"""CLI: end-to-end TTS synthesis (reference gen_tacotron.py).

    python -m wavernn_tpu.cli.gen_tacotron wavernn --input_text "Hello."
    python -m wavernn_tpu.cli.gen_tacotron griffinlim --iters 32
"""
from __future__ import annotations

import argparse

import jax

from ..dsp.audio import save_wav
from ..synthesis import tts_to_wav
from ..utils.display import save_attention, simple_table
from .common import (load_config, load_tts_weights, load_voc_weights,
                     make_workspace)


def main(argv=None):
    parser = argparse.ArgumentParser(description="TTS Generator")
    parser.add_argument("--input_text", "-i", default=None)
    parser.add_argument("--save_attention", "-a", action="store_true")
    parser.add_argument("--hp_file", default=None)
    parser.add_argument("--force_cpu", "-c", action="store_true")
    parser.add_argument("--use_standard_names", action="store_true")
    subs = parser.add_subparsers(dest="vocoder", required=True)

    wr_p = subs.add_parser("wavernn")
    wr_p.add_argument("--batched", "-b", dest="batched", action="store_true")
    wr_p.add_argument("--unbatched", "-u", dest="batched",
                      action="store_false")
    wr_p.set_defaults(batched=None)
    wr_p.add_argument("--target", "-t", type=int, default=None,
                      help="samples per fold (overrides hparams)")
    wr_p.add_argument("--overlap", "-o", type=int, default=None,
                      help="crossover samples (overrides hparams)")
    wr_p.add_argument("--voc_weights", default=None)
    wr_p.add_argument("--tts_weights", default=None)
    wr_p.add_argument("--pallas", dest="pallas", action="store_true",
                      default=None,
                      help="force the persistent-weights TPU kernel "
                           "(default: auto — kernel on TPU, scan on CPU)")
    wr_p.add_argument("--no_pallas", dest="pallas", action="store_false")
    wr_p.add_argument("--sparse", action="store_true",
                      help="serve a block-pruned vocoder checkpoint through "
                           "the sparse sample-loop schedule")
    wr_p.add_argument("--fast", action="store_true",
                      help="device-resident serving path (one scalar sync, "
                           "length-bucketed vocoder) instead of the "
                           "reference host-roundtrip flow")
    wr_p.add_argument("--batch_sentences", action="store_true",
                      help="synthesize ALL input sentences together: one "
                           "pad-masked batched Tacotron decode + one "
                           "batched vocoder launch (tts_to_wav_batch) "
                           "instead of the reference's per-sentence loop")

    gl_p = subs.add_parser("griffinlim")
    gl_p.add_argument("--iters", type=int, default=32)
    gl_p.add_argument("--tts_weights", default=None)

    args = parser.parse_args(argv)
    if args.force_cpu:
        from .common import force_cpu_backend
        force_cpu_backend()
    cfg = load_config(args.hp_file)
    ws = make_workspace(cfg)

    tts_weights = args.tts_weights or ws.tts_latest_weights
    tts_params, tts_step, r = load_tts_weights(tts_weights, cfg)
    tts_k = tts_step // 1000

    voc_params, voc_step = None, 0
    batched = True
    target = overlap = None
    sparse_packed = None
    if args.vocoder == "wavernn":
        voc_weights = args.voc_weights or ws.voc_latest_weights
        voc_params, voc_step = load_voc_weights(voc_weights, cfg)
        if getattr(args, "sparse", False):
            from ..ops.pallas_gen import pack_sparse
            sparse_packed = pack_sparse(voc_params, cfg.voc)
            if not sparse_packed[0]:
                print("| --sparse: no (128,128)-block-sparse matrices found "
                      "in the checkpoint; serving dense")
        batched = (cfg.voc.gen_batched if args.batched is None
                   else args.batched)
        target = cfg.voc.target if args.target is None else args.target
        overlap = cfg.voc.overlap if args.overlap is None else args.overlap
        simple_table([
            ("Tacotron", f"{tts_k}k"), ("r", r),
            ("Vocoder Type", "WaveRNN"), ("WaveRNN", f"{voc_step // 1000}k"),
            ("Generation Mode", "Batched" if batched else "Unbatched"),
            ("Target Samples", target if batched else "N/A"),
            ("Overlap Samples", overlap if batched else "N/A"),
        ])
    else:
        simple_table([("Tacotron", f"{tts_k}k"), ("r", r),
                      ("Vocoder Type", "Griffin-Lim"),
                      ("GL Iters", args.iters)])

    fast = getattr(args, "fast", False) and args.vocoder == "wavernn"
    if fast and args.save_attention:
        print("| WARNING: --save_attention is not available with --fast "
              "(the device-resident path never materializes attention maps); "
              "rerun without --fast to dump attention plots")
    if fast and args.batched is False:
        print("| WARNING: --fast is always fold-batched; ignoring --unbatched")

    if args.input_text:
        inputs = [args.input_text.strip()]
    else:
        sent_file = cfg.test_sentences_file or "test_sentences/sentences.txt"
        with open(sent_file) as f:
            inputs = [line.strip() for line in f if line.strip()]

    if getattr(args, "batch_sentences", False) and args.vocoder != "wavernn":
        print("| WARNING: --batch_sentences needs the wavernn vocoder "
              "(the batched serving path is the one vocoder kernel launch); "
              "falling back to the per-sentence griffinlim loop")
    if getattr(args, "batch_sentences", False) and args.vocoder == "wavernn":
        from ..synthesis import tts_to_wav_batch
        if args.save_attention:
            print("| WARNING: --save_attention is not available with "
                  "--batch_sentences (the batched path never materializes "
                  "attention maps); rerun without it for attention plots")
        if fast:
            print("| WARNING: --batch_sentences supersedes --fast (the "
                  "batched path is already device-resident)")
        print(f"| Generating {len(inputs)} sentences in one batch")
        outs = tts_to_wav_batch(tts_params, voc_params, inputs, cfg, r,
                                key=jax.random.PRNGKey(1),
                                use_pallas=getattr(args, "pallas", None),
                                target=target, overlap=overlap,
                                sparse_packed=sparse_packed)
        for i, (text, (wav, m)) in enumerate(zip(inputs, outs), 1):
            if args.input_text:
                save_path = ws.tts_output / \
                    f"__input_{args.input_text[:10]}_wavernn_batchN_{tts_k}k.wav"
            else:
                save_path = ws.tts_output / f"{i}_wavernn_batchN_{tts_k}k.wav"
            if args.use_standard_names and cfg.test_sentences_names:
                save_path = (ws.tts_output
                             / f"{cfg.test_sentences_names[i - 1]}.wav")
            save_wav(wav, save_path, cfg.dsp.sample_rate)
        print("Done.")
        return

    for i, text in enumerate(inputs, 1):
        print(f"| Generating {i}/{len(inputs)}")
        if fast:
            from ..synthesis import tts_to_wav_fast
            wav, m = tts_to_wav_fast(
                tts_params, voc_params, text, cfg, r,
                key=jax.random.PRNGKey(i),
                use_pallas=getattr(args, "pallas", None),
                target=target, overlap=overlap,
                sparse_packed=sparse_packed)
            attention = None
        else:
            wav, m, attention = tts_to_wav(
                tts_params, voc_params, text, cfg, r,
                key=jax.random.PRNGKey(i), batched=batched,
                vocoder=args.vocoder,
                gl_iters=getattr(args, "iters", 32),
                use_pallas=getattr(args, "pallas", None),
                target=target, overlap=overlap,
                sparse_packed=sparse_packed)

        if args.vocoder == "griffinlim":
            v_type = "griffinlim"
        elif fast:
            v_type = "wavernn_fast"
        elif batched:
            v_type = "wavernn_batched"
        else:
            v_type = "wavernn_unbatched"

        if args.input_text:
            save_path = ws.tts_output / \
                f"__input_{args.input_text[:10]}_{v_type}_{tts_k}k.wav"
        else:
            save_path = ws.tts_output / f"{i}_{v_type}_{tts_k}k.wav"
        if args.use_standard_names and cfg.test_sentences_names:
            save_path = ws.tts_output / f"{cfg.test_sentences_names[i - 1]}.wav"

        if args.save_attention and attention is not None:
            save_attention(attention, save_path)
        save_wav(wav, save_path, cfg.dsp.sample_rate)
    print("Done.")


if __name__ == "__main__":
    main()
