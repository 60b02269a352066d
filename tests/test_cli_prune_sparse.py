"""End-to-end prune -> sparse-serve user journey at the CLI level
(VERDICT r4 weak #4 / next #5): train a checkpoint with
``train_wavernn --prune``, reload it with ``gen_wavernn --sparse``, and
assert the packed block-sparse schedule actually engages (not the
"serving dense" fallback) and the audio matches the dense-masked run.

This is the product path docs/SERVING.md sells (reference prototype:
notebooks/Pruning - Scratchpad.ipynb cells 4-5); the kernel numerics are
covered separately in tests/test_pallas_sparse.py.

The model uses rnn/fc dims 256 so every gate split holds 4 (128,128)
blocks — at 75% target sparsity the block magnitude schedule keeps 1 of
4, a pattern pack_sparse's gather-free schedule can pack (a 128-dim toy
would leave one block per gate, which the >=-threshold keep rule never
drops).
"""
import os
import textwrap

import numpy as np
import pytest

from wavernn_tpu.config import Config
from wavernn_tpu.dsp.audio import save_wav


@pytest.fixture(scope="module")
def prune_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("prune_proj")
    wav_dir = root / "corpus" / "wavs"
    wav_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    cfg = Config()
    lines = []
    for i in range(12):
        n = cfg.dsp.hop_length * rng.randint(20, 28)
        t = np.arange(n) / cfg.dsp.sample_rate
        y = 0.4 * np.sin(2 * np.pi * (220 + 15 * i) * t)
        save_wav(y.astype(np.float32), wav_dir / f"p{i:02d}.wav",
                 cfg.dsp.sample_rate)
        lines.append(f"p{i:02d}|raw|Utterance number {i}.")
    (root / "corpus" / "metadata.csv").write_text("\n".join(lines))

    hp = root / "hparams_prune.py"
    hp.write_text(textwrap.dedent(f"""
        wav_path = {str(wav_dir)!r}
        data_path = {str(root / 'data')!r}
        voc_model_id = 'prune_voc'
        tts_model_id = 'prune_tts'
        voc_mode = 'RAW'
        voc_rnn_dims = 256
        voc_fc_dims = 256
        voc_compute_dims = 16
        voc_res_out_dims = 16
        voc_res_blocks = 1
        voc_batch_size = 4
        voc_total_steps = 3
        voc_checkpoint_every = 1000
        voc_test_samples = 2
        voc_seq_len = 275 * 2
        voc_target = 2200
        voc_overlap = 550
        voc_prune = True
        voc_prune_start = 0
        voc_prune_steps = 1
        voc_prune_sparsity = 0.75
        voc_prune_every = 1
    """))
    cwd = os.getcwd()
    os.chdir(root)
    yield root, str(hp)
    os.chdir(cwd)


def _zero_block_fraction(W, br=128, bc=128):
    I, O = W.shape
    blocks = W[: I // br * br].reshape(I // br, br, O // bc, bc)
    dead = (np.abs(blocks).sum(axis=(1, 3)) == 0.0)
    return dead.mean()


def test_prune_train_leaves_block_dead_weights(prune_project):
    root, hp = prune_project
    from wavernn_tpu.cli.preprocess import main as preprocess
    from wavernn_tpu.cli.train_wavernn import main as train

    preprocess(["--hp_file", hp])
    train(["--hp_file", hp, "--prune"])

    ckpt = root / "checkpoints" / "prune_voc.wavernn" / "latest_weights.npz"
    assert ckpt.exists()
    w = np.load(ckpt)
    wh1 = w["params/rnn1/wh"]
    frac = _zero_block_fraction(wh1)
    # 75% block sparsity per gate: 3 of 4 (128,128) blocks dead per split
    assert frac >= 0.5, f"expected block-dead rnn1.wh, got {frac:.2f} dead"
    assert frac < 1.0, "pruning must not kill every block"


def test_gen_sparse_engages_packed_schedule(prune_project, capsys):
    root, hp = prune_project
    from wavernn_tpu.cli.common import load_config, load_voc_weights
    from wavernn_tpu.cli.gen_wavernn import main as gen
    from wavernn_tpu.ops.pallas_gen import pack_sparse

    cfg = load_config(hp)
    ckpt = root / "checkpoints" / "prune_voc.wavernn" / "latest_weights.npz"
    params, _ = load_voc_weights(str(ckpt), cfg)
    sparse_static, sparse_arrays = pack_sparse(params, cfg.voc)
    assert sparse_static, "pack_sparse found no block-sparse matrices"
    live = {name: sum(len(rj) for rj in rows)
            for name, _, rows in sparse_static}
    assert any(n > 0 for n in live.values()), live
    names = set(live)
    assert {"wh1", "wh2"} <= names, names

    out_dir = root / "model_outputs" / "prune_voc.wavernn"
    from wavernn_tpu.dsp.audio import load_wav

    gen(["--hp_file", hp, "--samples", "1", "--unbatched"])
    assert "serving dense" not in capsys.readouterr().out
    gen_files = sorted(p for p in out_dir.glob("*.wav")
                       if "target" not in p.name)
    assert gen_files
    dense = load_wav(gen_files[0], cfg.dsp.sample_rate)

    gen(["--hp_file", hp, "--samples", "1", "--unbatched", "--sparse"])
    assert "serving dense" not in capsys.readouterr().out
    sparse = load_wav(gen_files[0], cfg.dsp.sample_rate)

    # same checkpoint, same key: the sparse schedule must reproduce the
    # dense-masked audio exactly (skipped blocks contribute exactly 0)
    np.testing.assert_allclose(sparse, dense, atol=1e-6)
