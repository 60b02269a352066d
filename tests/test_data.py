import pickle

import numpy as np
import pytest

from wavernn_tpu.config import Config, DSPConfig, WaveRNNConfig
from wavernn_tpu.data import dataset as D
from wavernn_tpu.data.preprocess import convert_file, preprocess
from wavernn_tpu.dsp.audio import save_wav
from wavernn_tpu.paths import Workspace

CFG = Config()


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    """Synthetic LJSpeech-style corpus: wavs/ + metadata.csv."""
    root = tmp_path_factory.mktemp("corpus")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(60):
        n = CFG.dsp.hop_length * rng.randint(20, 40)
        t = np.arange(n) / CFG.dsp.sample_rate
        f = 200 + 20 * i
        y = 0.4 * np.sin(2 * np.pi * f * t) + 0.01 * rng.randn(n)
        save_wav(y.astype(np.float32), wav_dir / f"item{i:03d}.wav",
                 CFG.dsp.sample_rate)
        lines.append(f"item{i:03d}|raw|Sentence number {i} here.")
    (root / "metadata.csv").write_text("\n".join(lines))
    return root


@pytest.fixture(scope="module")
def prepped(tiny_corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("workspace")
    ws = Workspace(out / "data", "voctest", "ttstest", output_root=out)
    manifest = preprocess(CFG, ws, wav_path=tiny_corpus / "wavs",
                          n_workers=2, log=lambda *a: None)
    return ws, manifest


def test_preprocess_artifacts(prepped):
    ws, manifest = prepped
    assert len(manifest) == 60
    assert (ws.data / "dataset.pkl").exists()
    assert (ws.data / "text_dict.pkl").exists()
    item, n_frames = manifest[0]
    mel = np.load(ws.mel / f"{item}.npy")
    quant = np.load(ws.quant / f"{item}.npy")
    assert mel.shape == (CFG.dsp.num_mels, n_frames)
    assert mel.min() >= 0 and mel.max() <= 1
    # MOL mode: 16-bit labels
    assert quant.dtype == np.int64
    assert quant.min() >= 0 and quant.max() <= 2 ** 16 - 1


def test_convert_file_raw_mode(tiny_corpus):
    cfg = Config(voc=WaveRNNConfig(mode="RAW"))
    mel, quant = convert_file(next((tiny_corpus / "wavs").glob("*.wav")), cfg)
    assert quant.max() <= 2 ** cfg.dsp.bits - 1


def test_vocoder_split_deterministic(prepped):
    ws, _ = prepped
    cfg = Config(voc_train=CFG.voc_train.__class__(test_samples=10))
    tr1, te1 = D.vocoder_split(ws.data, 10)
    tr2, te2 = D.vocoder_split(ws.data, 10)
    assert tr1 == tr2 and te1 == te2
    assert len(te1) == 10 and not set(tr1) & set(te1)


def test_vocoder_batcher_shapes(prepped):
    ws, _ = prepped
    train, test = D.get_vocoder_datasets(ws.data, 8, CFG)
    x, y, m = next(iter(train))
    seq_len = CFG.voc_train.seq_len
    mel_win = seq_len // CFG.dsp.hop_length + 2 * CFG.voc.pad
    assert x.shape == (8, seq_len)
    assert y.shape == (8, seq_len)
    assert m.shape == (8, CFG.dsp.num_mels, mel_win)
    # MOL: x and y both floats in [-1, 1]
    assert -1 <= x.min() and x.max() <= 1
    assert -1 <= y.min() and y.max() <= 1
    # x/y are shifted views of the same label stream
    bits = 16
    x_lab = np.round((x + 1) * (2 ** bits - 1) / 2)
    y_lab = np.round((y + 1) * (2 ** bits - 1) / 2)
    np.testing.assert_array_equal(x_lab[:, 1:], y_lab[:, :-1])


def test_vocoder_batcher_sharding(prepped):
    ws, _ = prepped
    full, _ = D.get_vocoder_datasets(ws.data, 8, CFG, seed=3)
    s0, _ = D.get_vocoder_datasets(ws.data, 8, CFG, seed=3, num_shards=2,
                                   shard_index=0)
    s1, _ = D.get_vocoder_datasets(ws.data, 8, CFG, seed=3, num_shards=2,
                                   shard_index=1)
    xf, yf, mf = next(iter(full))
    x0, y0, m0 = next(iter(s0))
    x1, y1, m1 = next(iter(s1))
    np.testing.assert_array_equal(np.concatenate([m0, m1]), mf)


def test_tts_batcher(prepped):
    ws, _ = prepped
    r = 2
    train, attn_example = D.get_tts_datasets(ws.data, 4, r, CFG)
    chars, mel, ids, mel_lens = next(iter(train))
    assert chars.shape[0] == 4 and chars.dtype == np.int64
    assert mel.shape[0] == 4 and mel.shape[1] == CFG.dsp.num_mels
    assert mel.shape[2] % r == 0
    assert -4.0 <= mel.min() and mel.max() <= 4.0
    assert len(ids) == 4
    assert isinstance(attn_example, str)
    # binned sampling keeps similar lengths together
    assert max(mel_lens) - min(mel_lens) <= mel.shape[2]


def test_pad_cut_attn_shapes():
    rng = np.random.RandomState(0)
    attn = rng.uniform(0, 1, (10, 7))
    out = D.pad_cut_attn(attn.copy(), 9, 12)
    assert out.shape == (12, 9)
    out = D.pad_cut_attn(attn.copy(), 5, 8)
    assert out.shape == (8, 5)


def test_binned_length_order_covers_all():
    import random as pyrandom
    lengths = list(np.random.RandomState(0).randint(10, 100, 50))
    order = D.binned_length_order(lengths, 4, 12, pyrandom.Random(0))
    assert sorted(order) == list(range(50))
