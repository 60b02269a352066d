import math

import pytest

from wavernn_tpu.config import Config, WaveRNNConfig


def test_defaults_match_reference_hparams():
    cfg = Config()
    assert cfg.dsp.sample_rate == 22050
    assert cfg.dsp.n_fft == 2048 and cfg.dsp.fft_bins == 1025
    assert cfg.dsp.hop_length == 275 and cfg.dsp.win_length == 1100
    assert cfg.voc.mode == "MOL" and cfg.voc.n_classes(cfg.dsp.bits) == 30
    assert WaveRNNConfig(mode="RAW").n_classes(9) == 512
    assert math.prod(cfg.voc.upsample_factors) == cfg.dsp.hop_length
    assert cfg.voc_train.seq_len == 275 * 5
    assert cfg.tts_train.schedule[0] == (7, 1e-3, 10_000, 32)
    assert cfg.tts.stop_threshold == -3.4


def test_invalid_upsample_factors_rejected():
    with pytest.raises(ValueError, match="factorise"):
        Config(voc=WaveRNNConfig(upsample_factors=(5, 5, 10)))


def test_load_reference_root_hparams():
    cfg = Config.from_hparams_file("/root/reference/hparams.py")
    assert cfg.voc_model_id == "ljspeech_mol"
    assert cfg.tts_model_id == "ljspeech_lsa_smooth_attention"
    assert cfg.voc.target == 11_000 and cfg.voc.overlap == 550
    assert cfg.tts.mode == "teacher_forcing"  # root file lacks `mode`


@pytest.mark.parametrize("name,mode", [
    ("hparams_gold.py", "teacher_forcing"),
    ("hparams_af_offline.py", "attention_forcing_offline"),
    ("hparams_af_online_kl_tune.py", "attention_forcing_online"),
])
def test_load_fork_experiment_hparams(name, mode):
    """The fork's per-experiment files load with their extras intact
    (scripts/hparams_*.py)."""
    import os
    path = f"/root/reference/scripts/{name}"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    cfg = Config.from_hparams_file(path)
    assert cfg.tts.mode == mode
    if mode != "teacher_forcing":
        assert cfg.tts_train.attn_loss_coeff is not None
    if mode == "attention_forcing_online":
        assert cfg.tts_train.model_tf_path
    if mode == "attention_forcing_offline":
        assert cfg.tts_train.attn_ref_path


def test_precision_typos_rejected():
    """precision is validated at construction so "bf16"/"bfloat" typos can't
    silently train at f32 (train steps only special-case "bfloat16")."""
    from wavernn_tpu.config import TacotronTrainConfig, WaveRNNTrainConfig
    assert WaveRNNTrainConfig(precision="bfloat16").precision == "bfloat16"
    assert TacotronTrainConfig(precision="float32").precision == "float32"
    for bad in ("bf16", "bfloat", "fp32", "float16"):
        with pytest.raises(ValueError):
            WaveRNNTrainConfig(precision=bad)
        with pytest.raises(ValueError):
            TacotronTrainConfig(precision=bad)


import glob
import os

import pytest as _pytest

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@_pytest.mark.parametrize("path", sorted(glob.glob(
    os.path.join(_CONFIG_DIR, "*.py"))), ids=os.path.basename)
def test_in_repo_experiment_presets_load(path):
    """Every configs/ preset of record loads into a valid typed Config
    (a fresh checkout can run a named experiment without reaching into the
    reference's scripts/)."""
    from wavernn_tpu.config import Config

    cfg = Config.from_hparams_file(path)
    name = os.path.basename(path)
    assert cfg.voc_model_id.startswith("lj_"), name
    if "af_offline" in name:
        assert cfg.tts.mode == "attention_forcing_offline"
        assert cfg.tts_train.attn_ref_path == "attn_lj_gold"
        assert cfg.tts_train.attn_loss_coeff == 200.0
    if "af_online" in name:
        assert cfg.tts.mode == "attention_forcing_online"
        assert cfg.ignore_voc and cfg.tts_train.model_tf_path
        assert cfg.test_sentences_names is not None
    if "gold" in name:
        assert cfg.tts_train.schedule[0][0] == 7  # progressive r
        assert cfg.tts_train.init_weights_path
    if "prune" in name:
        assert cfg.voc_train.prune
        assert cfg.voc_train.prune_block == (128, 128)
        assert cfg.voc_train.prune_sparsity == 0.9375
    if "debug" in name:
        assert cfg.voc_train.total_steps == 1_000_000
