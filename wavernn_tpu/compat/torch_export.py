"""Export wavernn_tpu parameter pytrees to reference PyTorch state-dict
layout (inverse of torch_import.py).

Guarantees the import/export pair is lossless both ways:
``export(import(sd)) == sd`` and ``import(export(params)) == params`` —
so the day the stripped pretrained zips (`ljspeech.wavernn.mol.800k`,
`ljspeech.tacotron.r2.180k`, reference quick_start.py:12-21) are
available they import unchanged, and checkpoints trained here can be
loaded by the reference's `model.load()` (utils/checkpoints.py:79-132).

Values are numpy arrays keyed by the reference's state-dict names; wrap
with torch.tensor / torch.save at the caller if a .pyt file is needed
(kept torch-free here so export works without torch installed).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import DSPConfig, TacotronConfig, WaveRNNConfig


def _x(a) -> np.ndarray:
    return np.asarray(a)


def _lin(sd, prefix, p):
    sd[f"{prefix}.weight"] = _x(p["w"]).T
    if "b" in p:
        sd[f"{prefix}.bias"] = _x(p["b"])


def _conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = _x(p["w"])
    if "b" in p:
        sd[f"{prefix}.bias"] = _x(p["b"])


def _bn(sd, prefix, p):
    sd[f"{prefix}.weight"] = _x(p["scale"])
    sd[f"{prefix}.bias"] = _x(p["bias"])
    sd[f"{prefix}.running_mean"] = _x(p["mean"])
    sd[f"{prefix}.running_var"] = _x(p["var"])
    # torch tracks batch count as an extra buffer; value is irrelevant at
    # inference (momentum-free load) but the key must exist for
    # load_state_dict without strict=False surprises
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _gru(sd, prefix, p, suffix="_l0"):
    sd[f"{prefix}.weight_ih{suffix}"] = _x(p["wi"]).T
    sd[f"{prefix}.weight_hh{suffix}"] = _x(p["wh"]).T
    sd[f"{prefix}.bias_ih{suffix}"] = _x(p["bi"])
    sd[f"{prefix}.bias_hh{suffix}"] = _x(p["bh"])


def _cell(sd, prefix, p):
    sd[f"{prefix}.weight_ih"] = _x(p["wi"]).T
    sd[f"{prefix}.weight_hh"] = _x(p["wh"]).T
    sd[f"{prefix}.bias_ih"] = _x(p["bi"])
    sd[f"{prefix}.bias_hh"] = _x(p["bh"])


# --------------------------------------------------------------------------
# WaveRNN
# --------------------------------------------------------------------------

def export_wavernn(params, voc: WaveRNNConfig, dsp: DSPConfig,
                   step: int = 0) -> Dict[str, np.ndarray]:
    """wavernn_tpu params pytree -> reference WaveRNN state dict
    (models/fatchord_version.py module names)."""
    sd: Dict[str, np.ndarray] = {}
    res = params["upsample"]["resnet"]
    _conv(sd, "upsample.resnet.conv_in", res["conv_in"])
    _bn(sd, "upsample.resnet.batch_norm", res["bn"])
    for i, blk in enumerate(res["blocks"]):
        _conv(sd, f"upsample.resnet.layers.{i}.conv1", blk["conv1"])
        _bn(sd, f"upsample.resnet.layers.{i}.batch_norm1", blk["bn1"])
        _conv(sd, f"upsample.resnet.layers.{i}.conv2", blk["conv2"])
        _bn(sd, f"upsample.resnet.layers.{i}.batch_norm2", blk["bn2"])
    _conv(sd, "upsample.resnet.conv_out", res["conv_out"])
    for j, c in enumerate(params["upsample"]["up_convs"]):
        sd[f"upsample.up_layers.{2 * j + 1}.weight"] = _x(c["w"])
    _lin(sd, "I", params["I"])
    _gru(sd, "rnn1", params["rnn1"])
    _gru(sd, "rnn2", params["rnn2"])
    _lin(sd, "fc1", params["fc1"])
    _lin(sd, "fc2", params["fc2"])
    _lin(sd, "fc3", params["fc3"])
    # training progress is a buffer inside the reference state dict
    # (fatchord_version.py:125,139)
    sd["step"] = np.asarray([step], np.int64)
    return sd


# --------------------------------------------------------------------------
# Tacotron
# --------------------------------------------------------------------------

def _highways(sd, prefix, hws):
    for i, h in enumerate(hws):
        _lin(sd, f"{prefix}.highways.{i}.W1", h["W1"])
        _lin(sd, f"{prefix}.highways.{i}.W2", h["W2"])


def _cbhg(sd, prefix, p, has_pre_highway):
    for i, b in enumerate(p["bank"]):
        _conv(sd, f"{prefix}.conv1d_bank.{i}.conv", b["conv"])
        _bn(sd, f"{prefix}.conv1d_bank.{i}.bnorm", b["bn"])
    _conv(sd, f"{prefix}.conv_project1.conv", p["proj1"]["conv"])
    _bn(sd, f"{prefix}.conv_project1.bnorm", p["proj1"]["bn"])
    _conv(sd, f"{prefix}.conv_project2.conv", p["proj2"]["conv"])
    _bn(sd, f"{prefix}.conv_project2.bnorm", p["proj2"]["bn"])
    if has_pre_highway:
        _lin(sd, f"{prefix}.pre_highway", p["pre_highway"])
    _highways(sd, prefix, p["highways"])
    _gru(sd, f"{prefix}.rnn", p["rnn_fwd"], "_l0")
    _gru(sd, f"{prefix}.rnn", p["rnn_bwd"], "_l0_reverse")


def _prenet(sd, prefix, p):
    _lin(sd, f"{prefix}.fc1", p["fc1"])
    _lin(sd, f"{prefix}.fc2", p["fc2"])


def export_tacotron(params, tts: TacotronConfig, step: int = 0, r: int = 1,
                    stop_threshold: float = None) -> Dict[str, np.ndarray]:
    """wavernn_tpu params pytree -> reference Tacotron state dict
    (models/tacotron.py module names, incl. the r/step/stop_threshold
    buffers the reference stores in checkpoints, tacotron.py:306-317)."""
    sd: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    sd["encoder.embedding.weight"] = _x(enc["embedding"]["table"])
    _prenet(sd, "encoder.pre_net", enc["prenet"])
    _cbhg(sd, "encoder.cbhg", enc["cbhg"], has_pre_highway=False)
    _lin(sd, "encoder_proj", params["encoder_proj"])
    dec = params["decoder"]
    _prenet(sd, "decoder.prenet", dec["prenet"])
    _conv(sd, "decoder.attn_net.conv", dec["attn"]["conv"])
    _lin(sd, "decoder.attn_net.L", dec["attn"]["L"])
    _lin(sd, "decoder.attn_net.W", dec["attn"]["W"])
    _lin(sd, "decoder.attn_net.v", dec["attn"]["v"])
    _cell(sd, "decoder.attn_rnn", dec["attn_rnn"])
    _lin(sd, "decoder.rnn_input", dec["rnn_input"])
    _cell(sd, "decoder.res_rnn1", dec["res_rnn1"])
    _cell(sd, "decoder.res_rnn2", dec["res_rnn2"])
    _lin(sd, "decoder.mel_proj", dec["mel_proj"])
    _cbhg(sd, "postnet", params["postnet"], has_pre_highway=True)
    _lin(sd, "post_proj", params["post_proj"])
    sd["step"] = np.asarray([step], np.int64)
    # r lives on the Decoder module; step/stop_threshold on the model
    # (tacotron.py:214,306-307)
    sd["decoder.r"] = np.asarray(r, np.int32)
    sd["stop_threshold"] = np.asarray(
        tts.stop_threshold if stop_threshold is None else stop_threshold,
        np.float32)
    return sd


def save_torch_checkpoint(sd: Dict[str, np.ndarray], path) -> None:
    """Write a reference-loadable .pyt file (torch.save of tensors)."""
    import torch
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, path)
