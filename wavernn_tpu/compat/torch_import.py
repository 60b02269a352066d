"""Import reference PyTorch checkpoints into wavernn_tpu parameter pytrees.

Handles the pretrained artifacts (`ljspeech.wavernn.mol.800k`,
`ljspeech.tacotron.r2.180k`) and any state dict produced by the reference
models.  Linear/GRU/LSTM weights are transposed from torch's (out, in) rows
to our (in, out) right-matmul layout; cuDNN gate chunk order (r,z,n / i,f,g,o)
is identical in both, so no gate reshuffling is needed
(fatchord_version.py:273-279 shows GRU<->GRUCell share the same layout).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..config import DSPConfig, TacotronConfig, WaveRNNConfig


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a .pyt/.pt checkpoint into numpy without needing CUDA."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _lin(sd, prefix, bias=True):
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _conv(sd, prefix, bias=True):
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _bn(sd, prefix):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }


def _gru(sd, prefix, suffix="_l0"):
    return {
        "wi": jnp.asarray(sd[f"{prefix}.weight_ih{suffix}"].T),
        "wh": jnp.asarray(sd[f"{prefix}.weight_hh{suffix}"].T),
        "bi": jnp.asarray(sd[f"{prefix}.bias_ih{suffix}"]),
        "bh": jnp.asarray(sd[f"{prefix}.bias_hh{suffix}"]),
    }


def _cell(sd, prefix):
    """GRUCell / LSTMCell parameter names (no _l0 suffix)."""
    return {
        "wi": jnp.asarray(sd[f"{prefix}.weight_ih"].T),
        "wh": jnp.asarray(sd[f"{prefix}.weight_hh"].T),
        "bi": jnp.asarray(sd[f"{prefix}.bias_ih"]),
        "bh": jnp.asarray(sd[f"{prefix}.bias_hh"]),
    }


# --------------------------------------------------------------------------
# WaveRNN
# --------------------------------------------------------------------------

def import_wavernn(sd: Mapping[str, np.ndarray], voc: WaveRNNConfig,
                   dsp: DSPConfig):
    """Reference WaveRNN state dict -> wavernn_tpu params pytree."""
    res = {
        "conv_in": _conv(sd, "upsample.resnet.conv_in", bias=False),
        "bn": _bn(sd, "upsample.resnet.batch_norm"),
        "blocks": [
            {
                "conv1": _conv(sd, f"upsample.resnet.layers.{i}.conv1", bias=False),
                "bn1": _bn(sd, f"upsample.resnet.layers.{i}.batch_norm1"),
                "conv2": _conv(sd, f"upsample.resnet.layers.{i}.conv2", bias=False),
                "bn2": _bn(sd, f"upsample.resnet.layers.{i}.batch_norm2"),
            }
            for i in range(voc.res_blocks)
        ],
        "conv_out": _conv(sd, "upsample.resnet.conv_out"),
    }
    # up_layers alternate [stretch, conv, stretch, conv, ...] — convs at odd idx
    up_convs = [{"w": jnp.asarray(sd[f"upsample.up_layers.{2 * j + 1}.weight"])}
                for j in range(len(voc.upsample_factors))]
    return {
        "upsample": {"resnet": res, "up_convs": up_convs},
        "I": _lin(sd, "I"),
        "rnn1": _gru(sd, "rnn1"),
        "rnn2": _gru(sd, "rnn2"),
        "fc1": _lin(sd, "fc1"),
        "fc2": _lin(sd, "fc2"),
        "fc3": _lin(sd, "fc3"),
    }


def import_wavernn_step(sd: Mapping[str, np.ndarray]) -> int:
    return int(np.asarray(sd.get("step", 0)).reshape(-1)[0]) if "step" in sd else 0


# --------------------------------------------------------------------------
# Tacotron
# --------------------------------------------------------------------------

def _highways(sd, prefix, n):
    return [
        {"W1": _lin(sd, f"{prefix}.highways.{i}.W1"),
         "W2": _lin(sd, f"{prefix}.highways.{i}.W2")}
        for i in range(n)
    ]


def _cbhg(sd, prefix, K, num_highways, has_pre_highway):
    p = {
        "bank": [
            {"conv": _conv(sd, f"{prefix}.conv1d_bank.{i}.conv", bias=False),
             "bn": _bn(sd, f"{prefix}.conv1d_bank.{i}.bnorm")}
            for i in range(K)
        ],
        "proj1": {"conv": _conv(sd, f"{prefix}.conv_project1.conv", bias=False),
                  "bn": _bn(sd, f"{prefix}.conv_project1.bnorm")},
        "proj2": {"conv": _conv(sd, f"{prefix}.conv_project2.conv", bias=False),
                  "bn": _bn(sd, f"{prefix}.conv_project2.bnorm")},
        "highways": _highways(sd, prefix, num_highways),
        "rnn_fwd": _gru(sd, f"{prefix}.rnn", "_l0"),
        "rnn_bwd": _gru(sd, f"{prefix}.rnn", "_l0_reverse"),
    }
    if has_pre_highway:
        p["pre_highway"] = _lin(sd, f"{prefix}.pre_highway", bias=False)
    return p


def _prenet(sd, prefix):
    return {"fc1": _lin(sd, f"{prefix}.fc1"), "fc2": _lin(sd, f"{prefix}.fc2")}


def import_tacotron(sd: Mapping[str, np.ndarray], tts: TacotronConfig):
    """Reference Tacotron state dict -> wavernn_tpu params pytree."""
    return {
        "encoder": {
            "embedding": {"table": jnp.asarray(sd["encoder.embedding.weight"])},
            "prenet": _prenet(sd, "encoder.pre_net"),
            "cbhg": _cbhg(sd, "encoder.cbhg", tts.encoder_K, tts.num_highways,
                          has_pre_highway=False),
        },
        "encoder_proj": _lin(sd, "encoder_proj", bias=False),
        "decoder": {
            "prenet": _prenet(sd, "decoder.prenet"),
            "attn": {
                "conv": _conv(sd, "decoder.attn_net.conv", bias=False),
                "L": _lin(sd, "decoder.attn_net.L"),
                "W": _lin(sd, "decoder.attn_net.W"),
                "v": _lin(sd, "decoder.attn_net.v", bias=False),
            },
            "attn_rnn": _cell(sd, "decoder.attn_rnn"),
            "rnn_input": _lin(sd, "decoder.rnn_input"),
            "res_rnn1": _cell(sd, "decoder.res_rnn1"),
            "res_rnn2": _cell(sd, "decoder.res_rnn2"),
            "mel_proj": _lin(sd, "decoder.mel_proj", bias=False),
        },
        "postnet": _cbhg(sd, "postnet", tts.postnet_K, tts.num_highways,
                         has_pre_highway=True),
        "post_proj": _lin(sd, "post_proj", bias=False),
    }


def import_tacotron_r(sd: Mapping[str, np.ndarray]) -> int:
    for k in ("decoder.r", "r"):
        if k in sd:
            return int(np.asarray(sd[k]).reshape(-1)[0])
    return 1
