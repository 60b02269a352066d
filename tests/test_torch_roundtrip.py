"""Checkpoint import/export round trip vs live reference models.

export(import(sd)) must reproduce every key/value of a real reference
state dict, and the export must load into the reference model with
strict=True — making the importer claim airtight for the stripped
pretrained zips (quick_start.py:12-21) and letting checkpoints trained
here load in the reference (utils/checkpoints.py:79-132).
"""
import numpy as np
import pytest

from wavernn_tpu.config import DSPConfig, TacotronConfig, WaveRNNConfig
from wavernn_tpu.compat.torch_export import export_tacotron, export_wavernn
from wavernn_tpu.compat.torch_import import (import_tacotron,
                                             import_tacotron_r,
                                             import_wavernn,
                                             import_wavernn_step)

DSP = DSPConfig()


def _ref_wavernn(reference_modules, voc, mode):
    import torch
    torch.manual_seed(0)
    return reference_modules.wavernn.WaveRNN(
        rnn_dims=voc.rnn_dims, fc_dims=voc.fc_dims, bits=DSP.bits,
        pad=voc.pad, upsample_factors=voc.upsample_factors,
        feat_dims=DSP.num_mels, compute_dims=voc.compute_dims,
        res_out_dims=voc.res_out_dims, res_blocks=voc.res_blocks,
        hop_length=DSP.hop_length, sample_rate=DSP.sample_rate, mode=mode)


def _ref_tacotron(reference_modules, tts):
    import torch
    torch.manual_seed(0)
    return reference_modules.tacotron.Tacotron(
        embed_dims=tts.embed_dims, num_chars=148,
        encoder_dims=tts.encoder_dims, decoder_dims=tts.decoder_dims,
        n_mels=80, fft_bins=80, postnet_dims=tts.postnet_dims,
        encoder_K=tts.encoder_K, lstm_dims=tts.lstm_dims,
        postnet_K=tts.postnet_K, num_highways=tts.num_highways,
        dropout=tts.dropout, stop_threshold=tts.stop_threshold,
        mode="teacher_forcing")


def _assert_sd_equal(got, want):
    assert set(got) == set(want), (
        sorted(set(want) - set(got)), sorted(set(got) - set(want)))
    for k in want:
        if k.endswith("num_batches_tracked"):
            continue  # torch BN bookkeeping; value irrelevant
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


@pytest.mark.parametrize("mode", ["MOL", "RAW"])
def test_wavernn_roundtrip(reference_modules, mode):
    voc = WaveRNNConfig(mode=mode, rnn_dims=64, fc_dims=48, compute_dims=16,
                        res_out_dims=32, res_blocks=2, pad=2,
                        upsample_factors=(5, 5, 11))
    m = _ref_wavernn(reference_modules, voc, mode)
    m.step += 41
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    params = import_wavernn(sd, voc, DSP)
    out = export_wavernn(params, voc, DSP, step=import_wavernn_step(sd))
    _assert_sd_equal(out, sd)

    # and the export loads back into the reference model strictly
    import torch
    m.load_state_dict({k: torch.as_tensor(v) for k, v in out.items()},
                      strict=True)


def test_tacotron_roundtrip(reference_modules):
    tts = TacotronConfig(embed_dims=32, encoder_dims=128, decoder_dims=256,
                         postnet_dims=16, encoder_K=3, lstm_dims=48,
                         postnet_K=2, num_highways=2)
    m = _ref_tacotron(reference_modules, tts)
    m.r = 2
    m.step += 7
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    params = import_tacotron(sd, tts)
    out = export_tacotron(params, tts, step=int(sd["step"][0]),
                          r=import_tacotron_r(sd),
                          stop_threshold=float(sd["stop_threshold"]))
    _assert_sd_equal(out, sd)

    import torch
    m.load_state_dict({k: torch.as_tensor(v) for k, v in out.items()},
                      strict=True)


def test_params_roundtrip_through_state_dict(reference_modules):
    """import(export(params)) == params for our own initialization."""
    import jax

    from wavernn_tpu.models import wavernn as wr

    voc = WaveRNNConfig(mode="MOL", rnn_dims=64, fc_dims=48, compute_dims=16,
                        res_out_dims=32, res_blocks=1, pad=2,
                        upsample_factors=(5, 5, 11))
    params = wr.init_wavernn(jax.random.PRNGKey(3), voc, DSP)
    back = import_wavernn(export_wavernn(params, voc, DSP), voc, DSP)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(p): l
             for p, l in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat1:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat2[key]), err_msg=key)
