"""Free-running Tacotron generation parity: eval mode is deterministic
(no dropout/zoneout), so same weights -> same mel trajectory and same stop
step as the reference."""
import numpy as np
import jax
import pytest

from wavernn_tpu.config import TacotronConfig
from wavernn_tpu.models import tacotron as taco

SMALL = TacotronConfig(embed_dims=32, encoder_dims=128, decoder_dims=256,
                       postnet_dims=16, encoder_K=4, lstm_dims=48,
                       postnet_K=3, num_highways=2)
N_MELS = 80


def test_generate_parity_vs_reference(reference_modules, rng):
    import torch
    from wavernn_tpu.compat.torch_import import import_tacotron
    tts = SMALL
    torch.manual_seed(3)
    tm = reference_modules.tacotron.Tacotron(
        embed_dims=tts.embed_dims, num_chars=148,
        encoder_dims=tts.encoder_dims, decoder_dims=tts.decoder_dims,
        n_mels=N_MELS, fft_bins=N_MELS, postnet_dims=tts.postnet_dims,
        encoder_K=tts.encoder_K, lstm_dims=tts.lstm_dims,
        postnet_K=tts.postnet_K, num_highways=tts.num_highways,
        dropout=tts.dropout, stop_threshold=tts.stop_threshold)
    tm.r = 2
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_tacotron(sd, tts)

    x = rng.randint(1, 148, (9,))
    # reference generate() calls self.train() at the end but runs eval'd
    ref_mel, ref_lin, ref_attn = tm.generate(x.tolist(), steps=30)

    mel, lin, attn = taco.generate(params, x, tts, r=2, n_mels=N_MELS,
                                   steps=30)
    # both stop at the same decode step (or exhaust the budget together)
    assert mel.shape == ref_mel.shape, (mel.shape, ref_mel.shape)
    np.testing.assert_allclose(mel, ref_mel, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(lin, ref_lin, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(attn, ref_attn, atol=1e-4)
