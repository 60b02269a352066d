import numpy as np
import pytest

from wavernn_tpu.config import DSPConfig
from wavernn_tpu import dsp


CFG = DSPConfig()


def test_label_float_roundtrip(rng):
    x = rng.uniform(-1, 1, 1000).astype(np.float32)
    lab = dsp.float_2_label(x, 9)
    back = dsp.label_2_float(lab, 9)
    assert np.abs(back - x).max() < 2.0 / 511 + 1e-6


def test_mu_law_roundtrip(rng):
    x = rng.uniform(-1, 1, 1000)
    y = dsp.encode_mu_law(x, 512)
    assert y.min() >= 0 and y.max() <= 511
    back = dsp.decode_mu_law(y, 512, from_labels=True)
    assert np.abs(back - x).max() < 0.05  # companding quantization error


def test_split_combine_signal():
    x = np.array([-32768, -1, 0, 1, 255, 256, 32767])
    c, f = dsp.split_signal(x)
    assert np.all(dsp.combine_signal(c, f) == x)
    assert f.min() >= 0 and f.max() <= 255 and c.min() >= 0 and c.max() <= 255


def test_quant_parity_vs_reference(reference_modules, rng):
    import importlib
    ref_dsp = importlib.import_module("utils.dsp")
    x = rng.uniform(-1, 1, 500)
    np.testing.assert_allclose(dsp.encode_mu_law(x, 512),
                               ref_dsp.encode_mu_law(x, 512))
    np.testing.assert_allclose(dsp.float_2_label(x, 9),
                               ref_dsp.float_2_label(x, 9))
    lab = dsp.encode_mu_law(x, 512)
    np.testing.assert_allclose(dsp.decode_mu_law(lab, 512, True),
                               ref_dsp.decode_mu_law(lab, 512, True))
    c0, f0 = dsp.split_signal(np.round(x * 32767).astype(np.int64))
    c1, f1 = ref_dsp.split_signal(np.round(x * 32767).astype(np.int64))
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(f0, f1)


def test_stft_matches_torch(rng):
    torch = pytest.importorskip("torch")
    y = rng.randn(CFG.hop_length * 40).astype(np.float64)
    D = dsp.stft_np(y, CFG.n_fft, CFG.hop_length, CFG.win_length)
    w = torch.zeros(CFG.n_fft, dtype=torch.float64)
    lpad = (CFG.n_fft - CFG.win_length) // 2
    w[lpad:lpad + CFG.win_length] = torch.hann_window(
        CFG.win_length, periodic=True, dtype=torch.float64)
    Dt = torch.stft(torch.tensor(y), CFG.n_fft, CFG.hop_length, CFG.n_fft,
                    window=w, center=True, pad_mode="reflect",
                    return_complex=True).numpy()
    assert D.shape == Dt.shape
    np.testing.assert_allclose(np.abs(D), np.abs(Dt), atol=1e-8)


def test_stft_jax_matches_numpy(rng):
    y = rng.randn(CFG.hop_length * 20).astype(np.float32)
    D_np = dsp.stft_np(y, CFG.n_fft, CFG.hop_length, CFG.win_length)
    D_jax = np.asarray(dsp.stft_jax(y, CFG.n_fft, CFG.hop_length, CFG.win_length))
    np.testing.assert_allclose(np.abs(D_jax), np.abs(D_np), atol=2e-2, rtol=1e-3)


def test_melspectrogram_shape_and_range(rng):
    y = rng.uniform(-0.5, 0.5, CFG.hop_length * 30).astype(np.float32)
    m = dsp.melspectrogram_np(y, CFG)
    assert m.shape[0] == CFG.num_mels
    assert m.min() >= 0.0 and m.max() <= 1.0
    m_jax = np.asarray(dsp.melspectrogram_jax(y, CFG))
    assert m_jax.shape == m.shape
    np.testing.assert_allclose(m_jax, m, atol=5e-4)


def test_mel_filterbank_invariants():
    fb = dsp.mel_filterbank(22050, 2048, 80, 40.0)
    assert fb.shape == (80, 1025)
    assert fb.min() >= 0
    # every filter is nonzero and unimodal
    assert (fb.sum(axis=1) > 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()  # center freqs increase
    # Slaney normalization: each filter integrates to ~2/(width in Hz)
    freqs = np.linspace(0, 22050 / 2, 1025)
    df = freqs[1] - freqs[0]
    areas = fb.sum(axis=1) * df
    assert np.all(areas < 2.1) and np.all(areas > 0.5)


def test_istft_roundtrip(rng):
    y = rng.randn(CFG.hop_length * 30)
    D = dsp.stft_np(y, CFG.n_fft, CFG.hop_length, CFG.win_length)
    y2 = dsp.istft_np(D, CFG.hop_length, CFG.win_length, CFG.n_fft, length=len(y))
    np.testing.assert_allclose(y2, y, atol=1e-8)


def test_istft_jax_roundtrip(rng):
    y = rng.randn(CFG.hop_length * 20).astype(np.float32)
    D = dsp.stft_jax(y, CFG.n_fft, CFG.hop_length, CFG.win_length)
    y2 = np.asarray(dsp.istft_jax(D, CFG.n_fft, CFG.hop_length, CFG.win_length,
                                  length=len(y)))
    np.testing.assert_allclose(y2, y, atol=1e-2)


def test_griffinlim_reconstructs_sine():
    t = np.arange(CFG.hop_length * 40) / CFG.sample_rate
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = dsp.melspectrogram_np(y, CFG)
    wav = dsp.reconstruct_waveform(mel, CFG, n_iter=16)
    # spectral peak should still be at 440 Hz
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    freqs = np.fft.rfftfreq(len(wav), 1 / CFG.sample_rate)
    # mel bins near 440 Hz are ~100 Hz wide; NNLS inversion can shift the
    # peak by a fraction of a bin
    assert abs(freqs[spec.argmax()] - 440) < 50


def test_wav_io_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 10000).astype(np.float32)
    p = tmp_path / "test.wav"
    dsp.save_wav(x, p, CFG.sample_rate)
    y = dsp.load_wav(p, CFG.sample_rate)
    np.testing.assert_allclose(y, x, atol=1.0 / 32768 + 1e-6)
