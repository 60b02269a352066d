"""Spectrogram pipeline: STFT -> mel -> dB -> normalize.

Re-implements the reference analysis chain (utils/dsp.py:41-81, librosa
0.6.3 semantics) natively:

  * STFT: hann (periodic) window of ``win_length`` zero-padded centered to
    ``n_fft``; signal reflect-padded by ``n_fft//2``; rfft per frame.
  * mel filterbank: Slaney scale, Slaney area normalization (librosa
    ``htk=False, norm=1`` defaults), ``fmin``..``sr/2``.
  * amp_to_db: ``20*log10(max(1e-5, x))``; normalize to [0,1] against
    ``min_level_db=-100`` after subtracting ``ref_level_db`` — NOTE: the
    reference subtracts ref_level_db only in the *linear* spectrogram path
    (dsp.py:68), not the mel path (dsp.py:74); we match that exactly.

Host-side numpy implementations plus jit-able batched jnp versions for
on-device feature extraction (the TPU path used by copy-synthesis and the
data pipeline when running at scale).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DSPConfig


# --------------------------------------------------------------------------
# window + filterbank construction (numpy, cached)
# --------------------------------------------------------------------------

def hann_window(win_length: int) -> np.ndarray:
    """Periodic (fftbins=True) hann window, scipy/librosa convention."""
    n = np.arange(win_length)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    above = m >= min_log_mel
    f = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


@lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: float | None = None) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1+n_fft//2).

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin) bit-for-bit.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float64)


@lru_cache(maxsize=8)
def _padded_window(win_length: int, n_fft: int) -> np.ndarray:
    w = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    return w


# --------------------------------------------------------------------------
# numpy reference path (host / preprocess)
# --------------------------------------------------------------------------

def stft_np(y: np.ndarray, n_fft: int, hop_length: int, win_length: int,
            center: bool = True) -> np.ndarray:
    """Complex STFT, shape (1+n_fft//2, n_frames). librosa.stft semantics."""
    y = np.asarray(y, dtype=np.float64)
    if center:
        y = np.pad(y, n_fft // 2, mode="reflect")
    window = _padded_window(win_length, n_fft)
    n_frames = 1 + (len(y) - n_fft) // hop_length
    strides = (y.strides[0] * hop_length, y.strides[0])
    frames = np.lib.stride_tricks.as_strided(y, (n_frames, n_fft), strides)
    return np.fft.rfft(frames * window, axis=-1).T


def istft_np(D: np.ndarray, hop_length: int, win_length: int, n_fft: int,
             length: int | None = None) -> np.ndarray:
    """Inverse STFT with window-sum-square normalization."""
    window = _padded_window(win_length, n_fft)
    frames = np.fft.irfft(D.T, n=n_fft, axis=-1) * window
    n_frames = frames.shape[0]
    total = n_fft + hop_length * (n_frames - 1)
    y = np.zeros(total)
    wss = np.zeros(total)
    w2 = window ** 2
    for i in range(n_frames):
        s = i * hop_length
        y[s: s + n_fft] += frames[i]
        wss[s: s + n_fft] += w2
    y = y / np.maximum(wss, 1e-10)
    y = y[n_fft // 2: total - n_fft // 2]
    if length is not None:
        y = y[:length]
    return y


def amp_to_db(x):
    return 20.0 * np.log10(np.maximum(1e-5, x))


def db_to_amp(x):
    return np.power(10.0, x * 0.05)


def normalize(S, min_level_db: float = -100.0):
    return np.clip((S - min_level_db) / -min_level_db, 0, 1)


def denormalize(S, min_level_db: float = -100.0):
    return (np.clip(S, 0, 1) * -min_level_db) + min_level_db


def melspectrogram_np(y: np.ndarray, cfg: DSPConfig) -> np.ndarray:
    """Normalized mel spectrogram in [0,1], shape (num_mels, T) (dsp.py:72)."""
    D = stft_np(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin)
    S = amp_to_db(basis @ np.abs(D))
    return normalize(S, cfg.min_level_db).astype(np.float32)


def spectrogram_np(y: np.ndarray, cfg: DSPConfig) -> np.ndarray:
    """Normalized linear spectrogram (dsp.py:66)."""
    D = stft_np(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    S = amp_to_db(np.abs(D)) - cfg.ref_level_db
    return normalize(S, cfg.min_level_db).astype(np.float32)


# --------------------------------------------------------------------------
# JAX path (on-device, batched, jit-able)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft_jax(y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int):
    """Batched complex STFT: (..., T) -> (..., 1+n_fft//2, n_frames).

    Frame extraction is a gather over a static index grid -> XLA fuses it;
    the rfft runs on-device.
    """
    window = jnp.asarray(_padded_window(win_length, n_fft), dtype=y.dtype)
    pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    y = jnp.pad(y, pad, mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :])
    frames = y[..., idx] * window
    return jnp.swapaxes(jnp.fft.rfft(frames, axis=-1), -1, -2)


@partial(jax.jit, static_argnames=("cfg",))
def melspectrogram_jax(y: jnp.ndarray, cfg: DSPConfig) -> jnp.ndarray:
    """Batched normalized mel spectrogram: (..., T) -> (..., num_mels, frames)."""
    D = stft_jax(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    basis = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin),
        dtype=y.dtype)
    mag = jnp.abs(D)
    S = jnp.einsum("mf,...ft->...mt", basis, mag)
    S_db = 20.0 * jnp.log10(jnp.maximum(1e-5, S))
    return jnp.clip((S_db - cfg.min_level_db) / -cfg.min_level_db, 0.0, 1.0)
