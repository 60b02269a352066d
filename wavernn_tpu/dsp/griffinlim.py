"""Griffin-Lim fallback vocoder (reference utils/dsp.py:105-116), TPU-native.

The reference calls librosa's mel_to_stft (NNLS) + griffinlim on the host.
Here the entire inversion runs as a jit-ted JAX program: a projected-gradient
NNLS solve for mel -> linear magnitude, then Griffin-Lim phase recovery with
lax.fori_loop over STFT/ISTFT round trips — all on-device, batched-capable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DSPConfig
from .mel import _padded_window, mel_filterbank, stft_jax, denormalize, db_to_amp


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length"))
def istft_jax(D: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
              length: int | None = None) -> jnp.ndarray:
    """Inverse STFT (window-sum-square normalized). (F, T) -> (samples,)."""
    window = jnp.asarray(_padded_window(win_length, n_fft))
    frames = jnp.fft.irfft(jnp.swapaxes(D, -1, -2), n=n_fft, axis=-1) * window
    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]).reshape(-1)
    y = jnp.zeros(frames.shape[:-2] + (total,), dtype=frames.dtype)
    y = y.at[..., idx].add(frames.reshape(frames.shape[:-2] + (-1,)))
    wss = jnp.zeros((total,), dtype=frames.dtype)
    wss = wss.at[idx].add(jnp.tile(window ** 2, n_frames))
    y = y / jnp.maximum(wss, 1e-10)
    y = y[..., n_fft // 2: total - n_fft // 2]
    if length is not None:
        y = y[..., :length]
    return y


@partial(jax.jit, static_argnames=("cfg", "n_iter"))
def mel_to_stft_jax(amp_mel: jnp.ndarray, cfg: DSPConfig, n_iter: int = 200):
    """Invert the mel filterbank by NNLS (multiplicative updates).

    amp_mel: (num_mels, T) linear-amplitude mel. Returns (fft_bins, T) >= 0.
    """
    B = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels,
                                   cfg.fmin), dtype=amp_mel.dtype)
    # init: scaled transpose projection
    X = jnp.maximum(B.T @ amp_mel, 1e-10)

    def body(_, X):
        # multiplicative update for ||B X - M||^2 s.t. X >= 0
        num = B.T @ amp_mel
        den = B.T @ (B @ X)
        return jnp.maximum(X * num / jnp.maximum(den, 1e-10), 0.0)

    return jax.lax.fori_loop(0, n_iter, body, X)


@partial(jax.jit, static_argnames=("cfg", "n_iter", "length"))
def griffinlim_jax(S: jnp.ndarray, cfg: DSPConfig, n_iter: int = 32,
                   length: int | None = None, momentum: float = 0.99,
                   seed: int = 0):
    """Griffin-Lim with momentum (librosa.griffinlim semantics).

    S: (fft_bins, T) magnitude. Returns waveform (samples,).
    """
    key = jax.random.PRNGKey(seed)
    angles = jnp.exp(2j * jnp.pi * jax.random.uniform(key, S.shape))
    S = S.astype(jnp.float32)

    def body(_, carry):
        angles, tprev = carry
        inv = istft_jax(S * angles, cfg.n_fft, cfg.hop_length, cfg.win_length)
        rebuilt = stft_jax(inv, cfg.n_fft, cfg.hop_length, cfg.win_length)
        rebuilt = rebuilt[..., : S.shape[-1]]
        t = rebuilt - (momentum / (1 + momentum)) * tprev
        angles = t / jnp.maximum(jnp.abs(t), 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, jnp.zeros_like(angles)))
    return istft_jax(S * angles, cfg.n_fft, cfg.hop_length, cfg.win_length,
                     length=length)


def reconstruct_waveform(mel: np.ndarray, cfg: DSPConfig, n_iter: int = 32) -> np.ndarray:
    """Normalized mel [0,1] -> waveform via NNLS + Griffin-Lim (dsp.py:105)."""
    amp = db_to_amp(denormalize(np.asarray(mel), cfg.min_level_db))
    S = mel_to_stft_jax(jnp.asarray(amp, dtype=jnp.float32), cfg)
    wav = griffinlim_jax(S, cfg, n_iter=n_iter)
    return np.asarray(wav)
