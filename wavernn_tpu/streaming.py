"""Streaming vocoder synthesis: incremental mel -> waveform with bounded
latency.

The reference generates whole utterances only (fatchord_version.py:169-264).
For live serving (mel frames arriving from an incremental TTS front-end, or
wav streamed to a client as it is synthesized) this wraps the sample loop's
exact state I/O (ops/sample_loop.py `generate_scan_with_state`,
ops/pallas_gen.py `generate_pallas_with_state` — the same machinery that
powers exact-seam sharded generation) into a push API:

    voc = StreamingVocoder(params, cfg.voc, cfg.dsp, key=key)
    for mel_chunk in frontend:          # (n_mels, k) frames, any k
        wav_so_far = voc.feed(mel_chunk)   # float32 samples, may be empty
    tail = voc.flush()

Exactness: the upsampler's receptive field is exactly ±`voc.pad` mel
frames — MelResNet's only wide conv is `conv_in` (kernel 2*pad+1, valid;
fatchord_version.py:37-48) and the stretch-average stack reaches at most
±(1 + 1/s1 + 1/(s1*s2)) < pad frames — so conditioning for frames
[i, i+k) computed from the window [i-pad, i+k+pad) is identical to the
offline whole-utterance computation, and the RNN state handoff is exact.
Streamed output therefore equals unbatched offline generation bit-for-bit
under the same sampling noise (tests/test_streaming.py).

Latency: `pad` frames of lookahead (2 frames = 25 ms at hop 275 /
22.05 kHz) plus one `chunk_frames` block of compute.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from .config import DSPConfig, WaveRNNConfig
from .models.wavernn import upsample_apply


@partial(jax.jit, static_argnames=("voc", "bits", "T", "use_pallas"))
def _stream_block_jit(params, window, key, state, noise, voc: WaveRNNConfig,
                      bits: int, T: int, use_pallas: bool):
    """One block = ONE compiled program: window upsample -> sample loop
    with state I/O. Running the upsampler eagerly (round-3's first cut)
    dispatched dozens of per-op programs per block, which serialized the
    stream on per-launch overhead (~150 ms/block on a remote executor vs
    ~10 ms of device compute at B=1)."""
    mels_up, aux, _ = upsample_apply(params["upsample"], window[None], voc,
                                     training=False)
    if use_pallas:
        from .ops.pallas_gen import generate_pallas_with_state
        return generate_pallas_with_state(
            params, mels_up, aux, voc, bits, key, noise=noise,
            init_state=state, state_snapshot_at=T)
    from .ops.sample_loop import generate_scan_with_state
    return generate_scan_with_state(params, mels_up, aux, voc, bits, key,
                                    noise=noise, init_state=state)


class StreamingVocoder:
    """Incremental WaveRNN synthesis with exact offline parity.

    Internally processes fixed-size blocks of `chunk_frames` mel frames so
    every device launch reuses one compiled program. `feed` buffers frames
    and returns whatever audio became ready; `flush` drains the remainder
    (right-padding the final window with `pad` zero frames, matching the
    offline path's symmetric padding).

    noise: optional pre-drawn sampling noise for deterministic replay —
    MOL: (u_mix (T,1,nr_mix), u_s (T,1)); RAW: (T,1,n_classes) — consumed
    sequentially across blocks. Without it, each block draws fresh noise
    from a per-block fold of `key` (still reproducible, but not equal to a
    single offline draw).

    device_out=True: `feed`/`flush` return a LIST of device float32 arrays
    (one per completed block, possibly empty) instead of one host ndarray,
    and mu-law decoding runs on device. The default host mode blocks on a
    device->host readback per block, serializing the stream on transfer
    round-trips; device mode dispatches block k+1 while block k's audio is
    still in flight (JAX async dispatch), which is what a serving loop
    needs to overlap compute with delivery.
    """

    def __init__(self, params, voc: WaveRNNConfig, dsp: DSPConfig, key,
                 chunk_frames: int = 24, mu_law: bool = True,
                 use_pallas: Optional[bool] = None, noise=None,
                 device_out: bool = False):
        self.params = params
        self.voc = voc
        self.dsp = dsp
        self.key = key
        self.chunk_frames = chunk_frames
        self.mu_law = mu_law and voc.mode == "RAW"
        from .utils.backend import use_pallas_default
        T_block = chunk_frames * dsp.hop_length
        # the pallas state snapshot needs one step of padding headroom
        # (snapshot records the state *entering* step T)
        snapshot_ok = T_block % 128 != 0
        if use_pallas and not snapshot_ok:
            raise ValueError(
                f"chunk_frames={chunk_frames} gives a block of {T_block} "
                f"samples, a multiple of the kernel chunk (128), which "
                f"leaves no padding headroom for the state snapshot — "
                f"pick a chunk_frames whose block is not a multiple of "
                f"128, or pass use_pallas=None/False")
        self._pallas = use_pallas_default(use_pallas) and snapshot_ok
        self._device_out = device_out
        self._noise = noise
        self._noise_at = 0
        # mel buffer starts with the offline path's left padding
        self._buf = np.zeros((dsp.num_mels, voc.pad), np.float32)
        self._emitted = 0  # frames whose audio has been produced
        self._state = None  # (h1, h2, x) after the last emitted sample
        self._block = 0
        self._done = False

    # ------------------------------------------------------------------

    def _take_noise(self, T):
        if self._noise is None:
            self.key, k = jax.random.split(self.key)
            return k, None
        s = self._noise_at
        self._noise_at += T

        def pad_T(u):  # final flush block: steps beyond the supplied
            u = u[s:s + T]  # noise are trimmed away, pad with neutral 0.5
            if u.shape[0] < T:
                pad = [(0, T - u.shape[0])] + [(0, 0)] * (u.ndim - 1)
                u = jnp.pad(u, pad, constant_values=0.5)
            return u

        if self.voc.mode == "MOL":
            u_mix, u_s = self._noise
            block = (pad_T(u_mix), pad_T(u_s))
        else:
            block = pad_T(self._noise)
        return jax.random.PRNGKey(0), block

    def _run_block(self, window):
        """window: (n_mels, chunk_frames + 2*pad) -> samples for the middle
        chunk_frames frames, advancing the RNN state."""
        voc, dsp = self.voc, self.dsp
        T = self.chunk_frames * dsp.hop_length
        key, noise = self._take_noise(T)
        if self._state is None:
            R = voc.rnn_dims
            self._state = (jnp.zeros((1, R), jnp.float32),
                           jnp.zeros((1, R), jnp.float32),
                           jnp.zeros((1,), jnp.float32))
        samples, self._state = _stream_block_jit(
            self.params, jnp.asarray(window), key, self._state, noise, voc,
            dsp.bits, T, self._pallas)
        self._block += 1
        if self._device_out:
            out = samples[0]
            if self.mu_law:
                mu = voc.n_classes(dsp.bits) - 1
                out = jnp.sign(out) / mu * ((1 + mu) ** jnp.abs(out) - 1)
            return out
        out = np.asarray(samples[0])
        if self.mu_law:
            mu = voc.n_classes(dsp.bits) - 1
            out = np.sign(out) / mu * ((1 + mu) ** np.abs(out) - 1)
        return out.astype(np.float32)

    def _drain(self):
        """Emit every complete block available in the buffer."""
        voc = self.voc
        outs = []
        # buffered frames not yet emitted, beyond the left context
        while (self._buf.shape[1] - voc.pad - self._emitted
               >= self.chunk_frames + voc.pad):
            # window = [emitted, emitted + chunk + 2*pad) in padded coords
            w = self._buf[:, self._emitted:
                          self._emitted + self.chunk_frames + 2 * voc.pad]
            outs.append(self._run_block(w))
            self._emitted += self.chunk_frames
        if self._emitted:
            # frames left of the next window's start are never read again;
            # drop them so a long-lived stream holds only the pad-frame
            # left context plus pending frames (bounded, not O(stream))
            self._buf = self._buf[:, self._emitted:]
            self._emitted = 0
        if self._device_out:
            return outs
        if outs:
            return np.concatenate(outs)
        return np.zeros((0,), np.float32)

    # ------------------------------------------------------------------

    def feed(self, mel_chunk):
        """Append (n_mels, k) mel frames; return newly-ready samples
        (host ndarray, or a list of device arrays with device_out)."""
        assert not self._done, "flush() already called"
        mel_chunk = np.asarray(mel_chunk, np.float32)
        self._buf = np.concatenate([self._buf, mel_chunk], axis=1)
        return self._drain()

    def flush(self):
        """Right-pad with `pad` zero frames (offline symmetric padding) and
        emit the remaining audio (the final short block is zero-padded up
        to chunk_frames and trimmed, so the compiled shape is reused).
        Returns a host ndarray, or a list of device arrays with
        device_out."""
        assert not self._done, "flush() already called"
        self._done = True
        voc = self.voc
        self._buf = np.concatenate(
            [self._buf, np.zeros((self.dsp.num_mels, voc.pad), np.float32)],
            axis=1)
        out = self._drain()
        rem = self._buf.shape[1] - voc.pad - self._emitted - voc.pad
        if rem > 0:
            w = self._buf[:, self._emitted:]
            need = self.chunk_frames + 2 * voc.pad - w.shape[1]
            w = np.pad(w, ((0, 0), (0, need)))
            tail = self._run_block(w)[: rem * self.dsp.hop_length]
            if self._device_out:
                out = out + [tail]
            else:
                out = np.concatenate([out, tail])
        return out
