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


@partial(jax.jit, static_argnames=("voc", "bits", "T", "use_pallas",
                                   "sparse_static", "n_out", "mu_decode"))
def _stream_block_jit(params, window, key, state, noise, voc: WaveRNNConfig,
                      bits: int, T: int, use_pallas: bool,
                      sparse_static=(), sparse_arrays=(), active=None,
                      n_out: int = 0, mu_decode: bool = False,
                      fold_idx=None):
    """One block = ONE compiled program: window upsample -> sample loop
    with state I/O. Running the upsampler eagerly (round-3's first cut)
    dispatched dozens of per-op programs per block, which serialized the
    stream on per-launch overhead (~150 ms/block on a remote executor vs
    ~10 ms of device compute at B=1).

    window: (n_mels, W) for one stream, or (B, n_mels, W) for B concurrent
    streams batched through one launch (state rows follow the same B).
    active: optional (B,) bool — lanes with active=False get their state
    restored to the input state INSIDE this program (multi-stream
    ride-along freeze; separate select dispatches cost ~ms each of launch
    overhead per block through a remote executor).
    n_out > 0: return the samples as a TUPLE of n_out per-stream rows
    instead of one (B, T) array — a multi-stream serving tick then costs
    ONE dispatch total (per-row slicing outside was n_out extra tiny
    programs per block, which host-bound the tick loop). mu_decode applies
    the mu-law expansion in-program (RAW device_out mode)."""
    if fold_idx is not None:  # per-block key derived in-program (no
        key = jax.random.fold_in(key, fold_idx)  # split dispatch per block)
    w = window if window.ndim == 3 else window[None]
    mels_up, aux, _ = upsample_apply(params["upsample"], w, voc,
                                     training=False)
    if use_pallas:
        from .ops.pallas_gen import generate_pallas_with_state
        samples, new_state = generate_pallas_with_state(
            params, mels_up, aux, voc, bits, key, noise=noise,
            init_state=state, state_snapshot_at=T,
            sparse_static=sparse_static, sparse_arrays=sparse_arrays)
    else:
        from .ops.sample_loop import generate_scan_with_state
        samples, new_state = generate_scan_with_state(
            params, mels_up, aux, voc, bits, key, noise=noise,
            init_state=state)
    if active is not None and state is not None:
        new_state = tuple(
            jnp.where(active.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)
            for n, o in zip(new_state, state))
    if mu_decode:
        mu = voc.n_classes(bits) - 1
        samples = jnp.sign(samples) / mu * ((1 + mu) ** jnp.abs(samples) - 1)
    if n_out:
        return tuple(samples[b] for b in range(n_out)), new_state
    return samples, new_state


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
                 device_out: bool = False, sparse_packed=None):
        self.params = params
        self.voc = voc
        self.dsp = dsp
        self.key = key
        self.chunk_frames = chunk_frames
        self.mu_law = mu_law and voc.mode == "RAW"
        self._sparse = sparse_packed or ((), ())
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
            dsp.bits, T, self._pallas, sparse_static=self._sparse[0],
            sparse_arrays=self._sparse[1])
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


class MultiStreamVocoder:
    """B concurrent streams through ONE state-I/O kernel launch per block.

    The sample kernel's step cost is nearly flat in batch (the persistent-
    weights loop is serial-latency bound, SCALING saturation curve), so
    batching B live sessions into one (B, ·) launch multiplies aggregate
    real-time factor by ~B at almost unchanged per-block latency — the
    serving win a per-session `StreamingVocoder` (B=1 state,
    streaming.py:62) leaves on the table.  The reference has no streaming
    at all (its only serving claim is "realtime+" batched generation,
    hparams.py:58); this is SURVEY §5 long-context/serving done TPU-first.

    Streams progress INDEPENDENTLY: each has its own mel buffer; a block
    runs whenever at least one stream has a full window. Streams without a
    full window ride along with zero conditioning and have their RNN state
    restored afterwards (one `jnp.where` on the (B, R) state rows), so
    lagging sessions never corrupt, and never block, the rest. With
    injected `noise`, a stream's audio is bit-identical to running it
    alone at the same block boundaries (each stream consumes its own
    noise column at its own position — tests/test_streaming.py lane
    isolation). In production PRNG mode (noise=None) the per-block seed is
    the base key folded with a global block counter, so a stream's draws
    — though key-deterministic for a given overall schedule — do depend
    on how many blocks the whole session group has run.

        msv = MultiStreamVocoder(params, voc, dsp, key, n_streams=8)
        ready = msv.feed(b, mel_chunk)      # {stream: samples} newly ready
        ready = msv.flush(b)                # finish b; dict incl. its tail

    noise: optional per-stream injected sampling noise for deterministic
    replay — MOL: (u_mix (T, B, nr_mix), u_s (T, B)); RAW: (T, B,
    n_classes). Each stream consumes ITS column at its own sample position,
    so replay matches a solo stream with the same noise column regardless
    of relative progress. Without it, the kernel's on-core PRNG gives each
    lane an independent draw (production).

    device_out=True: results are lists of device arrays (one per block)
    instead of host ndarrays — lets a serving loop overlap compute with
    delivery (see StreamingVocoder.device_out).
    """

    def __init__(self, params, voc: WaveRNNConfig, dsp: DSPConfig, key,
                 n_streams: int, chunk_frames: int = 24, mu_law: bool = True,
                 use_pallas: Optional[bool] = None, noise=None,
                 device_out: bool = False, sparse_packed=None, mesh=None):
        from .utils.backend import use_pallas_default
        self.params = params
        self.voc = voc
        self.dsp = dsp
        self.key = key
        self.n_streams = n_streams
        self.chunk_frames = chunk_frames
        self.mu_law = mu_law and voc.mode == "RAW"
        self._sparse = sparse_packed or ((), ())
        T_block = chunk_frames * dsp.hop_length
        snapshot_ok = T_block % 128 != 0
        if use_pallas and not snapshot_ok:
            raise ValueError(
                f"chunk_frames={chunk_frames} gives a block of {T_block} "
                f"samples, a multiple of the kernel chunk (128) — no state-"
                f"snapshot headroom; pick another chunk_frames")
        # mesh: lay the stream lanes out on the mesh's ``data`` axis — each
        # block's batched launch runs SPMD with state rows and conditioning
        # windows sharded per device.  The state-I/O kernel is a
        # single-chip program GSPMD cannot partition, so a mesh forces the
        # scan block (pure jnp, partitioned automatically); multi-chip
        # streaming throughput comes from lane parallelism, not the kernel.
        self._mesh = mesh
        self._shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if use_pallas:
                raise ValueError("use_pallas is single-chip; a meshed "
                                 "MultiStreamVocoder runs the scan block")
            if n_streams % mesh.shape["data"] != 0:
                # device_put of the (n_streams, R) state requires the
                # sharded axis to divide the data axis — fail with intent
                # instead of a sharding error deep in construction
                raise ValueError(
                    f"n_streams={n_streams} must be a multiple of the "
                    f"mesh data axis ({mesh.shape['data']}); round up and "
                    f"leave the extra lanes unused (they ride state-frozen)")
            use_pallas = False
            self._shard = NamedSharding(mesh, P("data"))
        self._pallas = use_pallas_default(use_pallas) and snapshot_ok
        self._device_out = device_out
        self._noise = noise
        R = voc.rnn_dims
        self._state = (jnp.zeros((n_streams, R), jnp.float32),
                       jnp.zeros((n_streams, R), jnp.float32),
                       jnp.zeros((n_streams,), jnp.float32))
        if self._shard is not None:
            self._state = tuple(jax.device_put(s, self._shard)
                                for s in self._state)
        # per-stream mel ring: starts with the offline path's left padding
        self._bufs = [np.zeros((dsp.num_mels, voc.pad), np.float32)
                      for _ in range(n_streams)]
        self._blocks = 0                   # per-block PRNG fold counter
        self._noise_at = [0] * n_streams   # per-stream sample position
        self._done = [False] * n_streams
        self._flushed = [False] * n_streams  # tail block already emitted

    # ------------------------------------------------------------------

    def _window_len(self):
        return self.chunk_frames + 2 * self.voc.pad

    def _block_noise(self, active, T):
        """Assemble (T, B, ·) replay noise from per-stream positions;
        inactive lanes get the neutral 0.5 pad."""
        if self._noise is None:
            # no split dispatch per block: the base key rides into the
            # block program and is folded with the block counter there
            return self.key, None

        def take(u, b):
            s = self._noise_at[b]
            col = u[s:s + T, b]
            if col.shape[0] < T:
                pad = [(0, T - col.shape[0])] + [(0, 0)] * (col.ndim - 1)
                col = jnp.pad(col, pad, constant_values=0.5)
            return col if active[b] else jnp.full_like(col, 0.5)

        def stack(u):
            return jnp.stack([take(u, b) for b in range(self.n_streams)],
                             axis=1)

        if self.voc.mode == "MOL":
            u_mix, u_s = self._noise
            block = (stack(u_mix), stack(u_s))
        else:
            block = stack(self._noise)
        return jax.random.PRNGKey(0), block

    def _run_block(self, windows, active):
        """windows: (B, n_mels, W); active: list of bool. Runs one batched
        block; freezes the state of inactive lanes."""
        voc, dsp = self.voc, self.dsp
        T = self.chunk_frames * dsp.hop_length
        key, noise = self._block_noise(active, T)
        fold_idx = np.int32(self._blocks) if self._noise is None else None
        self._blocks += 1
        win_d = jnp.asarray(windows)
        act_d = jnp.asarray(np.asarray(active))
        if self._shard is not None:
            win_d = jax.device_put(win_d, self._shard)
            act_d = jax.device_put(act_d, self._shard)
        samples, self._state = _stream_block_jit(
            self.params, win_d, key, self._state, noise, voc,
            dsp.bits, T, self._pallas, sparse_static=self._sparse[0],
            sparse_arrays=self._sparse[1],
            active=act_d,
            n_out=self.n_streams if self._device_out else 0,
            mu_decode=self.mu_law and self._device_out,
            fold_idx=fold_idx)
        for b in range(self.n_streams):
            if active[b]:
                self._noise_at[b] += T
        if self.mu_law and not self._device_out:
            # host mode decodes in f64 like StreamingVocoder
            mu = voc.n_classes(dsp.bits) - 1
            s = np.asarray(samples)
            samples = np.sign(s) / mu * ((1 + mu) ** np.abs(s) - 1)
        return samples

    def _drain(self):
        """Run blocks while any stream has a full window; emit per-stream."""
        voc, dsp = self.voc, self.dsp
        W = self._window_len()
        outs: dict = {}
        while True:
            active = [self._bufs[b].shape[1] >= W and not self._flushed[b]
                      for b in range(self.n_streams)]
            if not any(active):
                break
            windows = np.zeros((self.n_streams, dsp.num_mels, W), np.float32)
            for b in range(self.n_streams):
                if active[b]:
                    windows[b] = self._bufs[b][:, :W]
            samples = self._run_block(windows, active)
            for b in range(self.n_streams):
                if not active[b]:
                    continue
                # frames left of the next window start are never read again
                self._bufs[b] = self._bufs[b][:, self.chunk_frames:]
                y = samples[b]
                if not self._device_out:
                    y = np.asarray(y).astype(np.float32)
                outs.setdefault(b, []).append(y)
        if self._device_out:
            return outs
        return {b: np.concatenate(ys) for b, ys in outs.items()}

    # ------------------------------------------------------------------

    def feed(self, stream: int, mel_chunk, drain: bool = True):
        """Append (n_mels, k) frames to ``stream``; run any ready blocks.
        Returns {stream: newly-ready samples} across ALL streams (feeding
        one stream can complete a block that other streams were already
        waiting on).

        drain=False only buffers — a serving loop that receives frames for
        several sessions in one tick should feed them all first and then
        `poll()` once, so ALL ready lanes share each batched block instead
        of the first-ready lane launching a mostly-idle one."""
        assert not self._done[stream], f"stream {stream} already flushed"
        mel_chunk = np.asarray(mel_chunk, np.float32)
        self._bufs[stream] = np.concatenate([self._bufs[stream], mel_chunk],
                                            axis=1)
        return self._drain() if drain else {}

    def poll(self):
        """Run every block that became ready since the last drain (pair
        with feed(..., drain=False))."""
        return self._drain()

    def flush(self, stream: int):
        """Finish ``stream``: right-pad with `pad` zero frames (offline
        symmetric padding) and emit its remaining audio. Returns a
        {stream: samples} dict like `feed` — the internal drain may also
        complete blocks OTHER streams were waiting on (e.g. after
        feed(..., drain=False)), and their audio is delivered here rather
        than dropped."""
        assert not self._done[stream], f"stream {stream} already flushed"
        self._done[stream] = True
        voc, dsp = self.voc, self.dsp
        self._bufs[stream] = np.concatenate(
            [self._bufs[stream], np.zeros((dsp.num_mels, voc.pad),
                                          np.float32)], axis=1)
        outs = self._drain()
        out = outs.get(stream)
        parts = ([] if out is None else
                 (out if self._device_out else [out]))
        # final short block: zero-pad to the full window, trim the emission
        rem = self._bufs[stream].shape[1] - 2 * voc.pad
        if rem > 0:
            W = self._window_len()
            windows = np.zeros((self.n_streams, dsp.num_mels, W), np.float32)
            w = self._bufs[stream]
            windows[stream, :, :w.shape[1]] = w
            active = [False] * self.n_streams
            active[stream] = True
            samples = self._run_block(windows, active)
            tail = samples[stream][: rem * dsp.hop_length]
            parts.append(tail if self._device_out
                         else np.asarray(tail).astype(np.float32))
        self._flushed[stream] = True
        self._bufs[stream] = self._bufs[stream][:, :0]
        if self._device_out:
            outs[stream] = parts
        else:
            outs[stream] = (np.concatenate(parts) if parts
                            else np.zeros((0,), np.float32))
        return outs

    def reset(self, stream: int):
        """Recycle a lane for a new session (after — or instead of — its
        flush): zero its RNN-state rows, re-init its mel ring to the
        offline left padding, and clear its done/flushed/noise bookkeeping.
        A long-lived serving loop reuses the instance (and its warmed-up
        compiled block program) across sessions instead of rebuilding the
        whole vocoder once every lane has ended once. Other lanes are
        untouched — resetting one session never perturbs live neighbours."""
        self._state = tuple(s.at[stream].set(0.0) for s in self._state)
        self._bufs[stream] = np.zeros(
            (self.dsp.num_mels, self.voc.pad), np.float32)
        self._noise_at[stream] = 0
        self._done[stream] = False
        self._flushed[stream] = False
