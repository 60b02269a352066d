"""Streaming vocoder == offline unbatched generation, bit-for-bit.

The StreamingVocoder hands the exact RNN state across blocks and computes
each block's conditioning from a +-pad-frame window, so under the same
injected sampling noise the streamed waveform must equal one offline
whole-utterance sample-loop run exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.config import DSPConfig, WaveRNNConfig
from wavernn_tpu.models import wavernn as wr
from wavernn_tpu.models.wavernn import upsample_apply
from wavernn_tpu.ops.sample_loop import generate_scan
from wavernn_tpu.streaming import StreamingVocoder

DSP = DSPConfig()


def _cfg(mode):
    return WaveRNNConfig(mode=mode, rnn_dims=32, fc_dims=32, compute_dims=16,
                         res_out_dims=16, res_blocks=1, pad=2,
                         upsample_factors=(5, 5, 11))


def _offline(params, mels, voc, noise):
    """Unbatched offline reference: pad, upsample, one sample-loop run."""
    m = jnp.pad(jnp.asarray(mels)[None], ((0, 0), (0, 0), (voc.pad, voc.pad)))
    mels_up, aux, _ = upsample_apply(params["upsample"], m, voc,
                                     training=False)
    samples = generate_scan(params, mels_up, aux, voc, DSP.bits,
                            jax.random.PRNGKey(0), noise=noise)
    return np.asarray(samples[0])


def _noise(rng, voc, T):
    if voc.mode == "MOL":
        nr_mix = voc.n_classes(DSP.bits) // 3
        return (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, 1, nr_mix))
                            .astype(np.float32)),
                jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, 1))
                            .astype(np.float32)))
    n_classes = voc.n_classes(DSP.bits)
    return jnp.asarray(rng.uniform(1e-9, 1.0, (T, 1, n_classes))
                       .astype(np.float32))


@pytest.mark.parametrize("mode", ["MOL", "RAW"])
def test_streaming_matches_offline(mode, rng):
    voc = _cfg(mode)
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    frames = 23  # not a multiple of chunk_frames: exercises the flush tail
    mels = rng.uniform(0.2, 0.8, (DSP.num_mels, frames)).astype(np.float32)
    T = frames * DSP.hop_length
    noise = _noise(rng, voc, T)

    want = _offline(params, mels, voc, noise)
    if mode == "RAW":  # offline helper skips mu-law; compare raw samples
        sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                              chunk_frames=7, mu_law=False, noise=noise)
    else:
        sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                              chunk_frames=7, noise=noise)
    # irregular push sizes: 1, 9, 4, then the rest
    got = [sv.feed(mels[:, :1]), sv.feed(mels[:, 1:10]),
           sv.feed(mels[:, 10:14]), sv.feed(mels[:, 14:])]
    got.append(sv.flush())
    got = np.concatenate(got)

    assert got.shape == want.shape == (T,)
    np.testing.assert_array_equal(got, want)


def test_streaming_latency_accounting(rng):
    """Audio becomes available as soon as chunk_frames + pad frames beyond
    the emitted point exist — the documented lookahead."""
    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                          chunk_frames=4)
    # 4 + pad(2) - pad(left ctx already buffered) -> needs 6 fed frames
    assert sv.feed(rng.uniform(0, 1, (DSP.num_mels, 5))).size == 0
    out = sv.feed(rng.uniform(0, 1, (DSP.num_mels, 1)))
    assert out.size == 4 * DSP.hop_length


def test_streaming_mu_law_decode(rng):
    """RAW mode decodes mu-law on emit (feedback stays in the encoded
    domain, matching the offline path's post-loop decode)."""
    voc = _cfg("RAW")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    frames = 14
    mels = rng.uniform(0.2, 0.8, (DSP.num_mels, frames)).astype(np.float32)
    T = frames * DSP.hop_length
    noise = _noise(rng, voc, T)
    raw = _offline(params, mels, voc, noise)
    mu = voc.n_classes(DSP.bits) - 1
    want = np.sign(raw) / mu * ((1 + mu) ** np.abs(raw) - 1)

    sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                          chunk_frames=7, noise=noise)
    got = np.concatenate([sv.feed(mels), sv.flush()])
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-7)


def test_streaming_buffer_stays_bounded(rng):
    """Consumed frames are dropped from the mel buffer after each drain —
    an hours-long live stream must hold only the pad-frame left context
    plus pending frames, not the whole history."""
    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                          chunk_frames=4)
    bound = 4 + 2 * voc.pad + 3  # one window + the largest feed remainder
    for i in range(12):
        sv.feed(rng.uniform(0, 1, (DSP.num_mels, 3)))
        assert sv._buf.shape[1] <= bound, (i, sv._buf.shape)
    assert sv.flush().size > 0


def test_streaming_device_out_matches_host(rng):
    """device_out returns per-block device arrays whose concatenation is
    bit-identical to the host-mode stream (same noise)."""
    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    frames = 23
    mels = rng.uniform(0.2, 0.8, (DSP.num_mels, frames)).astype(np.float32)
    T = frames * DSP.hop_length
    noise = _noise(rng, voc, T)

    sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                          chunk_frames=7, noise=noise)
    want = np.concatenate([sv.feed(mels), sv.flush()])

    sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                          chunk_frames=7, noise=noise, device_out=True)
    blocks = sv.feed(mels)
    assert isinstance(blocks, list)
    blocks += sv.flush()
    got = np.concatenate([np.asarray(b) for b in blocks])
    assert got.shape == want.shape == (T,)
    np.testing.assert_array_equal(got, want)


def _noise_b(rng, voc, T, B):
    if voc.mode == "MOL":
        nr_mix = voc.n_classes(DSP.bits) // 3
        return (jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B, nr_mix))
                            .astype(np.float32)),
                jnp.asarray(rng.uniform(1e-5, 1 - 1e-5, (T, B))
                            .astype(np.float32)))
    n_classes = voc.n_classes(DSP.bits)
    return jnp.asarray(rng.uniform(1e-9, 1.0, (T, B, n_classes))
                       .astype(np.float32))


def _noise_col(noise, b):
    if isinstance(noise, tuple):
        return tuple(u[:, b:b + 1] for u in noise)
    return noise[:, b:b + 1]


@pytest.mark.parametrize("mode", ["MOL", "RAW"])
def test_multistream_single_matches_streaming(mode, rng):
    """MultiStreamVocoder at n_streams=1 is bit-identical to the solo
    StreamingVocoder (same shapes -> same programs)."""
    from wavernn_tpu.streaming import MultiStreamVocoder

    voc = _cfg(mode)
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    frames = 23
    mels = rng.uniform(0.2, 0.8, (DSP.num_mels, frames)).astype(np.float32)
    noise = _noise_b(rng, voc, frames * DSP.hop_length, 1)

    sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                          chunk_frames=7, mu_law=(mode == "RAW"),
                          noise=_noise_col(noise, 0))
    want = np.concatenate([sv.feed(mels), sv.flush()])

    msv = MultiStreamVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                             n_streams=1, chunk_frames=7, noise=noise)
    parts = [y for _, y in sorted(msv.feed(0, mels).items())]
    parts.append(msv.flush(0)[0])
    got = np.concatenate(parts)
    assert got.shape == want.shape == (frames * DSP.hop_length,)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", ["MOL", "RAW"])
def test_multistream_lane_isolation(mode, rng):
    """A stream's audio must be invariant to WHAT the other lanes carry and
    WHEN they carry it: ride-along lanes (zero conditioning + state
    restore) and active neighbours must not leak. Exact check: same stream
    content/schedule, two different neighbour scenarios, identical output.

    (Bit-parity vs a solo B=1 run is NOT the contract: XLA tiles convs and
    matmuls differently per batch size, and the autoregressive sampler
    amplifies those ulp differences into occasional different — equally
    correct — sample picks.)"""
    from wavernn_tpu.streaming import MultiStreamVocoder

    voc = _cfg(mode)
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    B = 3
    frames = [23, 16, 30]
    mels = [rng.uniform(0.2, 0.8, (DSP.num_mels, f)).astype(np.float32)
            for f in frames]
    T_max = max(frames) * DSP.hop_length
    noise = _noise_b(rng, voc, T_max, B)

    def run(other_mels, schedule):
        msv = MultiStreamVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                                 n_streams=B, chunk_frames=7, noise=noise)
        got = [[] for _ in range(B)]
        for b, lo, hi in schedule:
            src = mels[0] if b == 0 else other_mels[b]
            if hi > lo:
                for sb, y in msv.feed(b, src[:, lo:hi]).items():
                    got[sb].append(y)
        for b in range(B):
            for sb, y in msv.flush(b).items():
                got[sb].append(y)
        return [np.concatenate(g) for g in got]

    # scenario A: stream 0 split 10+13, neighbours as generated, lagging
    a = run(mels, [(0, 0, 10), (2, 0, 30), (0, 10, 23), (1, 0, 5),
                   (1, 5, 16)])
    # scenario B: same stream-0 schedule; neighbours carry DIFFERENT audio
    # on a DIFFERENT schedule
    other = [None,
             rng.uniform(0.0, 1.0, (DSP.num_mels, 16)).astype(np.float32),
             rng.uniform(0.0, 1.0, (DSP.num_mels, 30)).astype(np.float32)]
    b_ = run(other, [(1, 0, 16), (0, 0, 10), (0, 10, 23), (2, 0, 14),
                     (2, 14, 30)])
    assert a[0].shape == (frames[0] * DSP.hop_length,)
    np.testing.assert_array_equal(a[0], b_[0])


def test_multistream_device_out(rng):
    """device_out returns per-block device arrays per stream."""
    from wavernn_tpu.streaming import MultiStreamVocoder

    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    B, frames = 2, 16
    mels = [rng.uniform(0.2, 0.8, (DSP.num_mels, frames)).astype(np.float32)
            for _ in range(B)]
    noise = _noise_b(rng, voc, frames * DSP.hop_length, B)

    msv = MultiStreamVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                             n_streams=B, chunk_frames=7, noise=noise)
    want = [[] for _ in range(B)]
    for b in range(B):
        for sb, y in msv.feed(b, mels[b]).items():
            want[sb].append(y)
    for b in range(B):
        for sb, y in msv.flush(b).items():
            want[sb].append(y)

    msv = MultiStreamVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                             n_streams=B, chunk_frames=7, noise=noise,
                             device_out=True)
    got = [[] for _ in range(B)]
    for b in range(B):
        for sb, ys in msv.feed(b, mels[b]).items():
            got[sb] += ys
    for b in range(B):
        for sb, ys in msv.flush(b).items():
            got[sb] += ys
    for b in range(B):
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(y) for y in got[b]]),
            np.concatenate(want[b]))


def test_multistream_flush_delivers_other_streams_pending_audio(rng):
    """Regression: flush(b) internally drains ALL ready lanes (a
    feed(..., drain=False) may have left other streams with full
    windows) — their audio must be delivered in the returned dict, not
    dropped."""
    from wavernn_tpu.streaming import MultiStreamVocoder

    voc = _cfg("MOL")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    frames = 21  # three full 7-frame blocks
    mels = [rng.uniform(0.2, 0.8, (DSP.num_mels, frames)).astype(np.float32)
            for _ in range(2)]
    noise = _noise_b(rng, voc, frames * DSP.hop_length, 2)

    msv = MultiStreamVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                             n_streams=2, chunk_frames=7, noise=noise)
    msv.feed(0, mels[0], drain=False)  # stream 0: ready blocks, undrained
    out = msv.flush(1)                 # flushing the OTHER stream
    # stream 0 had two complete windows pending -> 14 frames of its audio
    # arrive with the flush instead of being dropped
    assert 0 in out and out[0].size == 14 * DSP.hop_length
    got = np.concatenate([out[0], msv.flush(0)[0]])
    assert got.shape == (frames * DSP.hop_length,)


def test_streaming_device_out_mu_law(rng):
    """RAW + device_out decodes mu-law on device, matching host mode."""
    voc = _cfg("RAW")
    params = wr.init_wavernn(jax.random.PRNGKey(1), voc, DSP)
    frames = 14
    mels = rng.uniform(0.2, 0.8, (DSP.num_mels, frames)).astype(np.float32)
    noise = _noise(rng, voc, frames * DSP.hop_length)

    sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                          chunk_frames=7, noise=noise)
    want = np.concatenate([sv.feed(mels), sv.flush()])
    sv = StreamingVocoder(params, voc, DSP, jax.random.PRNGKey(0),
                          chunk_frames=7, noise=noise, device_out=True)
    got = np.concatenate(
        [np.asarray(b) for b in sv.feed(mels) + sv.flush()])
    np.testing.assert_allclose(got, want, atol=1e-6)
