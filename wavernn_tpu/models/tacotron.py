"""Tacotron (text -> mel) — TPU-native functional implementation.

Mirrors the reference architecture (models/tacotron.py:289-519):
  Encoder: embedding -> PreNet -> CBHG(K=16, conv bank + maxpool + conv
  projections + residual + highways + BiGRU).
  Decoder (per r-frame group): PreNet -> attention GRUCell -> LSA
  location-sensitive *smooth* attention (sigmoid-normalized scores,
  tacotron.py:200) -> context -> rnn_input -> 2x zoneout LSTMCells with
  residual -> mel_proj sliced to r frames.
  Postnet: CBHG(K=8) -> post_proj ("linear" head — fed num_mels bins by
  every reference caller, train_tacotron.py:59-60).

The reference's Python decoder loop (tacotron.py:381-418) is a lax.scan
with the (cumulative, attention) LSA state and LSTM/GRU states as carry;
all four run modes (teacher_forcing / attention_forcing_online /
attention_forcing_offline / free_running) are the same scan with different
prenet-input and context selection.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TacotronConfig
from ..ops import layers as L


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _xavierize(key, p):
    """Reference init_model (tacotron.py:482-484): xavier_uniform on every
    param with dim > 1, biases keep their default init."""
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(key, len(leaves))
    new = [L.xavier_uniform(k, leaf.shape, leaf.dtype) if leaf.ndim > 1 else leaf
           for k, leaf in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def init_prenet(key, in_dims, fc1=256, fc2=128):
    k1, k2 = jax.random.split(key)
    return {"fc1": L.linear_init(k1, in_dims, fc1),
            "fc2": L.linear_init(k2, fc1, fc2)}


def init_cbhg(key, K, in_channels, channels, proj_channels, num_highways):
    ks = jax.random.split(key, K + 4 + num_highways)
    p = {
        "bank": [
            {"conv": L.conv1d_init(ks[i], in_channels, channels, i + 1,
                                   bias=False),
             "bn": L.batchnorm_init(channels)}
            for i in range(K)
        ],
        "proj1": {"conv": L.conv1d_init(ks[K], K * channels, proj_channels[0],
                                        3, bias=False),
                  "bn": L.batchnorm_init(proj_channels[0])},
        "proj2": {"conv": L.conv1d_init(ks[K + 1], proj_channels[0],
                                        proj_channels[1], 3, bias=False),
                  "bn": L.batchnorm_init(proj_channels[1])},
        "highways": [],
        "rnn_fwd": L.gru_init(ks[K + 2], channels, channels),
        "rnn_bwd": L.gru_init(ks[K + 3], channels, channels),
    }
    if proj_channels[-1] != channels:
        p["pre_highway"] = L.linear_init(ks[K + 3], proj_channels[-1],
                                         channels, bias=False)
    for i in range(num_highways):
        kh = jax.random.split(ks[K + 4 + i], 2)
        hw = {"W1": L.linear_init(kh[0], channels, channels),
              "W2": L.linear_init(kh[1], channels, channels)}
        hw["W1"]["b"] = jnp.zeros_like(hw["W1"]["b"])  # tacotron.py:15
        p["highways"].append(hw)
    return p


def init_tacotron(key, tts: TacotronConfig, n_mels: int, num_chars: int = 148):
    k = jax.random.split(key, 12)
    d = tts.decoder_dims
    params = {
        "encoder": {
            "embedding": L.embedding_init(k[0], num_chars, tts.embed_dims),
            "prenet": init_prenet(k[1], tts.embed_dims),
            "cbhg": init_cbhg(k[2], tts.encoder_K, tts.encoder_dims,
                              tts.encoder_dims,
                              [tts.encoder_dims, tts.encoder_dims],
                              tts.num_highways),
        },
        "encoder_proj": L.linear_init(k[3], d, d, bias=False),
        "decoder": {
            "prenet": init_prenet(k[4], n_mels),
            "attn": {
                "conv": L.conv1d_init(k[5], 2, 32, 31, bias=False),
                "L": L.linear_init(k[6], 32, d),
                "W": L.linear_init(k[7], d, d),
                "v": L.linear_init(k[8], d, 1, bias=False),
            },
            "attn_rnn": L.gru_init(k[9], d + d // 2, d),
            "rnn_input": L.linear_init(k[10], 2 * d, tts.lstm_dims),
            "res_rnn1": L.lstm_init(k[11], tts.lstm_dims, tts.lstm_dims),
            "res_rnn2": L.lstm_init(jax.random.fold_in(key, 101),
                                    tts.lstm_dims, tts.lstm_dims),
            "mel_proj": L.linear_init(jax.random.fold_in(key, 102),
                                      tts.lstm_dims, n_mels * tts.max_r,
                                      bias=False),
        },
        "postnet": init_cbhg(jax.random.fold_in(key, 103), tts.postnet_K,
                             n_mels, tts.postnet_dims, [256, n_mels],
                             tts.num_highways),
        "post_proj": L.linear_init(jax.random.fold_in(key, 104),
                                   tts.postnet_dims * 2, n_mels, bias=False),
    }
    return _xavierize(jax.random.fold_in(key, 105), params)


# --------------------------------------------------------------------------
# submodule applies
# --------------------------------------------------------------------------

def prenet_apply(p, x, key, training: bool, dropout: float = 0.5):
    k1, k2 = jax.random.split(key)
    x = jax.nn.relu(L.linear(p["fc1"], x))
    x = L.dropout(k1, x, dropout, training)
    x = jax.nn.relu(L.linear(p["fc2"], x))
    x = L.dropout(k2, x, dropout, training)
    return x


def highway_apply(p, x):
    x1 = L.linear(p["W1"], x)
    g = jax.nn.sigmoid(L.linear(p["W2"], x))
    return g * jax.nn.relu(x1) + (1.0 - g) * x


def _maxpool_k2_s1(x):
    """torch MaxPool1d(kernel=2, stride=1, padding=1) then [:T]
    (tacotron.py:68,111). x: (B, C, T)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 0)), constant_values=-jnp.inf)
    return jnp.maximum(xp[:, :, :-1], xp[:, :, 1:])  # length T, == out[:T]


def cbhg_apply(p, x, training: bool, lens=None, engine: str = "scan"):
    """x: (B, C_in, T) -> (B, T, 2*channels); returns (y, new_params).

    lens: optional (B,) true sequence lengths for right-padded batches
    (generation only). Pad positions are re-zeroed at every conv input so
    each valid position sees exactly the zero padding a solo (unpadded) run
    would, and the BiGRU runs length-aware (ops/layers.bigru) — valid
    outputs are then identical to running each row alone. Training keeps
    the reference's unmasked padded-batch semantics (tacotron.py:55-133).
    """
    new_p = {k: v for k, v in p.items()}
    T = x.shape[-1]
    zmask = None
    if lens is not None:
        zmask = (jnp.arange(T)[None, None, :]
                 < lens[:, None, None]).astype(x.dtype)
        x = x * zmask
    residual = x

    bank_out, new_bank = [], []
    for blk in p["bank"]:
        k = blk["conv"]["w"].shape[-1]
        c = L.conv1d(blk["conv"], x, padding=k // 2)
        c = jax.nn.relu(c)
        # truncate AFTER relu+bn so training-mode batch stats match the
        # reference (tacotron.py:103-105 truncates the BatchNormConv output)
        c, nbn = L.batchnorm(blk["bn"], c, training)
        bank_out.append(c[:, :, :T])
        new_bank.append({"conv": blk["conv"], "bn": nbn})
    new_p["bank"] = new_bank
    h = jnp.concatenate(bank_out, axis=1)
    if zmask is not None:  # BN(0) != 0: re-zero pads before pool/conv
        h = h * zmask

    h = _maxpool_k2_s1(h)
    if zmask is not None:
        h = h * zmask

    c = L.conv1d(p["proj1"]["conv"], h, padding=1)
    c = jax.nn.relu(c)
    c, nbn1 = L.batchnorm(p["proj1"]["bn"], c, training)
    new_p["proj1"] = {"conv": p["proj1"]["conv"], "bn": nbn1}
    if zmask is not None:
        c = c * zmask
    c = L.conv1d(p["proj2"]["conv"], c, padding=1)
    c, nbn2 = L.batchnorm(p["proj2"]["bn"], c, training)
    new_p["proj2"] = {"conv": p["proj2"]["conv"], "bn": nbn2}

    h = c + residual
    h = jnp.swapaxes(h, 1, 2)  # (B, T, C)
    if "pre_highway" in p:
        h = L.linear(p["pre_highway"], h)
    for hw in p["highways"]:
        h = highway_apply(hw, h)
    # pad rows entering the BiGRU are garbage (positionwise highways of
    # BN(0)) but never reach a valid output: the forward scan is causal and
    # the length-aware backward scan consumes real text first
    y = L.bigru(p["rnn_fwd"], p["rnn_bwd"], h, lens=lens,
                engine=engine)
    return y, new_p


def encoder_apply(p, x_ids, key, training: bool, dropout: float,
                  lens=None, engine: str = "scan"):
    """x_ids: (B, T_text) -> (B, T_text, 2*encoder_dims).

    lens: see cbhg_apply — batched generation masks pad positions so each
    utterance encodes exactly as it would alone."""
    x = L.embedding(p["embedding"], x_ids)
    x = prenet_apply(p["prenet"], x, key, training, dropout)
    y, new_cbhg = cbhg_apply(p["cbhg"], jnp.swapaxes(x, 1, 2), training,
                             lens=lens, engine=engine)
    return y, {"embedding": p["embedding"], "prenet": p["prenet"],
               "cbhg": new_cbhg}


def lsa_scores(p, encoder_seq_proj, query, cumulative, attention,
               text_mask=None):
    """Location-sensitive smooth attention (tacotron.py:187-205).

    text_mask: optional (B, T_text) 1.0 where real text — batched serving
    pads sentences to a shared length, and the sigmoid normalization,
    unlike a softmax with -inf masking, happily assigns pad positions real
    mass (measured: a 5-token utterance in a [5, 15] batch put 67% of its
    attention on padding). Training stays unmasked to match the
    reference's padded batches (tacotron.py:200 normalizes over the full
    axis); single-utterance generation has no padding. The Pallas decode
    kernel applies the same mask in-kernel (ops/pallas_taco.py).

    Returns scores (B, T_text)."""
    q = L.linear(p["W"], query)[:, None, :]                    # (B,1,d)
    # the accumulator is carried f32 (see init_decoder_state); the location
    # conv itself may run narrow
    loc = jnp.stack([cumulative.astype(attention.dtype), attention], axis=1)
    loc = L.conv1d(p["conv"], loc, padding=15)                 # (B,32,T)
    loc = L.linear(p["L"], jnp.swapaxes(loc, 1, 2))            # (B,T,d)
    u = L.linear(p["v"], jnp.tanh(q + encoder_seq_proj + loc))[..., 0]
    # normalize in f32: the smooth-attention weights sum over T_text and a
    # bf16 sum would cost ~2 decimal digits of attention mass
    sig = jax.nn.sigmoid(u.astype(jnp.float32))
    if text_mask is not None:
        sig = sig * text_mask
    return (sig / jnp.sum(sig, axis=1, keepdims=True)).astype(u.dtype)


class DecoderState(NamedTuple):
    attn_hidden: jnp.ndarray
    rnn1_h: jnp.ndarray
    rnn1_c: jnp.ndarray
    rnn2_h: jnp.ndarray
    rnn2_c: jnp.ndarray
    context: jnp.ndarray
    cumulative: jnp.ndarray
    attention: jnp.ndarray
    prev_frame: jnp.ndarray  # last mel frame of previous output group


def init_decoder_state(batch: int, T_text: int, tts: TacotronConfig,
                       n_mels: int, dtype=jnp.float32) -> DecoderState:
    d, l = tts.decoder_dims, tts.lstm_dims
    z = lambda *s: jnp.zeros(s, dtype)
    # cumulative attention is summed over every decoder group; past ~256 the
    # bf16 ulp exceeds a per-step attention weight and the location feature
    # would freeze on long utterances — keep the accumulator f32 always
    return DecoderState(z(batch, d), z(batch, l), z(batch, l), z(batch, l),
                        z(batch, l), z(batch, d),
                        jnp.zeros((batch, T_text), jnp.float32),
                        z(batch, T_text), z(batch, n_mels))


def decoder_step(p, encoder_seq, encoder_seq_proj, prenet_in,
                 state: DecoderState, tts: TacotronConfig, r: int,
                 n_mels: int, key, training: bool,
                 attn_ref: Optional[jnp.ndarray] = None,
                 text_mask: Optional[jnp.ndarray] = None,
                 prenet_precomputed: bool = False):
    """One decoder group step (tacotron.py:229-286).

    prenet_in: (B, n_mels) frame, or — when ``prenet_precomputed`` — the
    already-prenet'd (B, prenet_dims[-1]) features (teacher forcing hoists
    the prenet over all groups: its input is ground truth, not decoder
    state, so its two per-step (B, ·) GEMMs become one (B*n_groups, ·)
    MXU GEMM pair outside the scan).
    Returns (mels (B, n_mels, r), scores (B, T_text), new_state)."""
    k_pre, k_z1, k_z2 = jax.random.split(key, 3)
    if prenet_precomputed:
        prenet_out = prenet_in
    else:
        prenet_out = prenet_apply(p["prenet"], prenet_in, k_pre, training,
                                  tts.dropout)
    attn_rnn_in = jnp.concatenate([state.context, prenet_out], axis=-1)
    attn_hidden = L.gru_cell(p["attn_rnn"], attn_rnn_in, state.attn_hidden)

    scores = lsa_scores(p["attn"], encoder_seq_proj, attn_hidden,
                        state.cumulative, state.attention,
                        text_mask=text_mask)
    attention = scores
    cumulative = state.cumulative + attention.astype(jnp.float32)

    ctx_weights = scores if attn_ref is None else attn_ref
    context = jnp.einsum("bt,btc->bc", ctx_weights, encoder_seq)

    x = jnp.concatenate([context, attn_hidden], axis=1)
    x = L.linear(p["rnn_input"], x)

    def zoneout(k, prev, cur, rate=0.1):
        if not training:
            return cur
        mask = jax.random.bernoulli(k, rate, prev.shape)
        return jnp.where(mask, prev, cur)

    h1_next, c1 = L.lstm_cell(p["res_rnn1"], x, (state.rnn1_h, state.rnn1_c))
    h1 = zoneout(k_z1, state.rnn1_h, h1_next)
    x = x + h1
    h2_next, c2 = L.lstm_cell(p["res_rnn2"], x, (state.rnn2_h, state.rnn2_c))
    h2 = zoneout(k_z2, state.rnn2_h, h2_next)
    x = x + h2

    mels = L.linear(p["mel_proj"], x)
    mels = mels.reshape(x.shape[0], n_mels, tts.max_r)[:, :, :r]

    new_state = DecoderState(attn_hidden, h1, c1, h2, c2, context,
                             cumulative, attention, mels[:, :, -1])
    return mels, scores, new_state


# --------------------------------------------------------------------------
# full forward (all modes) + generate
# --------------------------------------------------------------------------

def _cast_params_except_bn(p, dtype):
    """Cast a parameter pytree to ``dtype``, leaving BatchNorm dicts f32
    (their statistics/normalization stay full precision, ops/layers.py)."""
    if isinstance(p, dict):
        return {k: (v if k.startswith("bn")
                    else _cast_params_except_bn(v, dtype))
                for k, v in p.items()}
    if isinstance(p, (list, tuple)):
        return type(p)(_cast_params_except_bn(v, dtype) for v in p)
    return p.astype(dtype) if hasattr(p, "astype") else p


@partial(jax.jit, static_argnames=("tts", "r", "mode", "training",
                                   "generate_gta", "compute_dtype",
                                   "recurrence"))
def forward(params, x_ids, m, tts: TacotronConfig, r: int, key,
            mode: str = "teacher_forcing", training: bool = True,
            attn_ref: Optional[jnp.ndarray] = None,
            generate_gta: bool = False, compute_dtype=None,
            recurrence: str = "scan"):
    """Full forward (tacotron.py:319-379).

    x_ids: (B, T_text); m: (B, n_mels, steps) target mels (steps % r == 0).
    attn_ref: (B, steps//r, T_text) for attention-forcing modes.
    compute_dtype: optional narrow dtype (bf16) — mixed-precision training:
    weights/activations cast on entry (BatchNorm and the attention
    normalization stay f32), outputs cast back to f32; master params and
    gradients remain f32.
    Returns (mel_out (B,n_mels,steps), linear (B,steps,n_mels... transposed
    to (B, fft_bins==n_mels, steps)), attn (B, steps//r, T_text),
    new_params).
    """
    if generate_gta:
        training = False
    if compute_dtype is not None:
        params = _cast_params_except_bn(params, compute_dtype)
        m = m.astype(compute_dtype)
        if attn_ref is not None:
            attn_ref = attn_ref.astype(compute_dtype)
    B, n_mels, steps = m.shape
    n_groups = steps // r

    k_enc, k_dec, k_pre = jax.random.split(key, 3)
    # recurrence="pallas": the CBHG BiGRUs (encoder + postnet) run on
    # the persistent-weights GRU training kernels (ops/pallas_gru.py via
    # ops.layers.gru engine), and the decoder group recurrence routes to
    # the TF/AF decoder training kernels in the mode branches below
    # (ops/pallas_taco_train.py)
    eng = recurrence if training else "scan"
    encoder_seq, new_enc = encoder_apply(params["encoder"], x_ids, k_enc,
                                         training, tts.dropout,
                                         engine=eng)
    encoder_seq_proj = L.linear(params["encoder_proj"], encoder_seq)

    T_text = x_ids.shape[1]
    state0 = init_decoder_state(B, T_text, tts, n_mels, m.dtype)

    step_keys = jax.random.split(k_dec, n_groups)
    dec = params["decoder"]

    if mode == "teacher_forcing":
        # prenet_in for group g>0 is ground-truth frame m[:, :, g*r - 1]
        tf_in = jnp.concatenate(
            [jnp.zeros((B, n_mels, 1), m.dtype), m[:, :, r - 1::r][:, :, :-1]],
            axis=2)  # (B, n_mels, n_groups); group 0 gets the GO frame
        # HOIST the prenet: in TF mode its input is ground truth, not
        # decoder state, so all n_groups steps run as one (G*B, ·) GEMM
        # pair on the MXU instead of 2 small GEMMs inside the scan
        # (always-on dropout drawn for the whole sequence at once)
        pre_all = prenet_apply(
            dec["prenet"],
            jnp.moveaxis(tf_in, 2, 0).reshape(n_groups * B, n_mels),
            k_pre, training, tts.dropout).reshape(n_groups, B, -1)

        if recurrence in ("pallas", "pallas_interpret"):
            # run the whole TF decoder recurrence (fwd + custom VJP) on
            # the persistent-weights training kernels — the scan twin
            # below is the spec (ops/pallas_taco_train.py; zoneout masks
            # drawn with the scan's exact key stream). Eval-mode TF (the
            # AF-online teacher, GTA/attn-ref export) rides the same
            # kernel with zero masks (zoneout off == passthrough).
            from ..ops.pallas_taco_train import (decoder_tf_train,
                                                zoneout_masks)
            if training:
                zm1, zm2 = zoneout_masks(k_dec, n_groups, B, tts.lstm_dims)
            else:
                zm1 = zm2 = jnp.zeros((n_groups, B, tts.lstm_dims),
                                      jnp.bool_)
            mel_groups, attn_scores = decoder_tf_train(
                dec, encoder_seq, encoder_seq_proj, pre_all, zm1, zm2,
                tts.max_r, r, n_mels,
                impl=("pallas_interpret"
                      if recurrence == "pallas_interpret" else "pallas"))
        else:
            def step(state, inp):
                k, pre_in = inp
                mels, scores, state = decoder_step(
                    dec, encoder_seq, encoder_seq_proj, pre_in, state, tts,
                    r, n_mels, k, training, prenet_precomputed=True)
                return state, (mels, scores)

            xs = (step_keys, pre_all)
            _, (mel_groups, attn_scores) = jax.lax.scan(step, state0, xs)
    elif mode in ("attention_forcing_online", "attention_forcing_offline"):
        assert attn_ref is not None, \
            "attention_forcing mode requires attn_ref (tacotron.py:395)"

        if recurrence in ("pallas", "pallas_interpret"):
            # AF decoder recurrence on the training kernels: context from
            # attn_ref, prenet in-kernel on the carried prev_frame with
            # the scan's exact dropout/zoneout key stream
            # (ops/pallas_taco_train.py AF arm)
            from ..ops.pallas_taco_train import af_masks, decoder_af_train
            P1 = dec["prenet"]["fc1"]["w"].shape[1]
            P2 = dec["prenet"]["fc2"]["w"].shape[1]
            dm1, dm2, zm1, zm2 = af_masks(k_dec, n_groups, B,
                                          tts.lstm_dims, P1, P2, training,
                                          tts.dropout)
            mel_groups, attn_scores = decoder_af_train(
                dec, encoder_seq, encoder_seq_proj, attn_ref, dm1, dm2,
                zm1, zm2, tts.max_r, r, n_mels,
                impl=("pallas_interpret"
                      if recurrence == "pallas_interpret" else "pallas"))
        else:
            def step(state, inp):
                k, a_ref = inp
                mels, scores, state = decoder_step(
                    dec, encoder_seq, encoder_seq_proj, state.prev_frame,
                    state, tts, r, n_mels, k, training, attn_ref=a_ref)
                return state, (mels, scores)

            xs = (step_keys, jnp.moveaxis(attn_ref, 1, 0))
            _, (mel_groups, attn_scores) = jax.lax.scan(step, state0, xs)
    elif mode == "free_running":
        def step(state, k):
            mels, scores, state = decoder_step(
                dec, encoder_seq, encoder_seq_proj, state.prev_frame, state,
                tts, r, n_mels, k, training)
            return state, (mels, scores)

        _, (mel_groups, attn_scores) = jax.lax.scan(step, state0, step_keys)
    else:
        raise ValueError(mode)

    # (n_groups, B, n_mels, r) -> (B, n_mels, steps)
    mel_out = jnp.moveaxis(mel_groups, 0, 2).reshape(B, n_mels, steps)
    attn = jnp.swapaxes(attn_scores, 0, 1)  # (B, n_groups, T_text)

    postnet_out, new_postnet = cbhg_apply(params["postnet"], mel_out,
                                          training, engine=eng)
    linear = L.linear(params["post_proj"], postnet_out)
    linear = jnp.swapaxes(linear, 1, 2)

    new_params = dict(params)
    new_params["encoder"] = new_enc
    new_params["postnet"] = new_postnet
    if compute_dtype is not None:  # losses/plots/GTA stay f32
        mel_out = mel_out.astype(jnp.float32)
        linear = linear.astype(jnp.float32)
        attn = attn.astype(jnp.float32)
    return mel_out, linear, attn, new_params


@partial(jax.jit, static_argnames=("tts", "r", "steps", "n_mels",
                                   "chunk_groups"))
def _generate_scan(params, x_ids, tts: TacotronConfig, r: int, steps: int,
                   n_mels: int, key, chunk_groups: int = 32,
                   text_lens=None):
    """Free-running decode with chunked early exit.

    The reference breaks its Python loop at the stop threshold
    (tacotron.py:407-416); a plain lax.scan would always run all steps/r
    groups (~10x wasted decoder compute for a 2-second sentence at
    steps=2000). Instead the scan runs in `chunk_groups`-group chunks
    inside a lax.while_loop that exits once every utterance in the batch
    has stopped — serving latency tracks utterance length at chunk
    granularity while staying a single compiled program.

    text_lens: optional (B,) true text lengths — masks the smooth-attention
    normalization for pad-to-max batches (see lsa_scores; batched serving
    MUST pass this or short utterances attend to padding).
    """
    B = x_ids.shape[0]
    n_groups = steps // r
    n_chunks = -(-n_groups // chunk_groups)
    n_pad = n_chunks * chunk_groups
    k_enc, k_dec = jax.random.split(key)
    encoder_seq, _ = encoder_apply(params["encoder"], x_ids, k_enc, False,
                                   tts.dropout, lens=text_lens)
    encoder_seq_proj = L.linear(params["encoder_proj"], encoder_seq)
    state0 = init_decoder_state(B, x_ids.shape[1], tts, n_mels)
    dec = params["decoder"]
    text_mask = None
    if text_lens is not None:
        text_mask = (jnp.arange(x_ids.shape[1])[None, :]
                     < text_lens[:, None]).astype(jnp.float32)
    # inference consumes no randomness (dropout/zoneout are eval-off, as in
    # the reference's self.eval() generate), keys exist only for API shape
    step_keys = jax.random.split(k_dec, n_pad)

    def step(carry, k):
        state, stopped, t = carry  # stopped: (B,) per-utterance masks
        mels, scores, new_state = decoder_step(
            dec, encoder_seq, encoder_seq_proj, state.prev_frame, state, tts,
            r, n_mels, k, False, text_mask=text_mask)
        # per-utterance stop when every value of its group is silent
        # (tacotron.py:461; the reference is batch=1 — batching generalizes
        # the loop break to a per-element freeze mask)
        hit = jnp.logical_and(jnp.all(mels < tts.stop_threshold, axis=(1, 2)),
                              t > 10)
        stopped_now = jnp.logical_or(stopped, hit)
        # freeze finished utterances so trailing groups repeat silence
        state = jax.tree_util.tree_map(
            lambda old, new: jnp.where(
                stopped.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
            state, new_state)
        return (state, stopped_now, t + r), (mels, scores, stopped)

    def chunk_body(carry):
        state, stopped, t, c, mel_buf, attn_buf, stop_buf = carry
        keys = jax.lax.dynamic_slice_in_dim(step_keys, c * chunk_groups,
                                            chunk_groups)
        (state, stopped, t), (m_g, a_g, s_g) = jax.lax.scan(
            step, (state, stopped, t), keys)
        at = c * chunk_groups
        mel_buf = jax.lax.dynamic_update_slice_in_dim(mel_buf, m_g, at, 0)
        attn_buf = jax.lax.dynamic_update_slice_in_dim(attn_buf, a_g, at, 0)
        stop_buf = jax.lax.dynamic_update_slice_in_dim(stop_buf, s_g, at, 0)
        return (state, stopped, t, c + 1, mel_buf, attn_buf, stop_buf)

    def chunk_cond(carry):
        _, stopped, _, c, _, _, _ = carry
        return jnp.logical_and(c < n_chunks, ~jnp.all(stopped))

    T_text = x_ids.shape[1]
    init = (state0, jnp.zeros((B,), bool), jnp.asarray(0),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((n_pad, B, n_mels, r), jnp.float32),
            jnp.zeros((n_pad, B, T_text), jnp.float32),
            # groups never executed count as already-stopped for n_valid
            jnp.ones((n_pad, B), bool))
    (state_f, _, _, c_f, mel_groups, attn_scores, stopped_before) = \
        jax.lax.while_loop(chunk_cond, chunk_body, init)

    # Unexecuted trailing groups (early exit ⇒ every utterance stopped ⇒
    # state frozen ⇒ a full scan would have written the same frozen group
    # forever): fill them with one extra frozen-state step so the output —
    # including what the postnet BiGRU sees beyond the stop — is
    # bit-identical to an unchunked scan over all groups.
    tail_mels, tail_scores, _ = decoder_step(
        dec, encoder_seq, encoder_seq_proj, state_f.prev_frame, state_f,
        tts, r, n_mels, step_keys[0], False, text_mask=text_mask)
    fill = (jnp.arange(n_pad) >= c_f * chunk_groups)
    mel_groups = jnp.where(fill[:, None, None, None], tail_mels[None],
                           mel_groups)
    attn_scores = jnp.where(fill[:, None, None], tail_scores[None],
                            attn_scores)
    mel_groups = mel_groups[:n_groups]
    attn_scores = attn_scores[:n_groups]
    stopped_before = stopped_before[:n_groups]

    mel_out = jnp.moveaxis(mel_groups, 0, 2).reshape(B, n_mels, steps)
    attn = jnp.swapaxes(attn_scores, 0, 1)
    n_valid_groups = jnp.sum(~stopped_before, axis=0)  # (B,)

    postnet_out, _ = cbhg_apply(params["postnet"], mel_out, False)
    linear = L.linear(params["post_proj"], postnet_out)
    linear = jnp.swapaxes(linear, 1, 2)
    return mel_out, linear, attn, n_valid_groups


@partial(jax.jit, static_argnames=("tts", "r", "steps", "n_mels",
                                   "interpret"))
def _generate_kernel(params, x_ids, tts: TacotronConfig, r: int, steps: int,
                     n_mels: int, key, interpret: bool = False):
    """Free-running decode on the persistent-weights Pallas kernel
    (ops/pallas_taco.py): encoder + postnet stay XLA, the sequential
    group loop runs in one kernel launch. Same outputs as
    `_generate_scan` (decode consumes no randomness at eval)."""
    from ..ops.pallas_taco import decode_pallas

    k_enc, _ = jax.random.split(key)
    encoder_seq, _ = encoder_apply(params["encoder"], x_ids, k_enc, False,
                                   tts.dropout)
    encoder_seq_proj = L.linear(params["encoder_proj"], encoder_seq)
    mask = jnp.ones((x_ids.shape[1],), jnp.float32)  # batch=1: no padding
    mel_out, attn, n_valid = decode_pallas(params, encoder_seq,
                                           encoder_seq_proj, mask, tts, r,
                                           steps, n_mels,
                                           interpret=interpret)
    postnet_out, _ = cbhg_apply(params["postnet"], mel_out, False)
    linear = L.linear(params["post_proj"], postnet_out)
    linear = jnp.swapaxes(linear, 1, 2)
    return mel_out, linear, attn, n_valid


def generate(params, x_ids, tts: TacotronConfig, r: int, n_mels: int = 80,
             steps: int = 2000, key=None, impl: str = "auto"):
    """Free-running inference (tacotron.py:420-480): batch=1 text ids ->
    (mel (n_mels, T), linear (n_mels, T), attn (T//r, T_text)) numpy, trimmed
    at the stop-threshold group.

    impl: "pallas" (persistent-weights decode kernel), "scan" (XLA
    lax.scan), or "auto" = pallas on TPU backends, scan elsewhere.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if impl == "auto":
        from ..utils.backend import use_pallas_default
        impl = "pallas" if use_pallas_default() else "scan"
    x = jnp.asarray(x_ids)[None, :]
    steps = -(-steps // r) * r
    if impl == "pallas":
        mel, linear, attn, n_valid = _generate_kernel(params, x, tts, r,
                                                      steps, n_mels, key)
    else:
        mel, linear, attn, n_valid = _generate_scan(params, x, tts, r, steps,
                                                    n_mels, key)
    n = int(n_valid[0])  # groups up to and including the stop trigger
    T = min(n * r, steps)
    return (np.asarray(mel[0, :, :T]), np.asarray(linear[0, :, :T]),
            np.asarray(attn[0, : T // r]))


@partial(jax.jit, static_argnames=("tts", "r", "steps", "n_mels",
                                   "interpret"))
def _generate_kernel_batch(params, x_ids, text_lens, tts: TacotronConfig,
                           r: int, steps: int, n_mels: int, key,
                           interpret: bool = False):
    """Batched free-running decode on the persistent-weights kernels:
    length-aware encoder + postnet stay XLA, all B group loops run in ONE
    launch. B <= 8 uses the sublane-row-packed kernel
    (decode_pallas_batch); larger batches use the LANE-STACKED kernel
    (decode_pallas_stacked) where every utterance advances in the same
    plane ops per step — the row-packed kernel tiles 8-utterance groups
    across the grid sequentially, which merely matches the scan by B=16.
    Same outputs as `_generate_scan(..., text_lens=...)`."""
    from ..ops.pallas_taco import decode_pallas_batch, decode_pallas_stacked

    k_enc, _ = jax.random.split(key)
    encoder_seq, _ = encoder_apply(params["encoder"], x_ids, k_enc, False,
                                   tts.dropout, lens=text_lens)
    encoder_seq_proj = L.linear(params["encoder_proj"], encoder_seq)
    text_mask = (jnp.arange(x_ids.shape[1])[None, :]
                 < text_lens[:, None]).astype(jnp.float32)
    # pad positions of the length-aware encoder outputs are garbage
    # (highway of BN(0) + backward-GRU tail) — zero them so the kernel's
    # masked scores see clean context planes
    encoder_seq = encoder_seq * text_mask[..., None]
    encoder_seq_proj = encoder_seq_proj * text_mask[..., None]
    decode = (decode_pallas_batch if x_ids.shape[0] <= 8
              else decode_pallas_stacked)
    mel_out, attn, n_valid = decode(
        params, encoder_seq, encoder_seq_proj, text_mask, tts, r, steps,
        n_mels, interpret=interpret)
    postnet_out, _ = cbhg_apply(params["postnet"], mel_out, False)
    linear = L.linear(params["post_proj"], postnet_out)
    linear = jnp.swapaxes(linear, 1, 2)
    return mel_out, linear, attn, n_valid


def generate_batch(params, x_ids_list, tts: TacotronConfig, r: int,
                   n_mels: int = 80, steps: int = 2000, key=None,
                   impl: str = "auto"):
    """Serving path: free-running decode for a BATCH of sentences in one
    compiled program (pad-to-max text lengths; per-utterance stop masks).

    impl: "pallas" (batched persistent-weights decode kernels — B <= 8
    packs utterances on sublane rows, larger batches ride the
    lane-stacked kernel where every utterance advances in the same plane
    ops per step, so any serving batch size stays on a kernel), "scan"
    (XLA lax.scan), or "auto" = pallas on TPU backends, scan elsewhere.

    Returns a list of (mel, linear, attn) numpy triples, each trimmed to
    its own stop step. Pad-to-max text lengths are masked out of the
    smooth-attention normalization (lsa_scores text_mask) so a short
    utterance decodes identically to running it alone.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if impl == "auto":
        from ..utils.backend import use_pallas_default
        impl = "pallas" if use_pallas_default() else "scan"
    max_len = max(len(x) for x in x_ids_list)
    x = jnp.asarray(np.stack([np.pad(np.asarray(xi), (0, max_len - len(xi)))
                              for xi in x_ids_list]))
    lens = jnp.asarray([len(xi) for xi in x_ids_list])
    steps = -(-steps // r) * r
    if impl == "pallas" and len(x_ids_list) == 1:
        # no padding at B=1; the tuned single-utterance kernel runs ~2x
        # the batched kernel's per-group cost
        mel, linear, attn, n_valid = _generate_kernel(params, x, tts, r,
                                                      steps, n_mels, key)
    elif impl == "pallas":
        mel, linear, attn, n_valid = _generate_kernel_batch(
            params, x, lens, tts, r, steps, n_mels, key)
    else:
        mel, linear, attn, n_valid = _generate_scan(
            params, x, tts, r, steps, n_mels, key, text_lens=lens)
    outs = []
    for b in range(len(x_ids_list)):
        T = min(int(n_valid[b]) * r, steps)
        outs.append((np.asarray(mel[b, :, :T]), np.asarray(linear[b, :, :T]),
                     np.asarray(attn[b, : T // r, : len(x_ids_list[b])])))
    return outs
