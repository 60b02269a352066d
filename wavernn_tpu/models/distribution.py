"""Discretized mixture-of-logistics loss and sampler (reference
utils/distribution.py:16-123), in JAX.

The sampler factors its random draws into explicit arguments so parity tests
can inject the exact noise used by a reference run (torch's internal
``uniform_`` draws cannot be replayed across frameworks).
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp

LOG_SCALE_MIN = float(math.log(1e-14))


def log_sum_exp(x):
    """Numerically stable logsumexp over the last axis (distribution.py:6)."""
    m = jnp.max(x, axis=-1)
    m2 = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m2), axis=-1))


def discretized_mix_logistic_loss(y_hat, y, num_classes: int = 65536,
                                  log_scale_min: float = LOG_SCALE_MIN,
                                  reduce: bool = True):
    """Negative log-likelihood of y under a discretized logistic mixture.

    y_hat: (B, T, 3*nr_mix) raw network output (note: reference takes
    (B, C, T) and permutes twice, distribution.py:20-26 — we take the
    natural (B, T, C) directly).
    y: (B, T) or (B, T, 1) targets in [-1, 1].
    """
    nr_mix = y_hat.shape[-1] // 3
    if y.ndim == y_hat.ndim - 1:
        y = y[..., None]

    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:], log_scale_min)

    centered_y = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_y + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered_y - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)      # log sig(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)       # log(1-sig(min_in))
    cdf_delta = cdf_plus - cdf_min

    mid_in = inv_stdv * centered_y
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - math.log((num_classes - 1) / 2.0))
    inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)

    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)

    if reduce:
        return -jnp.mean(log_sum_exp(log_probs))
    return -log_sum_exp(log_probs)[..., None]


def sample_from_discretized_mix_logistic_with_noise(y, u_mix, u_sample,
                                                    log_scale_min: float = LOG_SCALE_MIN):
    """Deterministic MOL sampling given uniform noise.

    y: (..., 3*nr_mix) network output.
    u_mix: (..., nr_mix) uniforms in (1e-5, 1-1e-5) for Gumbel mixture pick.
    u_sample: (...,) uniform in (1e-5, 1-1e-5) for the logistic draw.
    Returns samples in [-1, 1], shape (...,).
    """
    nr_mix = y.shape[-1] // 3
    logit_probs = y[..., :nr_mix]

    # Gumbel-max mixture indicator (distribution.py:106-108)
    temp = logit_probs - jnp.log(-jnp.log(u_mix))
    argmax = jnp.argmax(temp, axis=-1)
    one_hot = jax.nn.one_hot(argmax, nr_mix, dtype=y.dtype)

    means = jnp.sum(y[..., nr_mix:2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y[..., 2 * nr_mix:3 * nr_mix] * one_hot, axis=-1),
        log_scale_min)

    # inverse-CDF logistic sample (distribution.py:118-121)
    x = means + jnp.exp(log_scales) * (jnp.log(u_sample) - jnp.log(1.0 - u_sample))
    return jnp.clip(x, -1.0, 1.0)


def sample_from_discretized_mix_logistic(key, y,
                                         log_scale_min: float = LOG_SCALE_MIN):
    """MOL sampling with JAX PRNG. y: (..., 3*nr_mix) -> (...,)."""
    nr_mix = y.shape[-1] // 3
    k1, k2 = jax.random.split(key)
    u_mix = jax.random.uniform(k1, y.shape[:-1] + (nr_mix,),
                               minval=1e-5, maxval=1.0 - 1e-5, dtype=y.dtype)
    u_sample = jax.random.uniform(k2, y.shape[:-1],
                                  minval=1e-5, maxval=1.0 - 1e-5, dtype=y.dtype)
    return sample_from_discretized_mix_logistic_with_noise(
        y, u_mix, u_sample, log_scale_min)


def sample_raw_categorical_with_noise(logits, u):
    """Gumbel-max categorical draw over RAW softmax classes given uniforms.

    logits: (..., n_classes), u: same shape, uniforms in (0,1).
    Returns float samples scaled to [-1, 1] (fatchord_version.py:231-237).
    """
    n_classes = logits.shape[-1]
    g = -jnp.log(-jnp.log(u))
    idx = jnp.argmax(jax.nn.log_softmax(logits, axis=-1) + g, axis=-1)
    return 2.0 * idx.astype(logits.dtype) / (n_classes - 1.0) - 1.0


def sample_raw_categorical(key, logits):
    u = jax.random.uniform(key, logits.shape, minval=1e-9, maxval=1.0,
                           dtype=logits.dtype)
    return sample_raw_categorical_with_noise(logits, u)
