"""Shared helpers for the Pallas kernel modules (pallas_gen / pallas_gru /
pallas_taco / pallas_taco_train): one home for the dot conventions, the
sigmoid-via-tanh trick, and the chunk/VMEM heuristics so the copies cannot
drift independently."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sig(x):
    """sigmoid(x) == 0.5*tanh(x/2)+0.5: one transcendental kind on the VPU."""
    return 0.5 * jnp.tanh(0.5 * x) + 0.5


def dot(a, b):
    """(M, K) @ (K, N) with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def dot_tt(a, b):
    """Contract the LANE dim of both operands: (M, S) x (N, S) -> (M, N)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def dot_ss(a, b):
    """Contract the SUBLANE dim of both: (B, M) x (B, N) -> (M, N) —
    the weight-gradient form dW = x^T dy without an explicit transpose."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_chunk(n: int, chunk: int) -> int:
    """Largest divisor of n <= chunk if one exists above chunk//2 (avoids
    a ragged tail block), else chunk with zero padding."""
    for c in range(chunk, chunk // 2, -1):
        if n % c == 0:
            return c
    return chunk


def gru_seq_chunk(B: int) -> int:
    """Per-launch time-chunk for the GRU training kernels: the streamed
    (C, B, 3H/4H) blocks must fit VMEM with double buffering, so the
    chunk shrinks with batch (64 steps up to B=32, then ~2048/B)."""
    return 64 if B <= 32 else max(8, 2048 // B)
