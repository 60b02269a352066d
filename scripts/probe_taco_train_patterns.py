"""One-off Mosaic lowering probe for the Tacotron TRAINING decoder kernel
(ops/pallas_taco_train.py design). Exercises, in ONE tiny pallas_call on
the real chip, the patterns that kernel needs and that interpret mode
cannot vouch for:

  1. lane-axis pltpu.roll on an (8, S) row-packed plane;
  2. single-row writes into a (64, S) VMEM scratch (shift-stack build);
  3. matmul with a (1, S)-row LHS/RHS and (D, S) lane-major planes;
  4. small in-kernel transposes (B, D) -> (D, B);
  5. dot_general contracting over the LANE dim of both operands
     (A (64,S) x B (D,S) -> (64,D)) for in-kernel weight-grad accum.

Run: python scripts/probe_taco_train_patterns.py   (uses default backend)
Prints PASS/FAIL per pattern vs a numpy oracle.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 1408   # 16 utterances x T_pad=88 -> padded to 1408 (11 lane tiles)
D = 256
K = 64


def kernel(ca_ref, w_ref, encp_ref, q_ref, eb_ref, stack_ref,
           o_loc_ref, o_u_ref, o_qT_ref, o_wg_ref, o_roll_ref, o_sub_ref,
           o_col_ref):
    # 1) lane rolls of the (8, S) plane; write rows into (64, S) scratch
    for k in range(31):
        sh = pltpu.roll(ca_ref[:], (15 - k) % S, axis=1)
        stack_ref[k, :] = sh[0, :]
        stack_ref[31 + k, :] = sh[1, :]
    stack_ref[62, :] = jnp.zeros((S,), jnp.float32)
    stack_ref[63, :] = jnp.zeros((S,), jnp.float32)
    o_roll_ref[:] = stack_ref[:8, :]

    # 3) (D, K) @ (K, S) lane-major matmul
    locLT = jax.lax.dot_general(
        w_ref[:], stack_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (D, S)

    # 4) transpose (8, D) -> (D, 8) in kernel
    qT = jnp.swapaxes(q_ref[:], 0, 1)                # (D, 8)
    o_qT_ref[:] = qT
    q_plane = jax.lax.dot_general(
        qT, eb_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (D, S)

    argT = jnp.tanh(locLT + encp_ref[:] + q_plane)
    o_loc_ref[:] = argT

    # 3b) (1, D) @ (D, S) row result
    v = w_ref[0:1, :D] * 0.01
    u = jax.lax.dot_general(
        v, argT, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (1, S)
    o_u_ref[:] = jnp.broadcast_to(u, (8, S))

    # 5) lane-contraction dot: (64, S) x (D, S) -> (64, D)
    wg = jax.lax.dot_general(
        stack_ref[:], argT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_wg_ref[:] = wg

    # 6) sublane-contraction dot (transposed-LHS matmul): q (8, D) x
    #    q (8, D) -> (D, D) — the in-kernel weight-grad accumulation form
    sub = jax.lax.dot_general(
        q_ref[:], q_ref[:] * 2.0,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_sub_ref[:] = sub

    # 7) wide-row transpose (8, S) -> (S, 8) (scores row -> column)
    o_col_ref[:] = jnp.swapaxes(ca_ref[:], 0, 1)


def main():
    rng = np.random.RandomState(0)
    ca = rng.randn(8, S).astype(np.float32) * 0.1
    ca[2:] = 0.0
    w = rng.randn(D, K).astype(np.float32) * 0.1
    w[:, 62:] = 0.0
    encp = rng.randn(D, S).astype(np.float32) * 0.1
    q = rng.randn(8, D).astype(np.float32) * 0.1
    eb = np.zeros((8, S), np.float32)
    T_pad = S // 8
    for b in range(8):
        eb[b, b * T_pad:(b + 1) * T_pad] = 1.0

    f = pl.pallas_call(
        kernel,
        out_specs=tuple(pl.BlockSpec(s, lambda: (0,) * len(s),
                                     memory_space=pltpu.VMEM)
                        for s in [(D, S), (8, S), (D, 8), (K, D), (8, S),
                                  (D, D), (S, 8)]),
        out_shape=(jax.ShapeDtypeStruct((D, S), jnp.float32),
                   jax.ShapeDtypeStruct((8, S), jnp.float32),
                   jax.ShapeDtypeStruct((D, 8), jnp.float32),
                   jax.ShapeDtypeStruct((K, D), jnp.float32),
                   jax.ShapeDtypeStruct((8, S), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((S, 8), jnp.float32)),
        in_specs=[pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                               memory_space=pltpu.VMEM)
                  for a in (ca, w, encp, q, eb)],
        scratch_shapes=[pltpu.VMEM((K, S), jnp.float32)],
    )
    argT_o, u_o, qT_o, wg_o, roll_o, sub_o, col_o = jax.jit(f)(
        ca, w, encp, q, eb)

    # numpy oracle
    stack = np.zeros((K, S), np.float32)
    for k in range(31):
        sh = np.roll(ca, 15 - k, axis=1)
        stack[k] = sh[0]
        stack[31 + k] = sh[1]
    locLT = w @ stack
    qT = q.T
    argT = np.tanh(locLT + encp + qT @ eb)
    u = (w[0:1, :D] * 0.01) @ argT
    wg = stack @ argT.T

    def chk(name, got, want, tol=2e-4):
        got = np.asarray(got)
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        print(f"{name}: {'PASS' if err < tol else 'FAIL'} rel={err:.2e}")

    chk("rolls+stack ", roll_o, stack[:8])
    chk("argT plane  ", argT_o, argT)
    chk("qT transpose", qT_o, qT)
    chk("u row       ", u_o, np.broadcast_to(u, (8, S)))
    chk("lane-dot wg ", wg_o, wg)
    chk("sublane-dot ", sub_o, q.T @ (q * 2.0))
    chk("row->col    ", col_o, ca.T)


if __name__ == "__main__":
    main()
