"""Fused int8-weight FFN for the autoregressive decode step.

``y = relu(x @ w1_int8 * s1 + b1) @ w2_int8 * s2 + b2`` in ONE Pallas
launch. The per-matmul int8 kernel (int8_matmul.py) already keeps the HBM
weight stream int8; this fusion additionally removes (a) one kernel
launch per FFN (launch overhead measured to matter at decode's tiny
activation shapes — BENCHMARKS.md r5 "kernel-everywhere 0.83x") and
(b) the [m, d_ff] intermediate's HBM round-trip: the hidden activation
lives only in VMEM, one d_ff block at a time.

Grid over d_ff blocks j:
  h_j = relu((x @ w1[:, j]) * s1[j] + b1[j])        # [m, block_ff]
  acc += h_j @ w2[j, :]                              # f32 accumulator
last step:  o = acc * s2 + b2                        # s2 factors out of
                                                     # the j-sum (per-
                                                     # output-channel)
x stays fully VMEM-resident (decode activations are a sliver); the two
weight tiles stream per block. The w2 scale is applied ONCE to the final
accumulator — exactly the per-matmul kernel's math, so the fused result
matches composing two ``int8_matmul`` calls up to f32 summation order.

Reference path (`int8_ffn_reference`) is the same math in jnp — used
off-TPU and in golden tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def int8_ffn_reference(x, w1q, s1, b1, w2q, s2, b2):
    """jnp reference: operands at the activation's precision class (bf16
    for bf16 models), f32 accumulate, f32 scales on the accumulators."""
    dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    h = jnp.dot(x.astype(dt), w1q.astype(dt),
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h * s1.astype(jnp.float32)[None, :]
                    + b1.astype(jnp.float32)[None, :], 0.0)
    acc = jnp.dot(h.astype(dt), w2q.astype(dt),
                  preferred_element_type=jnp.float32)
    return acc * s2.astype(jnp.float32)[None, :] + b2.astype(
        jnp.float32)[None, :]


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            o_ref, acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = jnp.dot(x_ref[:].astype(jnp.bfloat16),
                w1_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h * s1_ref[:] + b1_ref[:], 0.0)   # [m, bff] f32
    acc_ref[:] += jnp.dot(h.astype(jnp.bfloat16),
                          w2_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s2_ref[:] + b2_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_ff", "out_dtype", "interpret"))
def int8_ffn(x: jnp.ndarray,        # [m, k] float
             w1q: jnp.ndarray,      # [k, ff] int8
             s1: jnp.ndarray,       # [ff] f32
             b1: jnp.ndarray,       # [ff] f32
             w2q: jnp.ndarray,      # [ff, n] int8
             s2: jnp.ndarray,       # [n] f32
             b2: jnp.ndarray,       # [n] f32
             *, block_ff: int = 512,
             out_dtype=jnp.float32,
             interpret: bool = False) -> jnp.ndarray:
    """Returns [m, n] ``out_dtype``. ``ff`` must divide by ``block_ff``
    (the interface picks a divisor or falls back)."""
    m, k = x.shape
    k2, ff = w1q.shape
    ff2, n = w2q.shape
    assert k == k2 and ff == ff2, (x.shape, w1q.shape, w2q.shape)
    assert s1.shape == (ff,) and s2.shape == (n,), (s1.shape, s2.shape)
    assert b1.shape == (ff,) and b2.shape == (n,), (b1.shape, b2.shape)
    assert ff % block_ff == 0, (ff, block_ff)
    grid = (ff // block_ff,)
    f32 = jnp.float32
    return pl.pallas_call(
        _kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_ff), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_ff), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_ff), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_ff, n), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((m, n), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * ff + 2 * m * ff * n,
            bytes_accessed=(m * k * 2 + k * ff + ff * n
                            + m * n * jnp.dtype(out_dtype).itemsize
                            + (ff + n) * 8),
            transcendentals=0),
    )(x, w1q, s1.reshape(1, ff), b1.reshape(1, ff),
      w2q, s2.reshape(1, n), b2.reshape(1, n))
