"""Pallas int8-weight matmul for the autoregressive decode step.

The round-4 int8 study (BENCHMARKS.md) proved the mechanism — a
decode-shaped matmul chain runs 1.38-2.29x faster when HBM serves int8
weights — and then proved the production decode gets ZERO of it, because
XLA hoists the loop-invariant ``int8 -> bf16 * scale`` dequant out of the
``lax.scan`` and materializes the bf16 tree once: every step reads the
same bf16 bytes as the unquantized path. A Pallas kernel is the only way
to keep the weight stream int8 per step (VERDICT r4 next #1): nothing can
hoist a dequant that happens inside the kernel, on the VMEM tile, after
the HBM read.

Kernel: ``y[m, n] = (x[m, k] @ wq[k, n].astype(bf16)) * scale[n]``
- the int8 weight tile is converted AFTER the HBM->VMEM move, so HBM
  traffic for the weight stream is exactly the int8 bytes (the whole
  point);
- the MXU accumulates bf16 x bf16 -> f32; the per-output-channel scale
  multiplies the f32 accumulator (MORE accurate than the XLA dequant
  path, which rounds ``wq * scale`` to bf16 before the dot);
- grid over n tiles only: decode activations are a sliver
  ([B·K <= a few hundred, k]), so x stays fully VMEM-resident and each
  grid step streams one [k, block_n] weight tile.

Reference path (`int8_matmul_reference`) is the same math in jnp — used
off-TPU and in golden tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def int8_matmul_reference(x: jnp.ndarray, wq: jnp.ndarray,
                          scale: jnp.ndarray) -> jnp.ndarray:
    """jnp reference: same math at the ACTIVATION's precision (f32
    accumulate, f32 scale of the accumulator). An f32 model must keep f32
    operands here — force-casting to bf16 compounds per autoregressive
    step and wrecked an overfit f32 decode (r5 debugging note); the TPU
    kernel always runs bf16 operands because bf16 is the production
    compute dtype on the MXU (golden-tested at bf16)."""
    dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    acc = jnp.dot(x.astype(dt), wq.astype(dt),
                  preferred_element_type=jnp.float32)
    return acc * scale.astype(jnp.float32)[None, :]


def _kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)          # int8 -> bf16 in VMEM
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)  # [1,bn] bcast over m


@functools.partial(jax.jit,
                   static_argnames=("block_n", "out_dtype", "interpret"))
def int8_matmul(x: jnp.ndarray,       # [m, k] float
                wq: jnp.ndarray,      # [k, n] int8
                scale: jnp.ndarray,   # [n] f32 per-output-channel
                *, block_n: int = 512,
                out_dtype=jnp.float32,
                interpret: bool = False) -> jnp.ndarray:
    """Returns [m, n] ``out_dtype`` (f32 accumulate + f32 scale either
    way; ``out_dtype=bf16`` halves the output HBM write when the consumer
    is bf16 anyway). ``n`` must be divisible by the chosen block (the
    interface picks a divisor or falls back to the reference).
    ``interpret=True`` for CPU goldens."""
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2 and scale.shape == (n,), (x.shape, wq.shape, scale.shape)
    assert n % block_n == 0, (n, block_n)
    grid = (n // block_n,)
    osize = jnp.dtype(out_dtype).itemsize
    return pl.pallas_call(
        _kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k * n + m * n * osize + n * 4,
            transcendentals=0),
    )(x, wq, scale.reshape(1, n))
