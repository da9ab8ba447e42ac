"""Fused beam-lineage self-attention Pallas kernel (decode hot loop).

Reference has no counterpart (it re-runs the full prefix per step with no
KV cache at all — SURVEY.md §3.2); the TPU redesign's gather-free lineage
scheme (models/decoder.py ``_lineage_self_attention``) already removed the
per-step cache permute, but its jnp formulation pays two XLA costs the
fused kernel removes (the decoder layout note measured these):

  1. XLA relayouts the [B·K, L, H, D] cache to put the (b, h) batch dims
     of the rank-5 score/AV einsums leading — a physical copy of the full
     self-K AND self-V cache inside every decode step, per layer.
  2. The [B, K, C, L, H] all-lane score tensor and its onehot-select
     round-trip HBM in f32.

The kernel consumes the cache in its NATIVE activation layout with a
batch grid and a static in-kernel head loop (Mosaic requires the last two
block dims — here (H, D) — be full): each program reads its [K, L, H, D]
K/V tiles exactly once, computes the flat per-head [K, C·L] score matrix
with one rank-2 MXU dot, applies the lineage selection and position mask
as a VPU compare (a non-selected column's score is masked, so it
underflows to exact 0.0 in the softmax), and produces [K, D] outputs with
a second rank-2 dot. No relayout, no materialized all-lane score tensor,
one cache pass — the HBM floor for this op.

Exactness: for every (beam k, position j <= index) exactly one lane
column c == lineage[k, j] survives the mask, so the softmax over the flat
C·L axis equals the jnp path's softmax over L (the extra C·L - L masked
columns contribute exp(-1e9 - max) == 0.0 exactly in f32). Golden tests
pin kernel == reference in interpret mode (CPU) and compiled (TPU gate).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9


def _kernel(index_ref,            # [1] SMEM scalar: current position
            q_ref,                # [K, 1, H, D] this utterance's queries
            k_ref,                # [K, L, H, D] native-layout K cache tile
            v_ref,                # [K, L, H, D]
            lin_ref,              # [1, K, L] lineage table for this b
            out_ref,              # [K, 1, H, D]
            *, scale: float):
    # Mosaic requires the last two block dims be full (or (8,128)-tiled),
    # so the grid covers batch only and heads run as a static loop — the
    # per-head dots are rank-2 as Mosaic requires.
    kdim, l, h, d = k_ref.shape
    c = kdim                      # lanes == beams

    lane = jax.lax.broadcasted_iota(jnp.int32, (c, l), 0).reshape(1, c * l)
    pos = jax.lax.broadcasted_iota(jnp.int32, (c, l), 1).reshape(1, c * l)
    lin = lin_ref[0]                                       # [K, L] int32
    lin_flat = jnp.broadcast_to(lin[:, None, :], (kdim, c, l)).reshape(
        kdim, c * l)
    keep = jnp.logical_and(lin_flat == lane, pos <= index_ref[0])

    for hi in range(h):
        q = q_ref[:, 0, hi, :].astype(jnp.float32)         # [K, D]
        kc = k_ref[:, :, hi, :].astype(jnp.float32).reshape(c * l, d)
        vc = v_ref[:, :, hi, :].reshape(c * l, d)

        # [K, C·L] all-lane scores in ONE rank-2 MXU dot per head.
        scores = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(keep, scores, jnp.float32(NEG_INF))

        m = jnp.max(scores, axis=1, keepdims=True)
        w = jnp.exp(scores - m)                            # masked cols -> 0.0
        w = w / jnp.sum(w, axis=1, keepdims=True)
        # Round the weights to the cache dtype exactly like the jnp path
        # (it multiplies bf16 weights into the AV einsum) so kernel ==
        # reference to accumulation order.
        w = w.astype(v_ref.dtype).astype(jnp.float32)

        out = jax.lax.dot_general(
            w, vc.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [K, D]
        out_ref[:, 0, hi, :] = out.astype(out_ref.dtype)


def lineage_attention(
    q_new: jnp.ndarray,        # [B·K, 1, H, D] current-token queries
    self_k: jnp.ndarray,       # [B·K, L, H, D] unpermuted cache (incl. index)
    self_v: jnp.ndarray,       # [B·K, L, H, D]
    lineage: jnp.ndarray,      # [B, K, L] int32 ancestor lane table
    index: jnp.ndarray,        # scalar int32 current position
    beam_width: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused [B·K, 1, H, D] lineage attention output (pre-out_proj) —
    drop-in for the jnp path in ``DecoderLayer._lineage_self_attention``."""
    bk, l, h, d = self_k.shape
    kb = beam_width
    b = bk // kb
    scale = 1.0 / math.sqrt(d)
    kern = functools.partial(_kernel, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((bk, 1, h, d), self_v.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((kb, 1, h, d), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, l, h, d), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, l, h, d), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, l), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, 1, h, d), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(index, jnp.int32), (1,)), q_new, self_k,
      self_v, lineage.astype(jnp.int32))
    return out


def lineage_attention_reference(
    q_new: jnp.ndarray,
    self_k: jnp.ndarray,
    self_v: jnp.ndarray,
    lineage: jnp.ndarray,
    index: jnp.ndarray,
    beam_width: int,
) -> jnp.ndarray:
    """jnp reference (any backend): the original onehot-einsum formulation
    from models/decoder.py (see its docstring for the algebra)."""
    bk, L, h, d = self_k.shape
    c = beam_width
    b = bk // c
    q = q_new.reshape(b, c, h, d)
    kc = self_k.reshape(b, c, L, h, d)
    vc = self_v.reshape(b, c, L, h, d)
    scores_all = jnp.einsum("bkhd,bcjhd->bkcjh", q, kc,
                            preferred_element_type=jnp.float32)
    scores_all = scores_all / math.sqrt(d)
    onehot = (lineage[:, :, :, None]
              == jnp.arange(c, dtype=lineage.dtype)).astype(jnp.float32)
    scores = jnp.einsum("bkcjh,bkjc->bkjh", scores_all, onehot)
    pos_ok = jnp.arange(L) <= index
    scores = jnp.where(pos_ok[None, None, :, None], scores,
                       jnp.float32(NEG_INF))
    weights = jax.nn.softmax(scores, axis=2)
    w_sel = (weights.astype(vc.dtype)[:, :, None, :, :]
             * onehot.transpose(0, 1, 3, 2)[..., None].astype(vc.dtype))
    out = jnp.einsum("bkcjh,bcjhd->bkhd", w_sel, vc,
                     preferred_element_type=jnp.float32)
    return out.astype(vc.dtype).reshape(bk, 1, h, d)
