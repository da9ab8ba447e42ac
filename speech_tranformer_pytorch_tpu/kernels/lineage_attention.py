"""Fused beam-lineage self-attention Pallas kernel (decode hot loop).

Reference has no counterpart (it re-runs the full prefix per step with no
KV cache at all — SURVEY.md §3.2); the TPU redesign's gather-free lineage
scheme (models/decoder.py ``_lineage_self_attention``) already removed the
per-step cache permute, but its jnp formulation still materializes the
[B, K, C, L, H] all-lane score tensor and its onehot round-trips in HBM,
and XLA relayouts the cache for the rank-5 einsums (decoder layout note).

The kernel consumes the cache in its NATIVE [B·K, L, H, D] activation
layout, gridded over batch. Mosaic constraints shaped every choice:

  * last-two block dims must be full → grid covers batch only; heads and
    lanes run as static in-kernel loops over rank-2 dots;
  * sublane→lane shape casts are unsupported → NO in-kernel reshapes or
    broadcasts: the lineage one-hot + position mask is precomputed once
    per decode step in XLA as a tiny [B, C, K, L] bool (shared by all
    layers and heads; ~6 KB/utterance at beam 5, L=512), and queries
    arrive pre-transposed [B, H, K, D] so every slice is on leading dims;
  * per (head, lane): scores_c = q_h · K_c^T (rank-2 MXU dot), masked
    accumulation (each valid position matches exactly one lane), softmax
    over L, then out_h = Σ_c (w·keep_c) · V_c.

One pass over the cache per step — the HBM floor for this op — with no
relayout and no materialized all-lane tensor. Exactness: golden tests pin
kernel == jnp reference in interpret mode (CPU) and compiled on the chip
(tests/test_perf_gate.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9


def _kernel(q_ref,                # [1, H, K, D] queries, pre-transposed
            k_ref,                # [K, L, H, D] native-layout K cache tile
            v_ref,                # [K, L, H, D]
            keep_ref,             # [1, C, K, L] bool lineage+position mask
            out_ref,              # [1, H, K, D]
            *, scale: float):
    kdim, l, h, d = k_ref.shape
    c = kdim                      # lanes == beams

    for hi in range(h):
        q = q_ref[0, hi].astype(jnp.float32)               # [K, D]
        scores = jnp.zeros((kdim, l), jnp.float32)
        for ci in range(c):
            kc = k_ref[ci, :, hi, :].astype(jnp.float32)   # [L, D]
            s = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [K, L]
            scores = scores + jnp.where(keep_ref[0, ci], s, 0.0)
        # Positions with no selected lane (j > index) have an all-False
        # mask column -> score 0 above; send them to -inf for the softmax.
        any_keep = keep_ref[0, 0]
        for ci in range(1, c):
            any_keep = jnp.logical_or(any_keep, keep_ref[0, ci])
        scores = jnp.where(any_keep, scores, jnp.float32(NEG_INF))

        m = jnp.max(scores, axis=1, keepdims=True)
        w = jnp.exp(scores - m)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        # Round the weights to the cache dtype exactly like the jnp path
        # (it multiplies cache-dtype weights into the AV einsum) so
        # kernel == reference to accumulation order.
        w = w.astype(v_ref.dtype).astype(jnp.float32)

        out = jnp.zeros((kdim, d), jnp.float32)
        for ci in range(c):
            vc = v_ref[ci, :, hi, :].astype(jnp.float32)   # [L, D]
            wc = jnp.where(keep_ref[0, ci], w, 0.0)
            out = out + jax.lax.dot_general(
                wc, vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [K, D]
        out_ref[0, hi] = out.astype(out_ref.dtype)


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

    # Tiny XLA-side prep (shared across layers when XLA CSEs the decode
    # step, and across heads always): [B, H, K, D] queries and the
    # [B, C, K, L] lineage-selection & position mask.
    q_t = q_new.reshape(b, kb, h, d).transpose(0, 2, 1, 3)
    lanes = jnp.arange(kb, dtype=lineage.dtype)
    keep = (lineage[:, None, :, :] == lanes[None, :, None, None])
    keep = jnp.logical_and(
        keep, (jnp.arange(l) <= index)[None, None, None, :])

    kern = functools.partial(_kernel, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, h, kb, d), self_v.dtype),
        in_specs=[
            pl.BlockSpec((1, h, kb, d), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, l, h, d), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, l, h, d), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, kb, l), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, kb, d), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q_t, self_k, self_v, keep)
    # [B, H, K, D] -> [B·K, 1, H, D]
    return out.transpose(0, 2, 1, 3).reshape(bk, 1, h, d)


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
