"""Fused beam-candidate scoring + top-k Pallas kernel.

Reference has no counterpart (its beam prune is a per-utterance Python
``sorted`` — SURVEY.md §2.1 "Beam search"); the TPU redesign prunes with
``lax.top_k`` over the flattened [B, K·V] candidates (decoding/beam.py).
XProf at base decode shapes (B=32, K=5, V≈4k) showed that single ``top_k``
op costing ~101 us/step — 9.6 % of beam-decode device time — plus ~15 us
for the log-softmax / special-token-masking / add chain feeding it.

This kernel fuses the whole candidate step over the logits in one VMEM
pass: log-softmax -> mask <pad>/<sos> -> add beam scores -> iterative
per-row top-k2 extraction (max + min-index tie-break, matching
``lax.top_k``'s stable lowest-index-first order exactly). The per-row
winners (K·k2 per utterance) are merged to the global top-k2 by a tiny
[B, K·k2] ``lax.top_k`` outside the kernel — exact, because each row
contributes at most k2 entries to the global top-k2.

Iterative extraction is O(k2) VPU passes over a [B·K, V] block that lives
in VMEM the whole time (~2.7 MB at base shapes) — cheap next to a full
sort, which is what makes ``lax.top_k`` slow here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9


def _kernel(logits_ref, alive_ref, vals_ref, idx_ref, *, k2: int,
            pad_id: int, sos_id: int):
    x = logits_ref[:].astype(jnp.float32)              # [BK, V]
    bk, v = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bk, v), 1)

    # log-softmax per row (f32, numerically the same two-pass form XLA
    # lowers jax.nn.log_softmax to).
    m = jnp.max(x, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True)) + m
    x = x - lse
    # Never emit <pad>/<sos>; add the running beam score.
    banned = jnp.logical_or(col == pad_id, col == sos_id)
    x = jnp.where(banned, jnp.float32(NEG_INF), x)
    x = x + alive_ref[:]                               # [BK, 1] broadcast

    # k2 extractions: running max with min-index tie-break == the stable
    # lowest-index-first order of lax.top_k.
    for j in range(k2):
        mx = jnp.max(x, axis=1, keepdims=True)
        sel = x == mx
        ix = jnp.min(jnp.where(sel, col, jnp.int32(v)), axis=1,
                     keepdims=True)
        vals_ref[:, j:j + 1] = mx
        idx_ref[:, j:j + 1] = ix
        # Consume with -inf (NOT NEG_INF): a consumed cell must never tie
        # with real NEG_INF-scored candidates (banned tokens / dead rows),
        # or the same index would be re-extracted where lax.top_k returns
        # distinct ones (ADVICE r2: tiny-vocab saturation corner).
        x = jnp.where(col == ix, -jnp.inf, x)


def candidate_topk_rows(
    logits: jnp.ndarray,        # [BK, V] decode-step logits (f32)
    alive_rows: jnp.ndarray,    # [BK, 1] f32 running beam scores per row
    *,
    k2: int,
    pad_id: int,
    sos_id: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (vals [BK,k2] desc, vocab idx [BK,k2]) of the fused
    candidate scores. TPU Pallas; ``interpret=True`` for CPU goldens."""
    bk, v = logits.shape
    kern = functools.partial(_kernel, k2=k2, pad_id=pad_id, sos_id=sos_id)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((bk, k2), jnp.float32),
                   jax.ShapeDtypeStruct((bk, k2), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(logits.astype(jnp.float32), alive_rows.astype(jnp.float32))


def candidate_topk(
    logits: jnp.ndarray,        # [B·K, V]
    alive_scores: jnp.ndarray,  # [B, K]
    *,
    k2: int,
    pad_id: int = 0,
    sos_id: int = 1,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global (top_scores [B,k2], flat idx [B,k2] into K·V) — drop-in for
    ``lax.top_k(candidates.reshape(B, K·V), k2)`` on the fused candidate
    scores, bit-identical including tie order."""
    b, k = alive_scores.shape
    bk, v = logits.shape
    vals, vidx = candidate_topk_rows(
        logits, alive_scores.reshape(bk, 1), k2=k2, pad_id=pad_id,
        sos_id=sos_id, interpret=interpret)
    # Merge per-row winners: rows are ordered (beam0 rank0..k2-1, beam1 ...)
    # so position order == flat-index order within ties, matching the
    # single big top_k's stable ordering.
    vals = vals.reshape(b, k * k2)
    flat = (jnp.arange(k, dtype=jnp.int32)[None, :, None] * v
            + vidx.reshape(b, k, k2)).reshape(b, k * k2)
    top_vals, sel = jax.lax.top_k(vals, k2)
    top_idx = jnp.take_along_axis(flat, sel, axis=1)
    return top_vals, top_idx


def candidate_topk_reference(
    logits: jnp.ndarray,
    alive_scores: jnp.ndarray,
    *,
    k2: int,
    pad_id: int = 0,
    sos_id: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp reference path (any backend): the original decoding/beam.py
    inline formulation."""
    b, k = alive_scores.shape
    v = logits.shape[-1]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp = lp.at[:, pad_id].set(NEG_INF)
    lp = lp.at[:, sos_id].set(NEG_INF)
    cand = alive_scores[:, :, None] + lp.reshape(b, k, v)
    return jax.lax.top_k(cand.reshape(b, k * v), k2)
