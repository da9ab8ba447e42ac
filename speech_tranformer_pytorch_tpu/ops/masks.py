"""Mask builders (reference: ``transformer/utils.py`` ``get_pad_mask`` /
``get_subsequent_mask`` — SURVEY.md §2.1 "Masks"; source unreadable this
session, semantics per the repo family + paper).

Conventions (TPU-friendly):
  * masks are boolean, True = ATTENDABLE (keep), False = masked out.
  * attention bias is additive f32: 0 where attendable, large-negative where
    masked — XLA fuses the add into the softmax chain.
  * everything is static-shape; lengths are traced int32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

# Large negative, safe in bf16 (bf16 min normal ~ -3.39e38; we stay well
# inside to avoid inf arithmetic in softmax).
NEG_INF = -1e9


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] int32 lengths -> [B, max_len] bool, True for valid positions."""
    positions = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return positions < lengths[:, None]


def causal_mask(length: int) -> jnp.ndarray:
    """[length, length] bool lower-triangular (True = attendable)."""
    idx = jnp.arange(length, dtype=jnp.int32)
    return idx[None, :] <= idx[:, None]


def padding_attention_mask(q_len: int, kv_lengths: jnp.ndarray, kv_len: int) -> jnp.ndarray:
    """Key-padding mask broadcast over queries: [B, 1, q_len, kv_len] bool."""
    kv_valid = length_mask(kv_lengths, kv_len)            # [B, kv_len]
    return kv_valid[:, None, None, :] * jnp.ones((1, 1, q_len, 1), bool)


def self_attention_mask(lengths: jnp.ndarray, max_len: int, *, causal: bool = False) -> jnp.ndarray:
    """Combined pad (+ optional causal) self-attention mask [B,1,T,T]."""
    valid = length_mask(lengths, max_len)                  # [B, T]
    mask = valid[:, None, None, :] & valid[:, None, :, None]
    if causal:
        mask = mask & causal_mask(max_len)[None, None, :, :]
    return mask


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool mask -> additive attention bias (0 keep / NEG_INF drop)."""
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), NEG_INF, dtype))
