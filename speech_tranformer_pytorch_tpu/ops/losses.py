"""Label-smoothed cross-entropy (reference: ``transformer/loss.py``
``LabelSmoothingLoss`` / ``cal_performance`` — SURVEY.md §2.1; smoothing
ε=0.1, ignore ``<pad>``, per-token normalisation).

TPU-first: one fused log-softmax + gather per batch, no one-hot
materialisation of the full [B,U,V] smoothed target distribution.

For smoothing ε over V classes with true class y::

  loss = (1-ε) * (-log p_y) + ε/(V-1) * Σ_{k≠y} (-log p_k)

computed from two reductions (the gathered true-class log-prob and the sum
of all log-probs) so the smoothed distribution is never built.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def label_smoothed_cross_entropy(
    logits: jnp.ndarray,        # [B, U, V] float
    targets: jnp.ndarray,       # [B, U] int32
    *,
    smoothing: float = 0.1,
    pad_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean per-token loss, valid-token count)."""
    vocab = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    true_lp = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    sum_lp = jnp.sum(log_probs, axis=-1)

    if smoothing > 0.0:
        off_weight = smoothing / (vocab - 1)
        on_weight = 1.0 - smoothing
        # Σ_{k≠y} -log p_k = -(sum_lp - true_lp)
        per_tok = -(on_weight * true_lp + off_weight * (sum_lp - true_lp))
    else:
        per_tok = -true_lp

    weights = (targets != pad_id).astype(jnp.float32)
    token_count = jnp.maximum(jnp.sum(weights), 1.0)
    loss = jnp.sum(per_tok * weights) / token_count
    return loss, token_count


def token_accuracy(logits: jnp.ndarray, targets: jnp.ndarray, *, pad_id: int = 0) -> jnp.ndarray:
    """Fraction of non-pad target tokens predicted correctly (argmax)."""
    preds = jnp.argmax(logits, axis=-1)
    weights = (targets != pad_id).astype(jnp.float32)
    correct = (preds == targets).astype(jnp.float32) * weights
    return jnp.sum(correct) / jnp.maximum(jnp.sum(weights), 1.0)
