"""Noam / transformer LR schedule (reference: ``transformer/optimizer.py``
``TransformerOptimizer`` wrapping Adam — SURVEY.md §2.1):

  lr(step) = scale * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int, scale: float = 1.0) -> optax.Schedule:
    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype") else float(step), 1.0)
        return scale * d_model ** -0.5 * jnp.minimum(step ** -0.5, step * warmup_steps ** -1.5)
    return schedule


def make_optimizer(
    d_model: int,
    warmup_steps: int,
    *,
    scale: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-9,
    grad_clip_norm: float = 5.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam(β1, β2) under the Noam schedule with global-norm clipping."""
    schedule = noam_schedule(d_model, warmup_steps, scale)
    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay and weight_decay > 0:
        chain.append(optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(schedule, b1=b1, b2=b2, eps=eps))
    return optax.chain(*chain)
