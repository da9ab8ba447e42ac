"""Noam / transformer LR schedule (reference: ``transformer/optimizer.py``
``TransformerOptimizer`` wrapping Adam — SURVEY.md §2.1):

  lr(step) = scale * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)

Also the typed-moment Adam transform (``scale_by_adam_typed``): the
optimizer update is the measured HBM-bandwidth floor of the train step
(~1.9 ms at base config — BENCHMARKS.md "fused Adam"), and most of that
traffic is the f32 mu/nu read+write. Storing the moments in bfloat16
halves it; the moments are computed in f32 each step and rounded on store,
so the param update itself is full-precision given the stored state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int, scale: float = 1.0) -> optax.Schedule:
    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype") else float(step), 1.0)
        return scale * d_model ** -0.5 * jnp.minimum(step ** -0.5, step * warmup_steps ** -1.5)
    return schedule


def scale_by_adam_typed(
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-9,
    moment_dtype: str = "float32",
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` semantics with mu AND nu stored in
    ``moment_dtype`` (optax's own ``mu_dtype`` covers only the first
    moment). With float32 this matches optax bit-for-bit (tested); with
    bfloat16 the stored moments are rounded after each f32 update step —
    the update applied at step t is exact given the (rounded) state."""
    dt = jnp.dtype(moment_dtype)
    b1, b2, eps = float(b1), float(b2), float(eps)

    def init(params):
        z = lambda: jax.tree.map(lambda p: jnp.zeros_like(p, dtype=dt), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=z(), nu=z())

    def update(updates, state, params=None):
        del params
        count_inc = optax.safe_increment(state.count)
        t = count_inc.astype(jnp.float32)
        c1 = 1.0 / (1.0 - jnp.float32(b1) ** t)
        c2 = 1.0 / (1.0 - jnp.float32(b2) ** t)

        def upd(g, mu, nu):
            g32 = g.astype(jnp.float32)
            mu2 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
            nu2 = b2 * nu.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
            u = (mu2 * c1) / (jnp.sqrt(nu2 * c2) + eps)
            return u.astype(g.dtype), mu2.astype(dt), nu2.astype(dt)

        out = jax.tree.map(upd, updates, state.mu, state.nu)
        pick = lambda i: jax.tree.map(lambda o: o[i], out,
                                      is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), optax.ScaleByAdamState(count=count_inc, mu=pick(1),
                                               nu=pick(2))

    return optax.GradientTransformation(init, update)


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
    moment_dtype: str = "float32",
) -> optax.GradientTransformation:
    """Adam(β1, β2) under the Noam schedule with global-norm clipping.

    ``moment_dtype='bfloat16'`` swaps in :func:`scale_by_adam_typed` so the
    optimizer state (mu AND nu) is stored half-width (train.moment_dtype)."""
    schedule = noam_schedule(d_model, warmup_steps, scale)
    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if jnp.dtype(moment_dtype) != jnp.float32:
        chain.append(scale_by_adam_typed(b1=b1, b2=b2, eps=eps,
                                         moment_dtype=moment_dtype))
        if weight_decay and weight_decay > 0:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_learning_rate(schedule))
    elif weight_decay and weight_decay > 0:
        chain.append(optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(schedule, b1=b1, b2=b2, eps=eps))
    return optax.chain(*chain)
