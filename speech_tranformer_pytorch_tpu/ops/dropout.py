"""TPU-native dropout via u8 RngBitGenerator bits.

``flax.linen.Dropout`` draws a full uniform word per element
(``jax.random.bernoulli`` -> u32 bits -> f32 compare). On the base train
step those bit tensors and their layout copies measured ~10% of step time
(XProf: u32[B,T,2048] RNG outputs + copy-done). A keep/drop decision needs
8 bits: draw u8, keep iff ``bits >= q`` with ``q = round(256*rate)``, and
scale by ``256/(256-q)``. The realized keep-probability is exactly
``(256-q)/256`` and the inverse scale matches it, so the estimator stays
unbiased; the configured rate is quantized to 1/256 granularity
(0.1 -> 0.1015625), inconsequential for regularization.

Drop-in replacement for ``nn.Dropout`` at this framework's call sites
(same ``rate`` field, ``deterministic`` kwarg, and ``"dropout"`` RNG
collection; no params, so checkpoint trees are unchanged).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def dropout_quantized(rng: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Functional u8-bits dropout (training mode)."""
    q = int(round(rate * 256.0))
    if q <= 0:
        return x
    if q >= 256:
        return jnp.zeros_like(x)
    bits = jax.random.bits(rng, x.shape, jnp.uint8)
    keep = bits >= jnp.uint8(q)
    scale = jnp.asarray(256.0 / (256.0 - q), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


class Dropout(nn.Module):
    """u8-bits dropout module (see module docstring)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 deterministic: bool,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if rng is None:
            rng = self.make_rng("dropout")
        return dropout_quantized(rng, x, self.rate)
