"""SpecAugment (Park et al., 2019) — frequency + time masking on log-mel
features, jnp, applied inside the jit'd train step (Large/LibriSpeech
presets; the reference has no augmentation — SURVEY.md §5 lists this as a
build-side addition per BASELINE.json configs[2-3])."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SpecAugmentConfig


def _mask_axis(key: jax.Array, length: int, max_width: int,
               num_masks: int, max_total_frac: float) -> jnp.ndarray:
    """Boolean keep-mask [length] with ``num_masks`` random zero spans."""
    keys = jax.random.split(key, num_masks * 2)
    keep = jnp.ones((length,), bool)
    max_total = (int(length * max_total_frac)
                 if max_total_frac > 0 else length)
    budget = jnp.asarray(max_total, jnp.int32)
    pos = jnp.arange(length)
    for m in range(num_masks):
        width = jax.random.randint(keys[2 * m], (), 0, max_width + 1)
        width = jnp.minimum(width, budget)
        start = jax.random.randint(keys[2 * m + 1], (), 0,
                                   jnp.maximum(length - width, 1))
        span = (pos >= start) & (pos < start + width)
        keep = keep & ~span
        budget = budget - width
    return keep


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,        # [B, T, F]
    frame_lens: jnp.ndarray,   # [B]
    cfg: SpecAugmentConfig,
) -> jnp.ndarray:
    """Apply independent freq/time masks per utterance. Masked cells are
    set to 0 (features are CMVN'd, so 0 == per-utterance mean)."""
    if not cfg.enabled:
        return feats
    b, t, f = feats.shape

    def one(key, x, n_frames):
        kf, kt = jax.random.split(key)
        fmask = _mask_axis(kf, f, cfg.freq_mask_width, cfg.num_freq_masks, 0.0)
        # time-mask width scales with the utterance's valid length
        tw = jnp.minimum(cfg.time_mask_width,
                         jnp.maximum((n_frames * cfg.time_mask_max_frac)
                                     .astype(jnp.int32), 1))
        tmask = _mask_axis_dynamic(kt, t, tw, cfg.num_time_masks)
        return x * fmask[None, :].astype(x.dtype) * tmask[:, None].astype(x.dtype)

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, feats, frame_lens)


def _mask_axis_dynamic(key: jax.Array, length: int, max_width: jnp.ndarray,
                       num_masks: int) -> jnp.ndarray:
    keys = jax.random.split(key, num_masks * 2)
    keep = jnp.ones((length,), bool)
    pos = jnp.arange(length)
    for m in range(num_masks):
        width = jax.random.randint(keys[2 * m], (), 0, 10_000)
        width = jnp.mod(width, jnp.maximum(max_width, 1) + 1)
        start = jax.random.randint(keys[2 * m + 1], (), 0, length)
        span = (pos >= start) & (pos < start + width)
        keep = keep & ~span
    return keep
