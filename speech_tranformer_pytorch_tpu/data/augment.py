"""SpecAugment (Park et al., 2019) — frequency + time masking on log-mel
features, jnp, applied inside the jit'd train step (Large/LibriSpeech
presets; the reference has no augmentation — SURVEY.md §5 lists this as a
build-side addition per BASELINE.json configs[2-3]).

Round-5 policy upgrades (both property-tested):
- ``max_total_frac`` is enforced on BOTH axes: the summed widths of the
  masks on an axis never exceed that fraction of the axis's valid length,
  so a short utterance can never be fully masked no matter how
  ``num_time_masks × time_mask_width`` compares to its length.
- ``time_masks_per_frame`` (adaptive multiplicity, the paper's LibriSpeech
  "LD" refinement): the number of time masks actually applied scales with
  the utterance's valid frames — ``min(num_time_masks,
  floor(frames · per_frame))`` — instead of hitting 10 s and 30 s
  utterances with the same count. 0 keeps the fixed count.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import SpecAugmentConfig


def _mask_axis(
    key: jax.Array,
    length: int,                      # padded axis length (static)
    max_width,                        # int or scalar array
    num_masks: int,                   # static unroll count (= cap)
    *,
    budget=None,                      # scalar: total width allowed, or None
    n_active=None,                    # scalar: masks actually applied, or None
) -> jnp.ndarray:
    """Boolean keep-mask [length] with up to ``num_masks`` random zero spans.

    The loop is Python-unrolled (num_masks is static under jit); dynamic
    behavior — per-utterance width caps, the total-width budget, and the
    adaptive mask count — is expressed by clamping each span's width, so
    the same compiled program serves every utterance in the batch.
    """
    keys = jax.random.split(key, num_masks * 2)
    keep = jnp.ones((length,), bool)
    pos = jnp.arange(length)
    if budget is not None:
        budget = jnp.asarray(budget, jnp.int32)
    for m in range(num_masks):
        width = jax.random.randint(keys[2 * m], (), 0, 10_000)
        width = jnp.mod(width, jnp.asarray(max_width, jnp.int32) + 1)
        if n_active is not None:
            width = jnp.where(m < n_active, width, 0)
        if budget is not None:
            width = jnp.minimum(width, budget)
            budget = budget - width
        start = jax.random.randint(keys[2 * m + 1], (), 0, length)
        span = (pos >= start) & (pos < start + width)
        keep = keep & ~span
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
    frac = cfg.max_total_frac

    def one(key, x, n_frames):
        kf, kt = jax.random.split(key)
        fbudget = int(f * frac) if frac > 0 else None
        fmask = _mask_axis(kf, f, cfg.freq_mask_width, cfg.num_freq_masks,
                           budget=fbudget)
        # time-mask width scales with the utterance's valid length
        tw = jnp.minimum(cfg.time_mask_width,
                         jnp.maximum((n_frames * cfg.time_mask_max_frac)
                                     .astype(jnp.int32), 1))
        tbudget = ((n_frames * frac).astype(jnp.int32)
                   if frac > 0 else None)
        n_active = None
        if cfg.time_masks_per_frame > 0:
            n_active = jnp.maximum(
                (n_frames * cfg.time_masks_per_frame).astype(jnp.int32), 1)
        tmask = _mask_axis(kt, t, tw, cfg.num_time_masks,
                           budget=tbudget, n_active=n_active)
        return x * fmask[None, :].astype(x.dtype) * tmask[:, None].astype(x.dtype)

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, feats, frame_lens)
