"""Cross-device beam-score exchange (BASELINE.json north-star: "beam
hypothesis state exchanged via collectives during sorted-beam pruning";
reference has no distributed decode — SURVEY.md §2.2 "Beam-state
exchange").

When decoding under tensor parallelism the per-step logits [B*K, V] are
sharded over the 'model' axis (vocab shards, from the TP-sharded output
projection). Sorted-beam pruning needs a GLOBAL top-k over K·V; gathering
full logits would move K·V·4 bytes per device. Instead each device:

  1. computes a LOCAL top-(2K) over its vocab shard (k·V/n work),
  2. all-gathers only those 2K (score, global-index) pairs over ICI,
  3. computes the global top-(2K) from the n·2K candidates.

This is exact (global top-m is always contained in the union of per-shard
top-m) and exchanges O(n·K) scalars instead of O(V).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS


def distributed_topk(
    scores: jnp.ndarray,        # [B, F] flattened K*V candidate scores
    k: int,
    mesh: Mesh,
    *,
    axis: str = MODEL_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global (values, indices) top-k of ``scores`` sharded on its last dim.

    ``scores`` must be shardable as P(None, axis). Returns replicated
    [B, k] values and GLOBAL flat indices, identical to
    ``jax.lax.top_k(scores, k)`` on the unsharded array.
    """
    n = mesh.shape[axis]
    f = scores.shape[-1]
    if f % n != 0:
        raise ValueError(f"candidate dim {f} not divisible by {axis}={n}")
    shard_f = f // n

    def local_fn(local):                       # local: [B, F/n]
        vals, idx = jax.lax.top_k(local, k)    # [B, k] each
        shard_id = jax.lax.axis_index(axis)
        gidx = idx + shard_id * shard_f        # globalize indices
        # Exchange only the candidate pairs (O(n*k) scalars over ICI).
        all_vals = jax.lax.all_gather(vals, axis, axis=-1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, axis, axis=-1, tiled=True)
        v, sel = jax.lax.top_k(all_vals, k)
        i = jnp.take_along_axis(all_idx, sel, axis=-1)
        return v, i

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=P(None, axis),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(scores)


def dp_split_utterances(n_utts: int, axis_size: int, axis_index: int) -> slice:
    """Contiguous utterance slice for a data-parallel decode worker."""
    per = -(-n_utts // axis_size)
    start = axis_index * per
    return slice(start, min(start + per, n_utts))
