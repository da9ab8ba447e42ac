"""Ring attention over the frame axis (SURVEY.md §5 "Long-context": shard
the encoder frame axis over the 'model' mesh axis with shard_map, rotating
K/V blocks around the ICI ring with ``lax.ppermute`` while accumulating
online-softmax statistics; reference has nothing comparable).

Used for the Large/Sharded long-bucket configs when a single chip cannot
hold the full [T, T] attention workspace. Flag-gated via
``model.attention_impl='ring'`` (config.py), which routes encoder
self-attention through :func:`ring_self_attention`; numerically equal to
full attention (golden-tested on the fake 8-device mesh, standalone and
in-model).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS


def _ring_attention_local(q, k, v, kv_len_local, *, axis: str, scale: float):
    """Per-device body: q [B, Tq/n, H, D] local; k/v local blocks rotate."""
    n = jax.lax.psum(1, axis)
    my = jax.lax.axis_index(axis)
    block = k.shape[1]

    m = jnp.full(q.shape[:2] + q.shape[2:3], -jnp.inf, jnp.float32)  # [B,Tq,H]
    l = jnp.zeros_like(m)
    o = jnp.zeros(q.shape, jnp.float32)

    def step(carry, i):
        m, l, o, k_blk, v_blk, len_blk = carry
        src = (my - i) % n                      # which shard this block is
        s = jnp.einsum("bthd,bshd->bths", q, k_blk,
                       preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        # len_blk: number of valid frames in this block (per batch)
        valid = col < len_blk[:, None, None, None]
        s = jnp.where(valid, s, -1e30)

        m_curr = jnp.max(s, axis=-1)                         # [B,Tq,H]
        m_new = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(valid, p, 0.0)
        l_new = alpha * l + jnp.sum(p, axis=-1)
        o_new = alpha[..., None] * o + jnp.einsum(
            "bths,bshd->bthd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32)

        perm = [(j, (j + 1) % n) for j in range(n)]
        k_next = jax.lax.ppermute(k_blk, axis, perm)
        v_next = jax.lax.ppermute(v_blk, axis, perm)
        len_next = jax.lax.ppermute(len_blk, axis, perm)
        return (m_new, l_new, o_new, k_next, v_next, len_next), None

    (m, l, o, _, _, _), _ = jax.lax.scan(
        step, (m, l, o, k, v, kv_len_local), jnp.arange(n))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (o / l_safe[..., None]).astype(q.dtype)


def _ring_attention_local_flash(q, k, v, kv_len_local, *, axis: str):
    """Per-device body with the Pallas flash kernel as the per-block core
    (SURVEY.md §5 "blockwise Pallas attention ... ring variant"): each ring
    step runs ``flash_block_stats`` on the resident K/V block — O(block)
    memory, MXU-tiled, padding-tile skipping — and merges its (o, lse) into
    the running result with the standard logsumexp combine. Differentiable:
    the block op carries a full custom VJP (lse cotangent folds into the
    flash backward's di), and scan/ppermute transpose automatically.

    Numerics: equals the jnp dot body up to f32 summation order (the same
    ~2e-4 rtol as ring-vs-full attention)."""
    from ..kernels.flash_attention import flash_block_stats

    n = jax.lax.psum(1, axis)
    b, t, h, d = q.shape
    qt = jnp.transpose(q, (0, 2, 1, 3))               # [B,H,Tq,D] once
    o = jnp.zeros((b, h, t, d), jnp.float32)
    # Finite very-negative init (not -inf): fully-masked rows keep lse
    # near MASK_VALUE on every block, and logaddexp of two finite numbers
    # never produces the (-inf) - (-inf) NaN.
    lse = jnp.full((b, h, t, 1), -0.7 * jnp.finfo(jnp.float32).max,
                   jnp.float32)

    def step(carry, _):
        o, lse, k_blk, v_blk, len_blk = carry
        kt = jnp.transpose(k_blk, (0, 2, 1, 3))
        vt = jnp.transpose(v_blk, (0, 2, 1, 3))
        o_b, lse_b = flash_block_stats(qt, kt, vt, len_blk)
        lse_b = lse_b[:, :, :t, :]
        lse_new = jnp.logaddexp(lse, lse_b)
        o_new = (jnp.exp(lse - lse_new) * o
                 + jnp.exp(lse_b - lse_new) * o_b.astype(jnp.float32))
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_next = jax.lax.ppermute(k_blk, axis, perm)
        v_next = jax.lax.ppermute(v_blk, axis, perm)
        len_next = jax.lax.ppermute(len_blk, axis, perm)
        return (o_new, lse_new, k_next, v_next, len_next), None

    (o, lse, _, _, _), _ = jax.lax.scan(
        step, (o, lse, k, v, kv_len_local), None, length=n)
    # Fully-masked rows: every block returned o=0, so o is already 0 there.
    return jnp.transpose(o, (0, 2, 1, 3)).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,             # [B, T, H, D]
    k: jnp.ndarray,             # [B, S, H, D]
    v: jnp.ndarray,
    kv_lengths: jnp.ndarray,    # [B] valid frame counts
    mesh: Mesh,
    *,
    axis: str = MODEL_AXIS,
    batch_axis: Optional[str] = None,
    body: str = "dot",
) -> jnp.ndarray:
    """Frame-axis-sharded attention; equals full softmax(QK^T)V with
    key-padding masking. S must be divisible by the ring size.

    ``batch_axis`` additionally shards the batch dim over that mesh axis
    (the in-model DP×ring layout: batch over 'data', frames over 'model');
    ``None`` replicates the batch over every non-ring axis.

    ``body`` selects the per-block core: 'dot' (jnp einsum, materializes
    per-block f32 scores) or 'flash' (the Pallas kernel per block — O(T)
    memory inside each shard, composes ring with flash).
    """
    n = mesh.shape[axis]
    b, t, h, d = q.shape
    s = k.shape[1]
    if s % n != 0 or t % n != 0:
        raise ValueError(f"seq dims ({t},{s}) must divide ring size {n}")
    block = s // n
    scale = 1.0 / (d ** 0.5)

    # Per-shard valid lengths: shard j holds frames [j*block, (j+1)*block).
    shard_starts = jnp.arange(n) * block
    len_per_shard = jnp.clip(kv_lengths[:, None] - shard_starts[None, :],
                             0, block)          # [B, n]

    if body == "flash":
        body_fn = functools.partial(_ring_attention_local_flash, axis=axis)
    elif body == "dot":
        body_fn = functools.partial(_ring_attention_local, axis=axis,
                                    scale=scale)
    else:
        raise ValueError(f"ring body must be 'dot' or 'flash', got {body!r}")
    fn = shard_map(
        lambda q_, k_, v_, lens_: body_fn(q_, k_, v_, lens_[:, 0]),
        mesh=mesh,
        in_specs=(P(batch_axis, axis), P(batch_axis, axis),
                  P(batch_axis, axis), P(batch_axis, axis)),
        out_specs=P(batch_axis, axis),
        check_vma=False,
    )
    return fn(q, k, v, len_per_shard)


def ring_self_attention(
    q: jnp.ndarray,             # [B, T, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,       # [B] valid frame counts
    mesh: Mesh,
    *,
    axis: str = MODEL_AXIS,
    batch_axis: Optional[str] = None,
    body: str = "dot",
) -> jnp.ndarray:
    """Encoder self-attention entry point: pads the frame axis up to a
    multiple of the ring size (subsampled speech lengths are rarely
    divisible), runs :func:`ring_attention`, slices back. Padded *key*
    columns are masked via ``lengths``; padded *query* rows produce zeros
    (``l==0`` guard) and are discarded by the slice."""
    n = mesh.shape[axis]
    t = q.shape[1]
    t_pad = ((t + n - 1) // n) * n
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    out = ring_attention(q, k, v, lengths, mesh, axis=axis,
                         batch_axis=batch_axis, body=body)
    return out[:, :t] if t_pad != t else out
