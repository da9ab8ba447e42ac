"""Weights-only int8 post-training quantization for the decode path.

No reference analogue (the reference serves f32 torch weights). TPU-first
rationale: autoregressive decode is WEIGHT-bandwidth-bound — every decode
step re-reads the full decoder stack for a [B·K, d_model] activation
sliver. Storing kernels as int8 with per-output-channel f32 scales halves
the weight bytes, and XLA fuses the ``int8 -> bf16 * scale`` dequant into
the consuming dot's operand read — measured on-chip (BENCHMARKS.md r4):
2.29x on a decode-shaped matmul chain, 1.38x with the chain inside a
``lax.scan`` (the production decode shape; some hoisting, win survives).

Quantization scheme: symmetric per-output-channel (the kernel's LAST
axis), ``w ≈ round(w / s) * s`` with ``s = max|w| / 127`` reduced over
all non-last axes. Leaves that stay full precision: ndim < 2 (biases,
layernorm), integer leaves, and the decoder embedding (used both as a
gather table and — tied — as the output projection, where the two
orientations want different channel axes; 4.4 MB of ~50 MB, not worth
the asymmetry in v1).

Inference-only: training never sees quantized weights.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def _is_quantizable(path_str: str, leaf) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return False
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    if path_str.endswith("embed/embedding"):
        return False
    if path_str.endswith("/bias"):
        # DenseGeneral biases are multi-dim ([3,H,Dh] for fused qkv) and
        # slipped past the ndim<2 guard — int8 biases buy nothing (no
        # per-step weight-stream traffic to speak of) and the decode path
        # that keeps int8 leaves raw (decode_variables) must be able to
        # assume every int8 leaf is a KERNEL with a 'qscales' entry.
        # (Caught in r5: trained multi-dim biases reached the decode step
        # unscaled; random-init biases are zeros, which hid it.)
        return False
    return True


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def quantize_params(params: Any, *,
                    embedding_rows: bool = False) -> Tuple[Any, Any]:
    """Returns ``(qparams, scales)`` — two trees with the SAME structure as
    ``params``. Quantized leaves: int8 values + f32 scale (broadcastable,
    shape ``(1, ..., out)``); full-precision leaves: the leaf itself in
    ``qparams`` and ``None``-like zero-dim marker in ``scales``.

    ``scales`` uses a 0-d f32 NaN sentinel for non-quantized leaves so the
    tree stays jit-traceable (no Nones inside pytree leaves).

    ``embedding_rows``: also quantize the decoder embedding with PER-ROW
    scales (shape [V, 1], reduced over d_model). Per-row is the one
    orientation that serves BOTH of the tied embedding's uses — the
    per-token gather dequantizes row-wise, and in the logits matmul
    ``x @ emb.T`` the rows are the output channels (per-vocab-logit
    scale). At base the shared embedding is the logits matmul's whole
    weight stream (~4.4 MB bf16/step); int8 halves it.
    """
    def q(path, leaf):
        ps = _path_str(path)
        if ps.endswith("embed/embedding") and embedding_rows:
            w = jnp.asarray(leaf, jnp.float32)
            s = jnp.max(jnp.abs(w), axis=-1, keepdims=True) / 127.0  # [V,1]
            s = jnp.where(s == 0.0, 1.0, s)
            wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
            return wq, s.astype(jnp.float32)
        if not _is_quantizable(ps, leaf):
            return leaf, jnp.full((), jnp.nan, jnp.float32)
        w = jnp.asarray(leaf, jnp.float32)
        axes = tuple(range(w.ndim - 1))
        s = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / 127.0
        s = jnp.where(s == 0.0, 1.0, s)
        wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return wq, s.astype(jnp.float32)

    flat = jax.tree_util.tree_map_with_path(q, params)
    qparams = jax.tree.map(lambda pair: pair[0], flat,
                           is_leaf=lambda x: isinstance(x, tuple))
    scales = jax.tree.map(lambda pair: pair[1], flat,
                          is_leaf=lambda x: isinstance(x, tuple))
    return qparams, scales


def dequantize_params(qparams: Any, scales: Any, compute_dtype=jnp.bfloat16):
    """Inside-jit dequant: int8 leaves become ``q.astype(dt) * s`` (XLA
    fuses this into each consumer matmul's operand read — the int8 buffer
    is what HBM serves); full-precision leaves pass through."""
    def dq(q, s):
        if q.dtype == jnp.int8:
            return q.astype(compute_dtype) * s.astype(compute_dtype)
        return q
    return jax.tree.map(dq, qparams, scales)


def decode_variables(qparams: Any, scales: Any,
                     compute_dtype=jnp.bfloat16) -> Any:
    """Build the ``model.apply`` variables dict for int8 decoding.

    Two regimes, matched to where the bandwidth is:
      * **encoder** — runs ONCE per batch; weight reads are amortized over
        the whole utterance batch, so the XLA dequant-fusion path (which
        hoists/materializes a bf16 tree) is fine: dequantize up front.
      * **decoder** — re-read EVERY autoregressive step; kernels stay
        int8 and the per-channel scales ride the ``qscales`` collection,
        consumed by ``QuantDenseGeneral`` → the Pallas int8 kernel, which
        dequantizes on the VMEM tile after the HBM read (unhoistable).

    All non-quantized float leaves are cast to ``compute_dtype`` (same as
    the bf16 cast the non-int8 path applies at load)."""
    p, s = qparams["params"], scales["params"]

    def cast_f(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(compute_dtype)
        return leaf

    enc = jax.tree.map(cast_f,
                       dequantize_params(p["encoder"], s["encoder"],
                                         compute_dtype))
    dec = jax.tree.map(
        lambda q: q if q.dtype == jnp.int8 else cast_f(q), p["decoder"])
    params = dict(p, encoder=enc, decoder=dec)
    return {"params": params, "qscales": {"decoder": s["decoder"]}}


def max_abs_error(params: Any, qparams: Any, scales: Any) -> float:
    """Largest |w - dequant(w)| over all quantized leaves (≤ s/2 per
    channel by construction) — the accuracy-bound regression test hook."""
    worst = 0.0
    deq = dequantize_params(qparams, scales, jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(deq)):
        if hasattr(a, "ndim") and a.ndim >= 2:
            worst = max(worst, float(jnp.max(jnp.abs(
                jnp.asarray(a, jnp.float32) - b))))
    return worst
