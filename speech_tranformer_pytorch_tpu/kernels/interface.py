"""Dispatch layer between jnp reference ops and Pallas TPU kernels.

Each hot op exists twice: a jnp reference implementation (always available,
any backend) and a Pallas kernel (TPU). Golden tests pin the kernel to the
reference path (SURVEY.md §4). Selection: config flag + backend check, with
env-var kill switch ST_TPU_DISABLE_PALLAS=1.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _pallas_ok() -> bool:
    """THE Pallas dispatch predicate — every kernel call site (flash,
    candidate-topk, lineage, AND the fbank kernel in data/features.py) must
    route through this one function, so a backend-name change or the
    ST_TPU_DISABLE_PALLAS kill switch flips them all together. Two call
    sites disagreeing is an invisible perf regression: one kernel silently
    falls back while the others keep dispatching (VERDICT r3 weak #3)."""
    if os.environ.get("ST_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    return jax.default_backend() in ("tpu", "axon")


def flash_attention(
    q: jnp.ndarray,               # [B, T, H, D]
    k: jnp.ndarray,               # [B, S, H, D]
    v: jnp.ndarray,               # [B, S, H, D]
    *,
    bias: Optional[jnp.ndarray] = None,
    causal: bool = False,
    q_lengths: Optional[jnp.ndarray] = None,
    kv_lengths: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Flash attention entry point; falls back to the jnp path off-TPU, when
    attention dropout is active, or when shapes are too small to tile."""
    from ..models.modules import dot_product_attention

    use_kernel = (
        _pallas_ok()
        and (deterministic or dropout_rate == 0.0)
        and q.shape[1] >= 128 and k.shape[1] >= 128
        and q.shape[-1] in (32, 64, 128, 256)
    )
    if use_kernel:
        try:
            from .flash_attention import mha_flash
            return mha_flash(q, k, v, q_lengths=q_lengths,
                             kv_lengths=kv_lengths, causal=causal)
        except (NotImplementedError, ImportError):
            pass
    return dot_product_attention(
        q, k, v, bias, dropout_rng=dropout_rng,
        dropout_rate=dropout_rate, deterministic=deterministic)


def int8_dense_dispatchable(m: int, k: int, n: int) -> bool:
    """Should a [m,k]@[k,n] int8-weight dense use the Pallas decode kernel?

    SIZE-AWARE dispatch (measured on v5e, BENCHMARKS.md r5): the kernel
    wins only where the weight block is big enough for the int8 bandwidth
    cut to beat the extra Pallas launch + lost elementwise fusion. At the
    base config (blocks ≤ 1 MB; decode weights ~30% of per-step HBM
    traffic next to the KV/cross caches) ~30 kernel launches/step measured
    0.75-0.90x — SLOWER; at d_model=2048/d_ff=8192 (blocks 4-16 MB,
    weights dominate per-step traffic) the same dispatch measured 1.23x
    (beam-5) / 1.50x (greedy). Sub-threshold blocks must instead be
    dequantized into the weight tree and consumed by the PLAIN dense path
    (QuantDenseGeneral falls through) — the measured-neutral r4 behavior.
    Threshold override for re-tuning: ST_TPU_INT8_MIN_WEIGHT_BYTES.

    Also requires lane alignment (k, n multiples of 128) and a
    conservative VMEM fit (x block + double-buffered weight tiles +
    output block).
    """
    min_bytes = int(os.environ.get("ST_TPU_INT8_MIN_WEIGHT_BYTES",
                                   2 * 2 ** 20))
    if k % 128 != 0 or n % 128 != 0 or k * n < min_bytes:
        return False
    block_n = next(bn for bn in (512, 256, 128) if n % bn == 0)
    mp = -(-m // 16) * 16
    vmem = mp * k * 2 + 2 * k * block_n + mp * block_n * 4 + mp * n * 4
    return vmem <= 12 * 2 ** 20


def int8_dense(x: jnp.ndarray,       # [m, k] float (activation sliver)
               wq: jnp.ndarray,      # [k, n] int8 quantized kernel
               scale: jnp.ndarray,   # [n] f32 per-output-channel scale
               ) -> jnp.ndarray:
    """Int8-weight dense for the decode step: ``(x @ wq) * scale`` with the
    dequant INSIDE the kernel (kernels/int8_matmul.py) so the HBM weight
    stream stays int8 per decode step — XLA's dequant-fusion path hoists
    the loop-invariant ``int8 -> bf16`` out of the decode scan and reads
    bf16 bytes every step instead (measured, BENCHMARKS.md r4). jnp
    reference (identical math) off-TPU. Call only for shapes that pass
    ``int8_dense_dispatchable``; m (the activation rows, B·K at decode)
    is padded to the bf16 sublane tile here. Returns [m, n] in the
    activation dtype class (bf16 in, bf16 out; else f32) — f32
    accumulate + f32 scale either way.
    """
    from .int8_matmul import int8_matmul, int8_matmul_reference

    m, k = x.shape
    n = wq.shape[1]
    if _pallas_ok():
        block_n = next(bn for bn in (512, 256, 128) if n % bn == 0)
        mp = -(-m // 16) * 16
        # bf16 activations keep a bf16 output (consumer dtype; halves the
        # output write) — accumulation and scaling stay f32 inside.
        odt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        try:
            xp = x if mp == m else jnp.pad(x, ((0, mp - m), (0, 0)))
            out = int8_matmul(xp, wq, scale, block_n=block_n,
                              out_dtype=odt)
            return out if mp == m else out[:m]
        except (NotImplementedError, ImportError):
            pass
    return int8_matmul_reference(x, wq, scale)


def int8_ffn_dispatchable(m: int, k: int, ff: int, n: int) -> bool:
    """Should an int8-weight FFN use the fused Pallas kernel
    (kernels/int8_ffn.py)? One launch for ``relu(x@w1)@w2`` with the
    [m, ff] hidden kept in VMEM. Wins at smaller weight sizes than the
    per-matmul kernel because it also removes a launch and the hidden's
    HBM round-trip — the threshold covers the COMBINED weight bytes.
    Kill switch for A/B: ST_TPU_DISABLE_INT8_FFN=1."""
    if os.environ.get("ST_TPU_DISABLE_INT8_FFN") == "1":
        return False
    min_bytes = int(os.environ.get("ST_TPU_INT8_MIN_WEIGHT_BYTES",
                                   2 * 2 ** 20))
    if (k % 128 != 0 or ff % 128 != 0 or n % 128 != 0
            or k * ff + ff * n < min_bytes):
        return False
    block_ff = next(bf for bf in (512, 256, 128) if ff % bf == 0)
    mp = -(-m // 16) * 16
    vmem = (mp * k * 2 + 2 * (k * block_ff + block_ff * n)
            + mp * n * 8 + (ff + n) * 8)
    return vmem <= 12 * 2 ** 20


def int8_ffn(x, w1q, s1, b1, w2q, s2, b2):
    """Fused int8 FFN dispatch: Pallas kernel on TPU (call only for
    shapes passing ``int8_ffn_dispatchable``), jnp reference (identical
    math) elsewhere. Returns [m, n] in the activation's dtype class."""
    from .int8_ffn import int8_ffn as kernel
    from .int8_ffn import int8_ffn_reference

    m, k = x.shape
    ff = w1q.shape[1]
    n = w2q.shape[1]
    if _pallas_ok():
        block_ff = next(bf for bf in (512, 256, 128) if ff % bf == 0)
        mp = -(-m // 16) * 16
        odt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        try:
            xp = x if mp == m else jnp.pad(x, ((0, mp - m), (0, 0)))
            out = kernel(xp, w1q, s1, b1, w2q, s2, b2,
                         block_ff=block_ff, out_dtype=odt)
            return out if mp == m else out[:m]
        except (NotImplementedError, ImportError):
            pass
    return int8_ffn_reference(x, w1q, s1, b1, w2q, s2, b2)


def lineage_attention(q_new, self_k, self_v, lineage, index, beam_width):
    """Gather-free beam self-attention over the unpermuted KV cache
    (kernels/lineage_attention.py): fused Pallas kernel on TPU (native
    cache layout, no per-step relayout copy), jnp onehot-einsum reference
    elsewhere. Same values either way (weights rounded identically)."""
    from .lineage_attention import (lineage_attention as kernel,
                                    lineage_attention_reference)
    # OFF by default, MEASURED: the kernel compiles and is exact on-chip,
    # but its Mosaic-imposed shape (batch-only grid, H×C static loop of
    # tiny rank-2 dots with sublane slices) loses to XLA's batched
    # einsums — beam-5 B=32 63.1 vs 41.4 ms/batch, B=16 32.1 vs 23.7
    # (BENCHMARKS.md negative result). Opt-in for re-measurement on
    # future hardware/Mosaic: ST_TPU_LINEAGE_KERNEL=1.
    if _pallas_ok() and os.environ.get("ST_TPU_LINEAGE_KERNEL") == "1":
        try:
            return kernel(q_new, self_k, self_v, lineage, index, beam_width)
        except (NotImplementedError, ImportError):
            pass
    return lineage_attention_reference(q_new, self_k, self_v, lineage,
                                       index, beam_width)


def beam_candidate_topk(logits, alive_scores, *, k2, pad_id=0, sos_id=1):
    """Fused log-softmax + mask + beam-score add + top-k2 of the beam
    candidate scores (kernels/beam_prune.py); jnp reference off-TPU.
    Bit-identical results either way, including lax.top_k tie order."""
    from .beam_prune import candidate_topk, candidate_topk_reference
    # VMEM guard: the kernel keeps the whole [B·K, V] f32 block resident in
    # VMEM with no grid tiling, plus the [B·K, V] int32 iota, the banned
    # mask and exp/selection temps — count 5 input-sized live buffers
    # against the full ~16 MB budget (the earlier 3x/12 MB estimate
    # under-counted and let shapes just under the line fail at XLA compile
    # time, which the except below cannot catch). Production beam shapes
    # (B=32, K=5, V≈4.3k ≈ 2.8 MB/buffer → ~13.9 MB) still clear it.
    bk, v = logits.shape
    fits_vmem = bk * v * 4 * 5 <= 16 * 2 ** 20
    if _pallas_ok() and fits_vmem:
        try:
            return candidate_topk(logits, alive_scores, k2=k2,
                                  pad_id=pad_id, sos_id=sos_id)
        except (NotImplementedError, ImportError):
            pass
    return candidate_topk_reference(logits, alive_scores, k2=k2,
                                    pad_id=pad_id, sos_id=sos_id)
