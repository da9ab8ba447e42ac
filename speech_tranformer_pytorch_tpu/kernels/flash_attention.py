"""Pallas flash attention for TPU with frame-level (ragged-length) masking.

Replaces the reference's ``torch.nn.MultiheadAttention`` SDPA (SURVEY.md
§2.1 "Multi-head attention"; native-checklist row 2: "Pallas
flash-attention with frame-level masking") for encoder-self, decoder-self
(causal) and cross attention.

Design (see /opt/skills/guides/pallas_guide.md):
  * grid (B, H/G, Tq/block_q, Skv/block_k), kv-dim innermost & sequential;
    online softmax with fp32 m/l/acc scratch in VMEM.
  * **head grouping**: each grid step processes G heads (unrolled loop in
    the kernel). At speech sequence lengths (T'≈250 after 4× subsampling)
    a per-head grid is latency-bound — hundreds of tiny tile copies and
    only ~33 MFLOP per step; G=H collapses the grid ~8× and amortizes the
    per-step pipeline overhead. G is auto-chosen to fit a VMEM budget.
  * key-side ragged lengths via scalar-prefetched ``kv_lengths`` — padded
    frames are masked inside the kernel, and KV tiles entirely beyond the
    utterance length (or above the causal diagonal) are skipped, so MXU
    work scales with real frames, not padded frames.
  * block sizes adapt down to the (128-rounded) sequence length so short
    buckets don't pay for full 256/512 tiles of padding.
  * mask value -0.7*f32max (not -inf) to avoid exp(-inf - -inf) NaNs.
  * backward: two Pallas kernels (dKV with q innermost, dQ with kv
    innermost) recomputing p from the saved logsumexp — no stored scores.

Layout: inputs are [B, T, H, D] (framework convention); kernel runs on
[B, H, T, D].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
# Per-kernel VMEM ceiling. The scoped limit is 16 MiB; stay well under it
# because Pallas double-buffers every input/output tile across grid steps.
_VMEM_BUDGET = 12 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _pick_head_group(h: int, block_q: int, block_k: int, d: int,
                     itemsize: int, n_q_tiles: int = 1,
                     n_kv_tiles: int = 2, out_q_tiles: int = 1,
                     out_kv_tiles: int = 0, scratch_q: int = 3,
                     scratch_kv: int = 0, stat_q_tiles: int = 0) -> int:
    """Largest divisor of h fitting the VMEM budget.

    VMEM tiles are lane-padded: a [blk, d] tile occupies max(d, 128)
    lanes, and [blk, 1] stat tiles (lse/di) a full 128 lanes of f32.
    Input/output tiles are double-buffered by the pipeline; f32 scratch
    accumulators are single-buffered.
    """
    dp = max(d, LANES)
    per_head = (
        2 * (n_q_tiles * block_q + n_kv_tiles * block_k) * dp * itemsize
        + 2 * (out_q_tiles * block_q + out_kv_tiles * block_k) * dp * itemsize
        + (scratch_q * block_q + scratch_kv * block_k) * dp * 4
        + 2 * stat_q_tiles * block_q * LANES * 4)
    for g in range(h, 0, -1):
        if h % g == 0 and g * per_head <= _VMEM_BUDGET:
            return g
    return 1


def _adapt_blocks(tq: int, skv: int, block_q: int, block_k: int):
    """Shrink blocks to the 128-rounded sequence lengths (less tile padding)."""
    return (min(block_q, _round_up(tq, LANES)),
            min(block_k, _round_up(skv, LANES)))


def _fa_kernel(kv_len_ref,            # scalar-prefetch [B] int32
               q_ref, k_ref, v_ref,   # [1, G, blk, D]
               *refs,                 # o_ref [, lse_ref], m, l, acc scratch
               causal: bool, sm_scale: float, block_q: int,
               block_k: int, kv_steps: int, head_group: int,
               save_stats: bool = False):
    if save_stats:
        o_ref, lse_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kv_len = kv_len_ref[b]

    # Tile-level skip: beyond utterance length, or above causal diagonal.
    in_length = ki * block_k < kv_len
    if causal:
        below_diag = (qi + 1) * block_q - 1 >= ki * block_k
        should_run = jnp.logical_and(in_length, below_diag)
    else:
        should_run = in_length

    @pl.when(should_run)
    def _run():
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
            + ki * block_k
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
                + qi * block_q
            mask = jnp.logical_and(mask, col <= row)

        for g in range(head_group):
            q = q_ref[0, g]                          # [block_q, D]
            k = k_ref[0, g]                          # [block_k, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [block_q, block_k]
            s = s * sm_scale
            s = jnp.where(mask, s, MASK_VALUE)

            m_prev = m_ref[g]                        # [block_q, LANES]
            l_prev = l_ref[g]
            m_curr = jnp.max(s, axis=1, keepdims=True)        # [block_q, 1]
            m_next = jnp.maximum(m_prev,
                                 jnp.broadcast_to(m_curr, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)                  # [block_q, LANES]
            p = jnp.exp(s - m_next[:, :1])                    # [block_q, block_k]
            l_next = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), l_prev.shape)
            m_ref[g] = m_next
            l_ref[g] = l_next

            v = v_ref[0, g]                          # [block_k, D]
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)  # [bq, D]
            acc_ref[g] = acc_ref[g] * alpha[:, :1] + pv

    @pl.when(ki == kv_steps - 1)
    def _store():
        for g in range(head_group):
            l = l_ref[g][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, g] = (acc_ref[g] * l_inv).astype(o_ref.dtype)
            if save_stats:
                # logsumexp per row; safe for fully-masked rows (l == 0).
                m_col = m_ref[g][:, :1]
                lse_ref[0, g] = m_col + jnp.log(jnp.maximum(l, 1e-37))


def _flash_fwd_bhtd(
    q: jnp.ndarray,            # [B, H, Tq, D]
    k: jnp.ndarray,            # [B, H, Skv, D]
    v: jnp.ndarray,
    kv_lengths: jnp.ndarray,   # [B] int32
    *,
    causal: bool,
    block_q: int = 256,
    block_k: int = 512,
    save_stats: bool = False,
):
    b, h, tq, d = q.shape
    skv = k.shape[2]
    sm_scale = 1.0 / (d ** 0.5)
    block_q, block_k = _adapt_blocks(tq, skv, block_q, block_k)

    # Pad sequence dims to block multiples (padded KV is masked by length;
    # padded Q rows produce garbage rows that the caller slices away).
    tq_p = _round_up(tq, block_q)
    skv_p = _round_up(skv, block_k)
    if tq_p != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))

    g = _pick_head_group(h, block_q, block_k, d, q.dtype.itemsize,
                         stat_q_tiles=1 if save_stats else 0)
    kv_steps = skv_p // block_k
    grid = (b, h // g, tq_p // block_q, kv_steps)

    kernel = functools.partial(
        _fa_kernel, causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, kv_steps=kv_steps,
        head_group=g, save_stats=save_stats)

    out_shapes = [jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, g, block_q, d),
                              lambda b_, h_, q_, k_, *_: (b_, h_, q_, 0))]
    if save_stats:
        out_shapes.append(jax.ShapeDtypeStruct((b, h, tq_p, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((1, g, block_q, 1),
                                      lambda b_, h_, q_, k_, *_: (b_, h_, q_, 0)))

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, g, block_q, d),
                             lambda b_, h_, q_, k_, *_: (b_, h_, q_, 0)),
                pl.BlockSpec((1, g, block_k, d),
                             lambda b_, h_, q_, k_, *_: (b_, h_, k_, 0)),
                pl.BlockSpec((1, g, block_k, d),
                             lambda b_, h_, q_, k_, *_: (b_, h_, k_, 0)),
            ],
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((g, block_q, LANES), jnp.float32),   # m
                pltpu.VMEM((g, block_q, LANES), jnp.float32),   # l
                pltpu.VMEM((g, block_q, d), jnp.float32),       # acc
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        # Interpreter on CPU so golden tests run without a TPU (§4).
        interpret=(jax.default_backend() == "cpu"),
    )(kv_lengths.astype(jnp.int32), q, k, v)
    if save_stats:
        return outs[0][:, :, :tq, :], outs[1]   # lse stays padded (tq_p)
    return outs[0][:, :, :tq, :]




# ---------------------------------------------------------------------------
# Backward kernels (dKV: q-dim innermost; dQ: kv-dim innermost) — recompute
# p from saved logsumexp instead of storing the scores matrix; di =
# rowsum(o * do) precomputed once. Both head-grouped like the forward.
# ---------------------------------------------------------------------------

def _fa_bwd_dkv_kernel(kv_len_ref,
                       q_ref, k_ref, v_ref, g_ref, lse_ref, di_ref,
                       dk_ref, dv_ref,
                       dk_acc, dv_acc,
                       *, causal: bool, sm_scale: float, block_q: int,
                       block_k: int, q_steps: int, head_group: int):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kv_len = kv_len_ref[b]
    in_length = ki * block_k < kv_len
    if causal:
        # q tile contributes iff some of its rows are at/after this kv tile.
        relevant = (qi + 1) * block_q - 1 >= ki * block_k
        should_run = jnp.logical_and(in_length, relevant)
    else:
        should_run = in_length

    @pl.when(should_run)
    def _run():
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
            + ki * block_k
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
                + qi * block_q
            mask = jnp.logical_and(mask, col <= row)

        for g in range(head_group):
            q = q_ref[0, g].astype(jnp.float32)          # [bq, D]
            k = k_ref[0, g].astype(jnp.float32)          # [bk, D]
            v = v_ref[0, g].astype(jnp.float32)
            do = g_ref[0, g].astype(jnp.float32)         # dO [bq, D]
            lse = lse_ref[0, g]                          # [bq, 1]
            di = di_ref[0, g]                            # [bq, 1]

            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) \
                * sm_scale
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)   # [bq, bk]

            dv_acc[g] += jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # p^T @ g [bk, D]

            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - di)
            dk_acc[g] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # [bk, D]

    @pl.when(qi == q_steps - 1)
    def _store():
        for g in range(head_group):
            dk_ref[0, g] = dk_acc[g].astype(dk_ref.dtype)
            dv_ref[0, g] = dv_acc[g].astype(dv_ref.dtype)


def _fa_bwd_dq_kernel(kv_len_ref,
                      q_ref, k_ref, v_ref, g_ref, lse_ref, di_ref,
                      dq_ref,
                      dq_acc,
                      *, causal: bool, sm_scale: float, block_q: int,
                      block_k: int, kv_steps: int, head_group: int):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    kv_len = kv_len_ref[b]
    in_length = ki * block_k < kv_len
    if causal:
        below = (qi + 1) * block_q - 1 >= ki * block_k
        should_run = jnp.logical_and(in_length, below)
    else:
        should_run = in_length

    @pl.when(should_run)
    def _run():
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
            + ki * block_k
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
                + qi * block_q
            mask = jnp.logical_and(mask, col <= row)

        for g in range(head_group):
            q = q_ref[0, g].astype(jnp.float32)
            k = k_ref[0, g].astype(jnp.float32)
            v = v_ref[0, g].astype(jnp.float32)
            do = g_ref[0, g].astype(jnp.float32)
            lse = lse_ref[0, g]
            di = di_ref[0, g]

            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) \
                * sm_scale
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)

            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - di)
            dq_acc[g] += jnp.dot(ds, k,
                                 preferred_element_type=jnp.float32) * sm_scale

    @pl.when(ki == kv_steps - 1)
    def _store():
        for g in range(head_group):
            dq_ref[0, g] = dq_acc[g].astype(dq_ref.dtype)


def _flash_bwd_impl(q, k, v, o, g, lse, kv_lengths, *, causal: bool,
                    block_q: int = 256, block_k: int = 512,
                    interpret=None, dlse=None):
    b, h, tq, d = q.shape
    skv = k.shape[2]
    sm_scale = 1.0 / (d ** 0.5)
    block_q, block_k = _adapt_blocks(tq, skv, block_q, block_k)
    tq_p = _round_up(tq, block_q)
    skv_p = _round_up(skv, block_k)
    pad_q = ((0, 0), (0, 0), (0, tq_p - tq), (0, 0))
    pad_kv = ((0, 0), (0, 0), (0, skv_p - skv), (0, 0))
    qp = jnp.pad(q, pad_q) if tq_p != tq else q
    gp = jnp.pad(g, pad_q) if tq_p != tq else g
    op = jnp.pad(o, pad_q) if tq_p != tq else o
    kp = jnp.pad(k, pad_kv) if skv_p != skv else k
    vp = jnp.pad(v, pad_kv) if skv_p != skv else v

    # di = rowsum(o * dO), f32 [B,H,Tq_p,1]
    di = jnp.sum(op.astype(jnp.float32) * gp.astype(jnp.float32),
                 axis=-1, keepdims=True)
    if dlse is not None:
        # lse cotangent (the stats-returning entry point, used as the ring
        # per-block body): ∂lse_t/∂q_t = scale·Σ_s p_ts k_s and
        # ∂lse_t/∂k_s = scale·Σ_t p_ts q_t add ds_extra = p·dlse_t, which
        # folds into the existing ds = p·(dp − di) as di_eff = di − dlse —
        # the two backward kernels run UNCHANGED (dv has no lse term).
        di = di - dlse.astype(jnp.float32)   # dlse is [B,H,Tq_p,1] (padded)
    # Padded q rows must not contribute to dk/dv: p==0 via lse=+big.
    if tq_p != tq:
        row_ok = (jnp.arange(tq_p) < tq)[None, None, :, None]
        lse = jnp.where(row_ok, lse, 1e30)

    interp = (jax.default_backend() == "cpu") if interpret is None else interpret
    kv_steps = skv_p // block_k
    q_steps = tq_p // block_q
    lens = kv_lengths.astype(jnp.int32)
    # One head-group for both bwd kernels: dKV streams q/do in, writes
    # dk/dv tiles with 2 kv-sized f32 accumulators; dQ streams k/v in,
    # writes dq with 1 q-sized accumulator. Take the tighter of the two.
    hg = min(
        _pick_head_group(h, block_q, block_k, d, q.dtype.itemsize,
                         n_q_tiles=2, n_kv_tiles=2, out_q_tiles=0,
                         out_kv_tiles=2, scratch_q=0, scratch_kv=2,
                         stat_q_tiles=2),
        _pick_head_group(h, block_q, block_k, d, q.dtype.itemsize,
                         n_q_tiles=2, n_kv_tiles=2, out_q_tiles=1,
                         out_kv_tiles=0, scratch_q=1, scratch_kv=0,
                         stat_q_tiles=2),
    )

    # ---- dKV: grid (B, H/G, KV, Q) — q innermost accumulation.
    dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, causal=causal,
                          sm_scale=sm_scale, block_q=block_q,
                          block_k=block_k, q_steps=q_steps, head_group=hg),
        out_shape=(jax.ShapeDtypeStruct(kp.shape, q.dtype),
                   jax.ShapeDtypeStruct(vp.shape, q.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hg, kv_steps, q_steps),
            in_specs=[
                pl.BlockSpec((1, hg, block_q, d),
                             lambda b_, h_, k_, q_, *_: (b_, h_, q_, 0)),  # q
                pl.BlockSpec((1, hg, block_k, d),
                             lambda b_, h_, k_, q_, *_: (b_, h_, k_, 0)),  # k
                pl.BlockSpec((1, hg, block_k, d),
                             lambda b_, h_, k_, q_, *_: (b_, h_, k_, 0)),  # v
                pl.BlockSpec((1, hg, block_q, d),
                             lambda b_, h_, k_, q_, *_: (b_, h_, q_, 0)),  # g
                pl.BlockSpec((1, hg, block_q, 1),
                             lambda b_, h_, k_, q_, *_: (b_, h_, q_, 0)),  # lse
                pl.BlockSpec((1, hg, block_q, 1),
                             lambda b_, h_, k_, q_, *_: (b_, h_, q_, 0)),  # di
            ],
            out_specs=(
                pl.BlockSpec((1, hg, block_k, d),
                             lambda b_, h_, k_, q_, *_: (b_, h_, k_, 0)),
                pl.BlockSpec((1, hg, block_k, d),
                             lambda b_, h_, k_, q_, *_: (b_, h_, k_, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((hg, block_k, d), jnp.float32),
                pltpu.VMEM((hg, block_k, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interp,
    )(lens, qp, kp, vp, gp, lse, di)

    # ---- dQ: grid (B, H/G, Q, KV) — kv innermost accumulation.
    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, causal=causal,
                          sm_scale=sm_scale, block_q=block_q,
                          block_k=block_k, kv_steps=kv_steps, head_group=hg),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hg, q_steps, kv_steps),
            in_specs=[
                pl.BlockSpec((1, hg, block_q, d),
                             lambda b_, h_, q_, k_, *_: (b_, h_, q_, 0)),
                pl.BlockSpec((1, hg, block_k, d),
                             lambda b_, h_, q_, k_, *_: (b_, h_, k_, 0)),
                pl.BlockSpec((1, hg, block_k, d),
                             lambda b_, h_, q_, k_, *_: (b_, h_, k_, 0)),
                pl.BlockSpec((1, hg, block_q, d),
                             lambda b_, h_, q_, k_, *_: (b_, h_, q_, 0)),
                pl.BlockSpec((1, hg, block_q, 1),
                             lambda b_, h_, q_, k_, *_: (b_, h_, q_, 0)),
                pl.BlockSpec((1, hg, block_q, 1),
                             lambda b_, h_, q_, k_, *_: (b_, h_, q_, 0)),
            ],
            out_specs=pl.BlockSpec((1, hg, block_q, d),
                                   lambda b_, h_, q_, k_, *_: (b_, h_, q_, 0)),
            scratch_shapes=[pltpu.VMEM((hg, block_q, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interp,
    )(lens, qp, kp, vp, gp, lse, di)

    return (dq[:, :, :tq, :], dk[:, :, :skv, :], dv[:, :, :skv, :])


def _reference_bhtd(q, k, v, kv_lengths, *, causal):
    """jnp reference with identical mask semantics (backward + goldens)."""
    d = q.shape[-1]
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) / (d ** 0.5)
    skv = k.shape[2]
    tq = q.shape[2]
    col = jnp.arange(skv)[None, None, None, :]
    mask = col < kv_lengths[:, None, None, None]
    if causal:
        row = jnp.arange(tq)[None, None, :, None]
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_bhtd(q, k, v, kv_lengths, causal):
    return _flash_fwd_bhtd(q, k, v, kv_lengths, causal=causal)


def _fwd(q, k, v, kv_lengths, causal):
    o, lse = _flash_fwd_bhtd(q, k, v, kv_lengths, causal=causal,
                             save_stats=True)
    return o, (q, k, v, o, lse, kv_lengths)


def _bwd(causal, res, g):
    q, k, v, o, lse, kv_lengths = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, o, g, lse, kv_lengths,
                                 causal=causal)
    return dq, dk, dv, None


_flash_attention_bhtd.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Stats-returning entry point: (o, lse) with full VJP — the per-block body
# for ring attention (parallel/ring_attention.py body='flash'): ring merges
# per-block outputs with the standard logsumexp combine, so it needs each
# block's lse, and training needs gradients THROUGH that combine. The lse
# cotangent needs no new kernels (see _flash_bwd_impl's di_eff fold).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_stats_bhtd(q, k, v, kv_lengths, causal):
    return _flash_fwd_bhtd(q, k, v, kv_lengths, causal=causal,
                           save_stats=True)


def _fwd_stats(q, k, v, kv_lengths, causal):
    o, lse = _flash_fwd_bhtd(q, k, v, kv_lengths, causal=causal,
                             save_stats=True)
    return (o, lse), (q, k, v, o, lse, kv_lengths)


def _bwd_stats(causal, res, cot):
    do, dlse = cot
    q, k, v, o, lse, kv_lengths = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, o, do, lse, kv_lengths,
                                 causal=causal, dlse=dlse)
    return dq, dk, dv, None


_flash_stats_bhtd.defvjp(_fwd_stats, _bwd_stats)


def flash_block_stats(
    q: jnp.ndarray,            # [B, H, T, D]
    k: jnp.ndarray,            # [B, H, S, D]
    v: jnp.ndarray,
    kv_lengths: jnp.ndarray,   # [B] int32 valid key count (from index 0)
    *,
    causal: bool = False,
):
    """Differentiable flash attention returning ``(o, lse)`` in kernel
    layout [B, H, T, D]; ``lse`` is [B, H, T_pad, 1] f32 (query rows padded
    to the q-block multiple — slice to T before combining). Rows whose keys
    are fully masked return o=0 and lse≈MASK_VALUE (a very negative FINITE
    number), so a logsumexp merge over blocks needs no -inf special cases."""
    return _flash_stats_bhtd(q, k, v, kv_lengths.astype(jnp.int32), causal)


def mha_flash(
    q: jnp.ndarray,            # [B, T, H, D]
    k: jnp.ndarray,            # [B, S, H, D]
    v: jnp.ndarray,
    *,
    q_lengths: Optional[jnp.ndarray] = None,   # informational (rows sliced
    kv_lengths: Optional[jnp.ndarray] = None,  # by caller / loss-masked)
    causal: bool = False,
) -> jnp.ndarray:
    """Flash attention entry point in framework layout [B, T, H, D]."""
    if kv_lengths is None:
        kv_lengths = jnp.full((q.shape[0],), k.shape[1], jnp.int32)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    ot = _flash_attention_bhtd(qt, kt, vt, kv_lengths, causal)
    return jnp.transpose(ot, (0, 2, 1, 3))
