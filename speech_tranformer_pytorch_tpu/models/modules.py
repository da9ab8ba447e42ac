"""Core model modules (flax).

Reference parity (SURVEY.md §2.1, source unreadable this session — semantics
per the Speech-Transformer paper and the repo family):
  * ``Conv2dSubsampling``  — 2×(Conv2d 3×3 stride 2 + ReLU) over (time,freq),
    4× time reduction, linear proj to d_model (ref ``transformer/module.py``).
  * ``PositionalEncoding`` — fixed sinusoidal PE + dropout.
  * ``MultiHeadAttention`` — ref wraps ``torch.nn.MultiheadAttention``; here
    a from-scratch einsum attention with an additive bias, routed through the
    Pallas flash-attention kernel when enabled.
  * ``FeedForward``        — Linear→ReLU→dropout→Linear.

TPU-first notes: activations run in bf16 (params f32), softmax/layernorm in
f32; all masks arrive as additive biases so XLA fuses them into the softmax;
shapes are static under jit.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dropout import Dropout, dropout_quantized


def sinusoidal_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """[max_len, d_model] fixed sinusoidal table (Vaswani et al., 2017)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: (d_model + 1) // 2])
    return pe.astype(np.float32)


class PositionalEncoding(nn.Module):
    d_model: int
    max_len: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool, offset: int = 0) -> jnp.ndarray:
        seq_len = x.shape[-2]
        if seq_len + offset > self.max_len:
            raise ValueError(
                f"sequence length {seq_len}+{offset} exceeds positional table "
                f"max_len={self.max_len}; raise model.max_source_positions/"
                f"max_target_positions or shorten data.max_target_len")
        pe = jnp.asarray(sinusoidal_position_encoding(self.max_len, self.d_model))
        x = x + pe[offset:offset + seq_len].astype(self.dtype)
        return Dropout(self.dropout_rate)(x, deterministic=deterministic)


def conv_output_length(length: jnp.ndarray, kernel: int = 3, stride: int = 2) -> jnp.ndarray:
    """VALID-conv output length: (L - kernel)//stride + 1, floored at 0."""
    return jnp.maximum((length - kernel) // stride + 1, 0)


def subsampled_lengths(frame_lens: jnp.ndarray) -> jnp.ndarray:
    """Length transform of the 2-layer 3×3/s2 subsampler."""
    return conv_output_length(conv_output_length(frame_lens))


class _PatchConv(nn.Module):
    """3×3/stride-2 VALID conv computed as strided-slice patches + one matmul.

    Exploratory im2col reformulation of the subsampler convs. MEASURED
    SLOWER in-model than XLA's conv emitter (45 ms vs 18 ms base train
    step): the 9 stride-2 slices + their backward pads each move the full
    activation at terrible lane utilisation (conv1's trailing channel dim
    is 1, so the [B,T,F,1] layout wastes 127/128 lanes). XLA's conv at
    these shapes is already near bandwidth-bound (~2 ms fwd+bwd of an
    18 ms step). Kept as a tested, checkpoint-compatible option
    (``subsample_impl='im2col'``) and a recorded negative result — see
    BENCHMARKS.md. Same math as the conv (summation order aside), same
    param tree (``kernel``/``bias`` with nn.Conv's shapes and inits).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # [B,T,F,C] NHWC
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        b, t, f, _ = x.shape
        t2 = (t - 3) // 2 + 1
        f2 = (f - 3) // 2 + 1
        # 9 strided slices, (dt, df) in C-order to match kernel.reshape.
        patches = [
            jax.lax.slice(x, (0, dt, df, 0),
                          (b, dt + 2 * (t2 - 1) + 1, df + 2 * (f2 - 1) + 1, cin),
                          (1, 2, 2, 1))
            for dt in range(3) for df in range(3)
        ]
        p = jnp.concatenate(patches, axis=-1)            # [B,T2,F2,9*Cin]
        (p, kernel, bias) = nn.dtypes.promote_dtype(
            p, kernel, bias, dtype=self.dtype)
        w = kernel.reshape(9 * cin, self.features)
        return jnp.einsum("btfk,kc->btfc", p, w) + bias


class _PhaseConv(nn.Module):
    """3×3/stride-2 VALID conv as even/odd *phase* decomposition + matmul.

    Second take on the im2col idea (see ``_PatchConv`` for the first,
    negative, result). The failure mode there was the nine stride-2
    ``lax.slice`` ops: each moves the whole activation at stride 2 along
    the *sublane* axes, which XLA lowers to slow strided copies (and slow
    pad-transposes in the backward). Here the stride-2 is expressed as a
    reshape into even/odd phases — ``[B,T,F,C] -> [B,T/2,2,F,C]`` — so
    every "slice" is a contiguous view along an axis XLA can relayout
    cheaply, and the backward is pad+reshape instead of a dilated conv.
    The nine (dt, df) patches then feed ONE [9·C_in -> C_out] matmul with
    a lane-aligned contraction (C_in ≥ 64 keeps the last dim on full
    lanes; for the C_in=1 first conv this layout is hopeless, which is why
    ``Conv2dSubsampling(impl='phase')`` keeps XLA conv for Conv_0 and uses
    this only for Conv_1). Same param tree / math as ``nn.Conv`` (VALID,
    summation order aside).

    MEASURED SLOWER in-model too (21.5 vs 17.6 ms base train step): the
    nine lane-axis concat pieces are 64-wide (half a 128-lane register),
    so building the [.., 9·64] patch tensor and its backward
    slice-pad-add chain still relayouts the full activation several
    times, outweighing the conv→matmul gain. Second recorded negative
    result for im2col-style subsampling (see also ``_PatchConv``); XLA's
    conv emitter stays the default.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # [B,T,F,C] NHWC
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        b, t, f, _ = x.shape
        t2 = (t - 3) // 2 + 1
        f2 = (f - 3) // 2 + 1

        def phases(y, axis, n_out):
            """even/odd interleave along ``axis``: returns (even, odd) with
            ``n_out + 1`` entries each (enough for the +1 shifted tap)."""
            pad_to = 2 * (n_out + 1)
            pads = [(0, 0)] * y.ndim
            pads[axis] = (0, pad_to - y.shape[axis])
            yp = jnp.pad(y, pads)
            shape = list(yp.shape)
            shape[axis:axis + 1] = [n_out + 1, 2]
            yr = yp.reshape(shape)
            even = jax.lax.index_in_dim(yr, 0, axis + 1, keepdims=False)
            odd = jax.lax.index_in_dim(yr, 1, axis + 1, keepdims=False)
            return even, odd

        te, to = phases(x, 1, t2)                        # [B,t2+1,F,C]
        # taps 2t+dt for dt=0,1,2 -> even[t], odd[t], even[t+1]
        t_taps = (te[:, :t2], to[:, :t2], te[:, 1:t2 + 1])
        patches = []
        for xt in t_taps:
            fe, fo = phases(xt, 2, f2)                   # [B,t2,f2+1,C]
            patches += [fe[:, :, :f2], fo[:, :, :f2], fe[:, :, 1:f2 + 1]]
        p = jnp.concatenate(patches, axis=-1)            # [B,t2,f2,9*Cin]
        (p, kernel, bias) = nn.dtypes.promote_dtype(
            p, kernel, bias, dtype=self.dtype)
        w = kernel.reshape(9 * cin, self.features)       # (dt,df,cin) C-order
        return jnp.einsum("btfk,kc->btfc", p, w) + bias


class Conv2dSubsampling(nn.Module):
    """[B,T,F] fbank -> [B,T//4,d_model] with recomputed lengths.

    ``impl``: ``'conv'`` = XLA ``lax.conv`` for both layers;
    ``'im2col'`` = strided-slice patches+matmul (recorded negative result,
    see ``_PatchConv``); ``'phase'`` = XLA conv for the C_in=1 Conv_0 +
    phase-decomposed patches+matmul (``_PhaseConv``) for the lane-aligned
    Conv_1 (also measured slower in-model — see ``_PhaseConv``; the
    Conv_1 backward it targets is 4.4% of the base step as XLA's
    dilated conv, but the patch relayouts cost more). All impls share one
    parameter tree
    (``Conv_0``/``Conv_1`` with nn.Conv layouts): checkpoints are
    interchangeable.
    """

    d_model: int
    channels: int = 64
    dtype: jnp.dtype = jnp.float32
    impl: str = "conv"

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = feats.astype(self.dtype)[..., None]                # [B,T,F,1] NHWC
        for i in range(2):
            if self.impl == "im2col":
                x = _PatchConv(self.channels, dtype=self.dtype,
                               name=f"Conv_{i}")(x)
            elif self.impl == "phase" and i == 1:
                x = _PhaseConv(self.channels, dtype=self.dtype,
                               name=f"Conv_{i}")(x)
            else:
                x = nn.Conv(self.channels, (3, 3), strides=(2, 2),
                            padding="VALID", dtype=self.dtype,
                            name=f"Conv_{i}")(x)
            x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return nn.Dense(self.d_model, dtype=self.dtype)(x)     # [B,T',d_model]


def _canon_tuple(x) -> Tuple[int, ...]:
    return tuple(x) if isinstance(x, (tuple, list)) else (x,)


class QuantDenseGeneral(nn.Module):
    """Drop-in ``nn.DenseGeneral`` with an int8 weights-only decode path.

    The parameter tree — names, shapes, dtypes AND init distribution (the
    flax flattened-fan ``kernel_init_wrap``) — is identical to
    ``nn.DenseGeneral``/``nn.Dense``, so checkpoints and seeded inits are
    interchangeable (tested in test_model.py). One behavioral addition:
    when the supplied kernel is **int8** (weights-only PTQ,
    ops/quantize.py) the matmul routes through the Pallas int8 kernel
    (``kernels/interface.int8_dense``) with the per-output-channel scale
    read from the ``qscales`` collection at this module's path. The
    dequant then happens inside the kernel, on the VMEM tile, after the
    HBM read — XLA cannot hoist it out of the decode scan, which is
    exactly what it does to the ``(wq * s).astype(bf16)`` dequant-fusion
    path (measured neutral, BENCHMARKS.md r4: the bf16 tree materializes
    once and HBM serves bf16 bytes every step).

    Restrictions vs nn.DenseGeneral (all call sites here comply): no
    batch_dims; contraction axes must be the trailing input axes
    (``axis=-1`` or ``(-2, -1)``).
    """

    features: int | Tuple[int, ...]
    axis: int | Tuple[int, ...] = -1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        features = _canon_tuple(self.features)
        ndim = inputs.ndim
        axis = tuple(sorted(ax % ndim for ax in _canon_tuple(self.axis)))
        n_axis, n_features = len(axis), len(features)
        if axis != tuple(range(ndim - n_axis, ndim)):
            raise ValueError(f"QuantDenseGeneral needs trailing contraction "
                             f"axes, got axis={self.axis} for ndim={ndim}")
        contract_dims = tuple(inputs.shape[ax] for ax in axis)
        kernel_shape = contract_dims + features

        def kernel_init_wrap(rng, shape, dtype=jnp.float32):
            # flax DenseGeneral flattens to 2D for fan-in/out, then
            # reshapes — replicated so init distributions match exactly.
            flat = (int(np.prod(shape[:n_axis])),
                    int(np.prod(shape[n_axis:])))
            return jnp.reshape(self.kernel_init(rng, flat, dtype), shape)

        kernel = self.param("kernel", kernel_init_wrap, kernel_shape,
                            jnp.float32)
        if self.use_bias:
            def bias_init_wrap(rng, shape, dtype=jnp.float32):
                flat = (int(np.prod(shape)),)
                return jnp.reshape(self.bias_init(rng, flat, dtype), shape)
            bias = self.param("bias", bias_init_wrap, features, jnp.float32)
        else:
            bias = None

        if kernel.dtype == jnp.int8:
            if not self.has_variable("qscales", "kernel"):
                raise ValueError(
                    "int8 kernel without a 'qscales' collection — build the "
                    "apply() variables with ops.quantize.decode_variables")
            scale = self.get_variable("qscales", "kernel")
            from ..kernels.interface import (int8_dense,
                                            int8_dense_dispatchable)
            k = int(np.prod(contract_dims))
            n = int(np.prod(features))
            lead = inputs.shape[:ndim - n_axis]
            m = int(np.prod(lead)) if lead else 1
            if int8_dense_dispatchable(m, k, n):
                scale_cols = jnp.broadcast_to(
                    jnp.asarray(scale, jnp.float32),
                    (1,) * n_axis + features).reshape(n)
                out = int8_dense(inputs.reshape(m, k), kernel.reshape(k, n),
                                 scale_cols)
                out = out.astype(self.dtype).reshape(lead + features)
                if bias is not None:
                    out = out + bias.astype(self.dtype)
                return out
            # Sub-threshold / unaligned block: dequantize the WEIGHT and
            # fall through to the exact plain-dense consumption below —
            # XLA hoists this loop-invariant dequant out of the decode
            # scan and the step reads the same bf16 bytes as an
            # unquantized model (the measured-NEUTRAL r4 behavior; every
            # in-scan reformulation measured 0.75-0.90x at base shapes,
            # BENCHMARKS.md r5).
            kernel = kernel.astype(jnp.float32) * jnp.asarray(
                scale, jnp.float32)

        inputs, kernel, bias = nn.dtypes.promote_dtype(
            inputs, kernel, bias, dtype=self.dtype)
        contract_ind = tuple(range(n_axis))
        out = jax.lax.dot_general(inputs, kernel,
                                  ((axis, contract_ind), ((), ())))
        if bias is not None:
            out = out + jnp.reshape(
                bias, (1,) * (out.ndim - n_features) + features)
        return out


@jax.custom_vjp
def _attn_core_bf16(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: jnp.ndarray) -> jnp.ndarray:
    """Attention core whose ONLY saved residual for AD is the bf16 weights.

    Plain AD of ``softmax → cast(bf16) → AV`` saves the f32 softmax output
    [B,H,T,S] and runs the whole softmax backward in f32 — at base encoder
    shapes that tensor is 64 MB/layer and its fwd residual copy + the f32
    backward elementwise passes measured ~1.9 ms of a 16 ms train step
    (XProf). Here forward materializes only the bf16 weights (XLA fuses
    softmax+cast into one pass once the f32 output has no other consumer)
    and backward recomputes ``dscores = w·(dw − Σ w·dw)`` from bf16 inputs
    with f32 arithmetic. Gradients therefore carry bf16 rounding of the
    weights — the same approximation every flash-attention backward makes
    (including ours, which recomputes p from bf16 q·k + logsumexp).

    No-dropout core: attention dropout (rate>0, training) falls back to the
    plain path in ``dot_product_attention``. ``bias`` is the additive mask
    built from lengths — its returned cotangent is zeros (masks are never
    trained through; documented contract, enforced nowhere cheaper).
    """
    out, _ = _attn_core_bf16_fwd(q, k, v, bias)
    return out


def _attn_core_bf16_fwd(q, k, v, bias):
    depth = q.shape[-1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(depth)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    w = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum("bhts,bshd->bthd", w, v.astype(jnp.bfloat16))
    return out.astype(q.dtype), (q, k, v, bias, w)


def _attn_core_bf16_bwd(res, dout):
    q, k, v, bias, w = res
    depth = q.shape[-1]
    doutb = dout.astype(jnp.bfloat16)
    dv = jnp.einsum("bhts,bthd->bshd", w, doutb).astype(v.dtype)
    dw = jnp.einsum("bthd,bshd->bhts", doutb, v.astype(jnp.bfloat16))
    w32 = w.astype(jnp.float32)
    dw32 = dw.astype(jnp.float32)
    di = jnp.sum(w32 * dw32, axis=-1, keepdims=True)        # [B,H,T,1]
    ds = (w32 * (dw32 - di) / math.sqrt(depth)).astype(jnp.bfloat16)
    dq = jnp.einsum("bhts,bshd->bthd", ds, k.astype(jnp.bfloat16)).astype(q.dtype)
    dk = jnp.einsum("bhts,bthd->bshd", ds, q.astype(jnp.bfloat16)).astype(k.dtype)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


_attn_core_bf16.defvjp(_attn_core_bf16_fwd, _attn_core_bf16_bwd)


def dot_product_attention(
    q: jnp.ndarray,               # [B, T, H, D]
    k: jnp.ndarray,               # [B, S, H, D]
    v: jnp.ndarray,               # [B, S, H, D]
    bias: Optional[jnp.ndarray],  # broadcastable to [B, H, T, S]
    *,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    bf16_weights: bool = False,
) -> jnp.ndarray:
    """jnp reference attention; softmax in f32 regardless of input dtype.

    ``bf16_weights`` routes through ``_attn_core_bf16`` (bf16-residual
    custom VJP) whenever no dropout is active."""
    if (bf16_weights and v.dtype == jnp.bfloat16
            and (deterministic or dropout_rate == 0.0 or dropout_rng is None)):
        return _attn_core_bf16(q, k, v, bias)
    depth = q.shape[-1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(depth)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        weights = dropout_quantized(dropout_rng, weights, dropout_rate)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", weights, v)


class MultiHeadAttention(nn.Module):
    """Self/cross MHA with separate q/kv inputs and additive bias mask.

    ``fused_qkv`` (self-attention only): one [d_model, 3, H, Dh] kernel
    replaces the three q/k/v projections — a single larger MXU matmul and
    one kernel launch instead of three (and one matmul per decode step
    instead of three on the KV-cache path).

    ``remat`` wraps the jnp attention core in ``jax.checkpoint`` so AD does
    NOT save the f32 softmax weights ([B,H,T,S] — 63 MB/layer at base
    encoder shapes) as backward residuals. Measured speed-NEUTRAL at base
    (17.4 vs 17.3 ms/step) and 11% slower at 3000 frames — the backward
    replay re-materializes the same f32 tensor it saved, so only the
    fwd-side copy is avoided. It IS a real activation-memory lever
    (-380 MB at base, -3.4 GB at 3000 frames), so it ships off by default
    as a memory option. Bit-exact gradients (the replay runs identical
    ops, incl. dropout bits from the same rng). The Pallas flash path
    gets the memory AND the traffic win via its logsumexp residuals.
    """

    num_heads: int
    d_model: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    fused_qkv: bool = False
    remat: bool = True
    bf16_weights: bool = False
    # attention_impl='ring' (config.py): shard the frame axis over the
    # 'model' mesh axis with shard_map ring attention (SURVEY.md §5
    # long-context). The mesh is a static module attribute threaded in by
    # the sharded step/decode builders; encoder self-attention only.
    use_ring: bool = False
    ring_mesh: Optional["jax.sharding.Mesh"] = None

    def setup(self):
        h, d = self.num_heads, self.d_model
        self.head_dim = d // h
        # QuantDenseGeneral == nn.DenseGeneral (same param tree/init) plus
        # the int8 decode-step path — see its docstring.
        dense = lambda name: QuantDenseGeneral(
            (h, self.head_dim), axis=-1, dtype=self.dtype, name=name)
        if self.fused_qkv:
            self.qkv_proj = QuantDenseGeneral(
                (3, h, self.head_dim), axis=-1, dtype=self.dtype, name="qkv")
        else:
            self.q_proj = dense("q")
            self.k_proj = dense("k")
            self.v_proj = dense("v")
        self.out_proj = QuantDenseGeneral(
            d, axis=(-2, -1), dtype=self.dtype, name="out")

    def project_qkv(
        self, x: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """q, k, v of a single input (the self-attention projection)."""
        if self.fused_qkv:
            qkv = self.qkv_proj(x)                    # [..., 3, H, Dh]
            return qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        return self.q_proj(x), self.k_proj(x), self.v_proj(x)

    def project_kv(self, kv_in: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.fused_qkv:
            _, k, v = self.project_qkv(kv_in)
            return k, v
        return self.k_proj(kv_in), self.v_proj(kv_in)

    def attend_bhsd(
        self,
        q_in: jnp.ndarray,           # [B, T, d_model]
        k: jnp.ndarray,              # [B, H, S, D] head-major cache layout
        v: jnp.ndarray,              # [B, H, S, D]
        bias: Optional[jnp.ndarray],  # broadcastable to [B, H, T, S]
    ) -> jnp.ndarray:
        """Cross-attention against a HEAD-MAJOR precomputed K/V cache.

        Decode-loop layout fix: ``attend`` consumes [B,S,H,D], but the
        batched score/AV dots want batch dims (b,h) leading, so XLA
        inserted a physical relayout COPY of the full cross K/V (8 MB per
        tensor per layer at base shapes) inside EVERY while-loop step —
        measured 44.6 us/layer/step, the single largest decode cost
        (XProf, B=32 beam-5). Storing the cache as [B,H,S,D] once at
        ``init_cache`` time makes the per-step dots layout-native; only the
        tiny [B,T,H,D] query transposes."""
        q = (self.project_qkv(q_in)[0] if self.fused_qkv
             else self.q_proj(q_in))                       # [B,T,H,D]
        depth = q.shape[-1]
        qb = q.transpose(0, 2, 1, 3)                       # [B,H,T,D] tiny
        scores = jnp.einsum("bhtd,bhsd->bhts", qb, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(depth)
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", weights, v)
        return self.out_proj(out.transpose(0, 2, 1, 3))

    def attend(
        self,
        q_in: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
        causal: bool = False,
        q_lengths: Optional[jnp.ndarray] = None,
        kv_lengths: Optional[jnp.ndarray] = None,
        q: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if q is None:
            q = (self.project_qkv(q_in)[0] if self.fused_qkv
                 else self.q_proj(q_in))
        rng = None
        if not deterministic and self.dropout_rate > 0.0:
            rng = self.make_rng("dropout")
        if self.use_ring:
            if self.ring_mesh is None:
                raise ValueError(
                    "attention_impl='ring' needs a device mesh: construct "
                    "the model with SpeechTransformer(cfg, mesh=mesh) (the "
                    "parallel.sharding step builders and "
                    "parallel.decode builders do this automatically)")
            if causal or kv_lengths is None:
                raise ValueError("ring attention supports only non-causal "
                                 "length-masked self-attention")
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
            from ..parallel.ring_attention import ring_self_attention
            batch_axis = (DATA_AXIS if DATA_AXIS in self.ring_mesh.axis_names
                          else None)
            # ring×flash composition: with use_flash also set, each ring
            # step's block runs the Pallas flash kernel instead of the jnp
            # einsum body (O(block) memory inside each shard).
            out = ring_self_attention(q, k, v, kv_lengths, self.ring_mesh,
                                      axis=MODEL_AXIS, batch_axis=batch_axis,
                                      body=("flash" if self.use_flash
                                            else "dot"))
        elif self.use_flash:
            from ..kernels.interface import flash_attention
            out = flash_attention(
                q, k, v, bias=bias, causal=causal,
                q_lengths=q_lengths, kv_lengths=kv_lengths,
                dropout_rng=rng, dropout_rate=self.dropout_rate,
                deterministic=deterministic,
            )
        else:
            fn = functools.partial(
                dot_product_attention,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                bf16_weights=self.bf16_weights)
            if self.remat:
                fn = jax.checkpoint(fn)
            out = fn(q, k, v, bias, dropout_rng=rng)
        return self.out_proj(out)

    def __call__(
        self,
        q_in: jnp.ndarray,
        kv_in: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
        causal: bool = False,
        q_lengths: Optional[jnp.ndarray] = None,
        kv_lengths: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.fused_qkv and q_in is kv_in:
            q, k, v = self.project_qkv(q_in)
        else:
            q, (k, v) = None, self.project_kv(kv_in)
        return self.attend(
            q_in, k, v, bias, deterministic=deterministic, causal=causal,
            q_lengths=q_lengths, kv_lengths=kv_lengths, q=q,
        )


class FeedForward(nn.Module):
    d_ff: int
    d_model: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool) -> jnp.ndarray:
        # Fused int8 FFN (kernels/int8_ffn.py): when BOTH kernels are int8
        # (decode_variables) and dropout is inactive, one Pallas launch
        # runs relu(x@w1)@w2 with the [m, d_ff] hidden VMEM-resident —
        # removes a launch plus the hidden's HBM round-trip on top of the
        # int8 weight stream.
        if (self.has_variable("params", "Dense_0")
                and (deterministic or self.dropout_rate == 0.0)):
            p0 = self.get_variable("params", "Dense_0")
            p1 = self.get_variable("params", "Dense_1")
            if (p0["kernel"].dtype == jnp.int8
                    and p1["kernel"].dtype == jnp.int8
                    and self.has_variable("qscales", "Dense_0")):
                from ..kernels.interface import (int8_ffn,
                                                 int8_ffn_dispatchable)
                lead, k = x.shape[:-1], x.shape[-1]
                m = int(np.prod(lead)) if lead else 1
                ff = p0["kernel"].shape[1]
                n = p1["kernel"].shape[1]
                if int8_ffn_dispatchable(m, k, ff, n):
                    s0 = self.get_variable("qscales", "Dense_0")["kernel"]
                    s1 = self.get_variable("qscales", "Dense_1")["kernel"]
                    out = int8_ffn(
                        x.reshape(m, k),
                        p0["kernel"], s0.reshape(ff).astype(jnp.float32),
                        p0["bias"].astype(jnp.float32),
                        p1["kernel"], s1.reshape(n).astype(jnp.float32),
                        p1["bias"].astype(jnp.float32))
                    return out.astype(self.dtype).reshape(lead + (n,))
        # Names pinned to nn.Dense's auto-names so pre-existing checkpoints
        # load unchanged (QuantDenseGeneral == nn.Dense param tree).
        x = QuantDenseGeneral(self.d_ff, dtype=self.dtype, name="Dense_0")(x)
        x = nn.relu(x)
        x = Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return QuantDenseGeneral(self.d_model, dtype=self.dtype,
                                 name="Dense_1")(x)


class LayerNorm(nn.Module):
    """LayerNorm with bf16 I/O; statistics accumulate in f32 inside the
    fused flax kernel (avoids materializing a full f32 copy of the
    activation — the explicit-cast version showed up as convert_reduce
    fusions at ~12% of the train step on the XProf trace)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
