"""Speech-Transformer decoder (reference: ``transformer/decoder.py``
``Decoder.forward`` / ``recognize_beam`` — SURVEY.md §2.1; embed·√d + PE →
N×{masked self-MHA, cross-MHA, FFN} → output projection → logits).

Two execution modes, both static-shape:
  * ``__call__``    — teacher-forced full-sequence (training / scoring).
  * ``decode_step`` — single-token step with an explicit KV-cache pytree,
    driven by ``lax.scan`` in decoding/{greedy,beam}.py. The reference
    repo family re-runs the full prefix each step (no KV cache — SURVEY.md
    §3.2); the cache drops per-step cost from O(L²) to O(L).

Cache layout (per layer l), where the step batch is ``B·K`` rows (K = beam
width, K=1 for greedy):
  self_k/self_v   : [B·K, max_len, H, D]  written at position ``index``
  cross_k/cross_v : [B, H, S, D]  head-major, precomputed once from memory

The cross cache is HEAD-MAJOR (batch dims of the per-step attention dots
leading) because it is write-once/read-every-step — the one-time transpose
at init makes every decode-step dot layout-native. The self cache stays in
the activation-natural [rows, L, H, D] layout: the head-major variant was
tried and measured SLOWER (see ``_lineage_self_attention`` layout note).

Cross K/V are beam-INVARIANT, so they are stored untiled and the K beams
fold into the query rows of cross-attention (attention over S is
independent per query position, so this is exact). At base config this is
the dominant decode-step HBM traffic — tiled-per-beam would be ≈ 246
MB/step vs 49 MB untiled at B=16, K=5, S=250 — a ~5× cut on the biggest
stream. The reference re-runs the full prefix per step instead (SURVEY.md
§3.2); nothing upstream stores a tiled cross cache to compare against.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import masks as mask_ops
from ..ops.dropout import Dropout
from .modules import (FeedForward, LayerNorm, MultiHeadAttention,
                      PositionalEncoding, sinusoidal_position_encoding)

Cache = Dict[str, jnp.ndarray]


class DecoderLayer(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype

    def setup(self):
        cfg = self.cfg
        self.self_attn = MultiHeadAttention(
            cfg.num_heads, cfg.d_model,
            dropout_rate=cfg.attention_dropout_rate, dtype=self.dtype,
            use_flash=cfg.use_flash_attention, fused_qkv=cfg.fused_qkv,
            remat=cfg.attention_remat,
            bf16_weights=cfg.attention_bf16_weights,
            name="self_attn")
        self.cross_attn = MultiHeadAttention(
            cfg.num_heads, cfg.d_model,
            dropout_rate=cfg.attention_dropout_rate, dtype=self.dtype,
            use_flash=cfg.use_flash_attention, remat=cfg.attention_remat,
            bf16_weights=cfg.attention_bf16_weights,
            name="cross_attn")
        self.ffn = FeedForward(cfg.d_ff, cfg.d_model, cfg.dropout_rate, self.dtype)
        self.ln1 = LayerNorm(self.dtype)
        self.ln2 = LayerNorm(self.dtype)
        self.ln3 = LayerNorm(self.dtype)
        self.drop = Dropout(cfg.dropout_rate)

    def __call__(
        self,
        x: jnp.ndarray,             # [B, U, d_model]
        self_bias: jnp.ndarray,     # [B, 1, U, U] causal+pad
        memory: jnp.ndarray,        # [B, S, d_model]
        cross_bias: jnp.ndarray,    # [B, 1, U, S] memory pad
        tgt_lens: jnp.ndarray,
        mem_lens: jnp.ndarray,
        deterministic: bool = True,  # static (remat static_argnums=(-1,))
    ) -> jnp.ndarray:
        det = deterministic
        drop = lambda y: self.drop(y, deterministic=det)
        if self.cfg.normalize_before:
            h = self.ln1(x)
            x = x + drop(self.self_attn(h, h, self_bias, deterministic=det,
                                        causal=True, q_lengths=tgt_lens,
                                        kv_lengths=tgt_lens))
            h = self.ln2(x)
            x = x + drop(self.cross_attn(h, memory, cross_bias, deterministic=det,
                                         q_lengths=tgt_lens, kv_lengths=mem_lens))
            h = self.ln3(x)
            x = x + drop(self.ffn(h, deterministic=det))
        else:
            x = self.ln1(x + drop(self.self_attn(x, x, self_bias, deterministic=det,
                                                 causal=True, q_lengths=tgt_lens,
                                                 kv_lengths=tgt_lens)))
            x = self.ln2(x + drop(self.cross_attn(x, memory, cross_bias,
                                                  deterministic=det,
                                                  q_lengths=tgt_lens,
                                                  kv_lengths=mem_lens)))
            x = self.ln3(x + drop(self.ffn(x, deterministic=det)))
        return x

    # ----- step decoding ---------------------------------------------------

    def init_layer_cache(self, memory: jnp.ndarray, batch: int, max_len: int,
                         int8_kv: bool = False) -> Cache:
        """``memory`` is UNtiled [B,S,d]; ``batch`` is the step batch B·K.
        Caches come out head-major (module docstring): the one-time
        transpose here buys relayout-free attention dots in every decode
        step.

        ``int8_kv`` stores cross K/V as int8 with per-(B,H,1,D) f32
        scales (symmetric, reduced over the frame axis). The cross cache
        is write-once/read-every-step and the single largest per-step
        decode HBM stream at base shapes (~49 MB at B=16 — module
        docstring); the per-step dequant in ``decode_step`` sits inside
        the scan body so XLA fuses it into the attention dots' operand
        reads and HBM serves the int8 bytes (the same fusion behavior
        measured for int8 weights, BENCHMARKS.md r5)."""
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.d_model // cfg.num_heads
        ck, cv = self.cross_attn.project_kv(memory)           # [B,S,H,D]
        zeros = jnp.zeros((batch, max_len, h, d), self.dtype)
        cache = {"self_k": zeros, "self_v": jnp.zeros_like(zeros),
                 "cross_k": ck.transpose(0, 2, 1, 3),         # [B,H,S,D]
                 "cross_v": cv.transpose(0, 2, 1, 3)}
        if int8_kv:
            def q(t):
                s = (jnp.max(jnp.abs(t.astype(jnp.float32)), axis=2,
                             keepdims=True) / 127.0)
                s = jnp.where(s == 0.0, 1.0, s)
                tq = jnp.clip(jnp.round(t.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                return tq, s.astype(jnp.float32)
            cache["cross_k"], cache["cross_k_scale"] = q(cache["cross_k"])
            cache["cross_v"], cache["cross_v_scale"] = q(cache["cross_v"])
        return cache

    def decode_step(
        self,
        x: jnp.ndarray,            # [B·K, 1, d_model] current position
        cache: Cache,
        index: jnp.ndarray,        # scalar int32 current position
        cross_bias: jnp.ndarray,   # [B, 1, 1, S]
        beam_width: int = 1,       # static: K beams per utterance
        lineage: jnp.ndarray | None = None,   # [B, K, max_len] int32
    ) -> Tuple[jnp.ndarray, Cache]:
        max_len = cache["self_k"].shape[1]

        def self_attend(h):
            # One fused matmul gives q of the current token AND its k/v
            # cache entries (three matmuls on the unfused path).
            q_new, k_new, v_new = self.self_attn.project_qkv(h)  # [B·K,1,H,D]
            self_k = jax.lax.dynamic_update_slice_in_dim(
                cache["self_k"], k_new.astype(cache["self_k"].dtype), index, axis=1)
            self_v = jax.lax.dynamic_update_slice_in_dim(
                cache["self_v"], v_new.astype(cache["self_v"].dtype), index, axis=1)
            if lineage is not None and beam_width > 1:
                out = self._lineage_self_attention(
                    q_new, self_k, self_v, lineage, index, beam_width)
                return self.self_attn.out_proj(out), self_k, self_v
            # Mask future (unwritten) cache slots.
            pos_ok = jnp.arange(max_len) <= index                 # [max_len]
            bias = mask_ops.mask_to_bias(pos_ok)[None, None, None, :]
            out = self.self_attn.attend(h, self_k, self_v, bias, q=q_new)
            return out, self_k, self_v

        def cross_attend(h):
            # Fold the K beams into query rows: [B·K,1,d] -> [B,K,d]. Exact
            # (per-query-position independence); reads cross K/V once per
            # utterance per step instead of once per beam.
            bk, _, d = h.shape
            b = bk // beam_width
            ck, cv = cache["cross_k"], cache["cross_v"]
            if ck.dtype == jnp.int8:
                # In-scan dequant: fuses into the attention dots' operand
                # reads, so HBM serves the int8 cache bytes per step (see
                # init_layer_cache).
                dt = self.dtype
                ck = ck.astype(dt) * cache["cross_k_scale"].astype(dt)
                cv = cv.astype(dt) * cache["cross_v_scale"].astype(dt)
            out = self.cross_attn.attend_bhsd(
                h.reshape(b, beam_width, d), ck, cv, cross_bias)
            return out.reshape(bk, 1, d)

        if self.cfg.normalize_before:
            h = self.ln1(x)
            sa, self_k, self_v = self_attend(h)
            x = x + sa
            h = self.ln2(x)
            x = x + cross_attend(h)
            h = self.ln3(x)
            x = x + self.ffn(h, deterministic=True)
        else:
            sa, self_k, self_v = self_attend(x)
            x = self.ln1(x + sa)
            x = self.ln2(x + cross_attend(x))
            x = self.ln3(x + self.ffn(x, deterministic=True))
        new_cache = dict(cache, self_k=self_k, self_v=self_v)
        return x, new_cache

    def _lineage_self_attention(
        self,
        q_new: jnp.ndarray,        # [B·K, 1, H, D] current-token queries
        self_k: jnp.ndarray,       # [B·K, L, H, D] UNpermuted cache (incl. pos index)
        self_v: jnp.ndarray,       # [B·K, L, H, D]
        lineage: jnp.ndarray,      # [B, K, L] int32: physical lane of beam k's
                                   #   step-j ancestor (identity at j >= index)
        index: jnp.ndarray,        # scalar int32
        beam_width: int,
    ) -> jnp.ndarray:
        """Gather-free beam self-attention over an unpermuted KV cache.

        The classic batched beam search physically reorders the whole
        self-attention KV cache by ``src_beam`` every step — at base decode
        shapes that gather (read+write of [B·K,L,H,D] × 2 × layers) was 32 %
        of device time (XProf). Here the cache is never permuted; instead a
        tiny lineage table says which *physical lane* wrote beam ``k``'s
        step-``j`` entry, and attention selects across lanes algebraically:

          scores_all[b,k,c,j,h] = q[b,k]·K[b,c,j]          (all-lane scores)
          scores[b,k,j,h]       = Σ_c scores_all·1[lineage[b,k,j]=c]
          out[b,k]              = Σ_{c,j} (w·1[lineage=c])·V[b,c,j]

        The extra compute is a factor-K on the score/AV einsums — at K=5,
        L≤~200 that is O(10 MFLOP)/layer/step, noise next to the matmuls —
        while the dominant HBM stream drops from 3 passes over the cache
        (gather read+write, attend read) to 1. Exact: each (k,j) selects
        exactly one lane term, so values equal the gathered-cache attention
        up to f32-accumulation order.

        Layout note (measured, head-major rejected): XLA relayouts the
        cache to [B,H,C,L,D] for these (b,h)-batched dots, a per-step copy.
        Storing the cache head-major to pre-empt the copy made things WORSE
        — XLA then lowered the rank-5 dots through slow window emitters and
        re-inserted full-cache bitcast copies (beam-5 B=32: 55.4 -> 70.2
        ms/batch). The activation-natural layout + relayout copy is the
        faster XLA lowering; removing the copy for real needs a kernel that
        consumes the native layout — which is exactly what
        ``kernels/lineage_attention.py`` does on TPU (one (b, h)-gridded
        Pallas kernel, native-layout cache tiles, two rank-2 MXU dots, no
        relayout, no materialized all-lane score tensor). The dispatch
        (kernel on TPU, this formulation as the jnp reference elsewhere)
        lives in ``kernels/interface.lineage_attention``.
        """
        from ..kernels.interface import lineage_attention
        return lineage_attention(q_new, self_k, self_v, lineage, index,
                                 beam_width)


class Decoder(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.compute_dtype = jnp.dtype(cfg.dtype)
        self.embed = nn.Embed(cfg.vocab_size, cfg.d_model,
                              dtype=self.compute_dtype, name="embed")
        self.pos_enc = PositionalEncoding(
            cfg.d_model, cfg.max_target_positions, cfg.dropout_rate,
            dtype=self.compute_dtype, name="pos_enc")
        layer_cls = DecoderLayer
        if cfg.remat:
            # self=0, x=1, self_bias=2, memory=3, cross_bias=4,
            # tgt_lens=5, mem_lens=6, deterministic=7
            layer_cls = nn.remat(DecoderLayer, static_argnums=(7,),
                                 methods=["__call__"])
        self.layers = [
            layer_cls(cfg, self.compute_dtype, name=f"layer_{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.final_norm = LayerNorm(self.compute_dtype, name="final_norm")
        if not cfg.share_embedding:
            from .modules import QuantDenseGeneral
            self.out_proj = QuantDenseGeneral(
                cfg.vocab_size, use_bias=False, dtype=self.compute_dtype,
                name="out_proj")

    def _embedding_table(self) -> jnp.ndarray:
        """The (possibly int8) embedding as a compute-dtype [V, d] table.

        Int8 path (``quantize_params(embedding_rows=True)``): the dequant
        expression sits inside whatever program consumes it — inside the
        decode scan XLA fuses the ``int8 -> dtype * row_scale`` chain into
        the logits dot's operand read, so HBM serves the int8 bytes per
        step (the same fusion behavior measured for the int8 dense
        fall-through, BENCHMARKS.md r5). nn.Embed's own __call__ would
        silently ``astype`` the raw int8 values — never call it when the
        table may be quantized."""
        emb = self.embed.embedding
        if emb.dtype == jnp.int8:
            s = self.embed.get_variable("qscales", "embedding")   # [V, 1]
            return emb.astype(self.compute_dtype) * s.astype(
                self.compute_dtype)
        return emb.astype(self.compute_dtype)

    def _logits(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.share_embedding:
            emb = self._embedding_table()                         # [V, d]
            return jnp.einsum("bud,vd->buv", x, emb,
                              preferred_element_type=jnp.float32)
        return self.out_proj(x).astype(jnp.float32)

    def _embed_scaled(self, tokens: jnp.ndarray) -> jnp.ndarray:
        emb = self.embed.embedding
        if emb.dtype == jnp.int8:
            # Row gather + row-scale dequant (tiny: B·K rows per step).
            s = self.embed.get_variable("qscales", "embedding")
            dt = self.compute_dtype
            rows = jnp.take(emb, tokens, axis=0).astype(dt)
            out = rows * jnp.take(s, tokens, axis=0).astype(dt)
        else:
            out = self.embed(tokens)
        return out * jnp.asarray(self.cfg.d_model ** 0.5, self.compute_dtype)

    def __call__(
        self,
        targets_in: jnp.ndarray,   # [B, U] <sos>-prefixed token ids
        tgt_lens: jnp.ndarray,     # [B]
        memory: jnp.ndarray,       # [B, S, d_model]
        mem_lens: jnp.ndarray,     # [B]
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced decode; returns logits [B, U, V] (f32)."""
        u = targets_in.shape[1]
        s = memory.shape[1]
        x = self._embed_scaled(targets_in)
        x = self.pos_enc(x, deterministic=deterministic)

        self_bias = mask_ops.mask_to_bias(
            mask_ops.self_attention_mask(tgt_lens, u, causal=True))
        cross_bias = mask_ops.mask_to_bias(
            mask_ops.padding_attention_mask(u, mem_lens, s))

        mem = memory.astype(self.compute_dtype)
        for layer in self.layers:
            x = layer(x, self_bias, mem, cross_bias, tgt_lens, mem_lens,
                      deterministic)
        x = self.final_norm(x)
        return self._logits(x)

    # ----- step decoding ---------------------------------------------------

    def init_cache(self, memory: jnp.ndarray, max_len: int,
                   beam_width: int = 1, int8_kv: bool = False) -> Cache:
        """Build the KV-cache pytree. ``memory`` is UNtiled [B,S,d]; the
        self-attention cache gets B·beam_width rows, the cross K/V stay
        beam-invariant at [B,S,H,D] (see module docstring). ``int8_kv``:
        int8 cross cache (see ``DecoderLayer.init_layer_cache``)."""
        b = memory.shape[0] * beam_width
        mem = memory.astype(self.compute_dtype)
        cache: Cache = {}
        for i, layer in enumerate(self.layers):
            cache[f"layer_{i}"] = layer.init_layer_cache(mem, b, max_len,
                                                         int8_kv)
        return cache

    def decode_step(
        self,
        tokens: jnp.ndarray,       # [B·K] current input token ids
        index: jnp.ndarray,        # scalar int32 position
        cache: Cache,
        mem_lens: jnp.ndarray,     # [B] UNtiled memory lengths
        beam_width: int = 1,       # static: K beams per utterance
        lineage: jnp.ndarray | None = None,   # [B, K, max_len] int32
    ) -> Tuple[jnp.ndarray, Cache]:
        """One AR step. Returns (logits [B·K, V] f32, updated cache).

        ``lineage`` (beam decoding only) switches self-attention to the
        gather-free unpermuted-cache scheme — see
        ``DecoderLayer._lineage_self_attention``."""
        s = cache["layer_0"]["cross_k"].shape[2]   # [B,H,S,D]
        x = self._embed_scaled(tokens[:, None])                 # [B·K,1,d]
        pe = jnp.asarray(sinusoidal_position_encoding(
            self.cfg.max_target_positions, self.cfg.d_model))
        x = x + jax.lax.dynamic_slice_in_dim(pe, index, 1, axis=0)[None].astype(
            self.compute_dtype)

        cross_bias = mask_ops.mask_to_bias(
            mask_ops.padding_attention_mask(1, mem_lens, s))

        new_cache: Cache = {}
        for i, layer in enumerate(self.layers):
            x, new_cache[f"layer_{i}"] = layer.decode_step(
                x, cache[f"layer_{i}"], index, cross_bias, beam_width,
                lineage)
        x = self.final_norm(x)
        return self._logits(x)[:, 0, :], new_cache
