"""Speech-Transformer encoder (reference: ``transformer/encoder.py``
``Encoder.forward`` — SURVEY.md §2.1; subsample → PE → N×{MHA+FFN with
residual+LayerNorm+dropout}).

Pre-LN by default (repo-family convention, stabler under Noam warmup);
``normalize_before=False`` gives the paper's post-LN. Optional
``jax.checkpoint`` rematerialisation per block trades FLOPs for HBM on the
Large/Sharded presets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import masks as mask_ops
from ..ops.dropout import Dropout
from .modules import (Conv2dSubsampling, FeedForward, LayerNorm,
                      MultiHeadAttention, PositionalEncoding,
                      subsampled_lengths)


class EncoderLayer(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype
    mesh: Optional[object] = None   # jax.sharding.Mesh for attention_impl='ring'

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: jnp.ndarray,
        lengths: jnp.ndarray,
        deterministic: bool = True,  # static (remat static_argnums=(-1,))
    ) -> jnp.ndarray:
        cfg = self.cfg
        drop = lambda y: Dropout(cfg.dropout_rate)(y, deterministic=deterministic)

        impl = getattr(cfg, "attention_impl", "auto")
        # 'ring' + use_flash_attention composes: ring routing wins in
        # attend() and use_flash selects its per-block body (flash kernel
        # vs jnp einsum) — see MultiHeadAttention.attend.
        use_flash = (impl == "flash" or
                     (impl in ("auto", "ring") and cfg.use_flash_attention))
        attn = MultiHeadAttention(
            cfg.num_heads, cfg.d_model,
            dropout_rate=cfg.attention_dropout_rate, dtype=self.dtype,
            use_flash=use_flash, fused_qkv=cfg.fused_qkv,
            remat=cfg.attention_remat,
            bf16_weights=cfg.attention_bf16_weights,
            use_ring=(impl == "ring"), ring_mesh=self.mesh,
            name="self_attn")
        ffn = FeedForward(cfg.d_ff, cfg.d_model, cfg.dropout_rate, self.dtype)
        ln1, ln2 = LayerNorm(self.dtype), LayerNorm(self.dtype)

        if getattr(cfg, "normalize_before", True):
            h = ln1(x)
            x = x + drop(attn(h, h, bias, deterministic=deterministic,
                              q_lengths=lengths, kv_lengths=lengths))
            h = ln2(x)
            x = x + drop(ffn(h, deterministic=deterministic))
        else:
            h = attn(x, x, bias, deterministic=deterministic,
                     q_lengths=lengths, kv_lengths=lengths)
            x = ln1(x + drop(h))
            x = ln2(x + drop(ffn(x, deterministic=deterministic)))
        return x


class _ScanEncoderBody(nn.Module):
    """(carry, out) adapter around EncoderLayer for nn.scan; deterministic
    is baked in as an attribute so it stays static under remat."""

    cfg: ModelConfig
    dtype: jnp.dtype
    deterministic: bool = True
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, x, bias, lengths):
        layer_cls = EncoderLayer
        if self.cfg.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(4,),
                                 prevent_cse=False)
        y = layer_cls(self.cfg, self.dtype, mesh=self.mesh, name="layer")(
            x, bias, lengths, self.deterministic)
        return y, None


class Encoder(nn.Module):
    cfg: ModelConfig
    mesh: Optional[object] = None   # device mesh for attention_impl='ring'

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,        # [B, T, F]
        frame_lens: jnp.ndarray,   # [B]
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (memory [B, T', d_model], memory_lens [B])."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)

        x = Conv2dSubsampling(cfg.d_model, cfg.subsample_channels,
                              dtype=dtype, impl=cfg.subsample_impl,
                              name="subsample")(feats)
        out_lens = subsampled_lengths(frame_lens)
        x = PositionalEncoding(cfg.d_model, cfg.max_source_positions,
                               cfg.dropout_rate, dtype=dtype,
                               name="pos_enc")(x, deterministic=deterministic)

        t = x.shape[1]
        bias = mask_ops.mask_to_bias(
            mask_ops.self_attention_mask(out_lens, t), jnp.float32)

        if getattr(cfg, "scan_layers", False):
            # Weight-stacked lax.scan over layers: one compiled layer body
            # instead of N inlined copies — shrinks HLO/compile time ~N x
            # for the deep presets (docs/ROADMAP.md "Compile-time lever").
            scanned = nn.scan(
                _ScanEncoderBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=cfg.num_encoder_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            x, _ = scanned(cfg, dtype, deterministic, mesh=self.mesh,
                           name="layers")(x, bias, out_lens)
        else:
            layer_cls = EncoderLayer
            if cfg.remat:
                # static_argnums counts self at 0: (x=1, bias=2, lengths=3,
                # det=4)
                layer_cls = nn.remat(EncoderLayer, static_argnums=(4,))
            for i in range(cfg.num_encoder_layers):
                x = layer_cls(cfg, dtype, mesh=self.mesh, name=f"layer_{i}")(
                    x, bias, out_lens, deterministic)

        x = LayerNorm(dtype, name="final_norm")(x)
        # Zero padded positions so downstream cross-attention stats are clean.
        valid = mask_ops.length_mask(out_lens, t)[..., None]
        return x * valid.astype(x.dtype), out_lens
