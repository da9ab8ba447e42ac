"""SpeechTransformer — full encoder-decoder assembly (reference:
``transformer/transformer.py`` wrapper with ``forward()``/``recognize()`` —
SURVEY.md §2.1 / L3).

Pure-functional usage: ``params = model.init(...)``, then
``model.apply(params, feats, feat_lens, targets_in, tgt_lens)`` for
teacher-forced logits; ``encode`` / ``init_cache`` / ``decode_step``
methods back the lax.scan greedy/beam drivers in ``decoding/``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .decoder import Cache, Decoder
from .encoder import Encoder


class SpeechTransformer(nn.Module):
    cfg: ModelConfig
    # Device mesh, threaded to the encoder for attention_impl='ring'
    # (frame-axis-sharded ring attention). Static hyperparameter; None for
    # single-device use. The parallel.* step/decode builders pass it.
    mesh: Optional[object] = None

    def setup(self):
        self.encoder = Encoder(self.cfg, mesh=self.mesh, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")

    def __call__(
        self,
        feats: jnp.ndarray,        # [B, T, F]
        frame_lens: jnp.ndarray,   # [B]
        targets_in: jnp.ndarray,   # [B, U] <sos> + y[:-1]
        tgt_lens: jnp.ndarray,     # [B]
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced forward; returns logits [B, U, V] (f32)."""
        with jax.named_scope("encoder"):
            memory, mem_lens = self.encoder(feats, frame_lens,
                                            deterministic=deterministic)
        with jax.named_scope("decoder"):
            return self.decoder(targets_in, tgt_lens, memory, mem_lens,
                                deterministic=deterministic)

    def encode(
        self, feats: jnp.ndarray, frame_lens: jnp.ndarray,
        *, deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.encoder(feats, frame_lens, deterministic=deterministic)

    def init_cache(self, memory: jnp.ndarray, max_len: int,
                   beam_width: int = 1, int8_kv: bool = False) -> Cache:
        return self.decoder.init_cache(memory, max_len, beam_width, int8_kv)

    def decode_step(self, tokens, index, cache, mem_lens, beam_width: int = 1,
                    lineage=None):
        return self.decoder.decode_step(tokens, index, cache, mem_lens,
                                        beam_width, lineage)
