"""Ahead-of-time export for serving (no reference analogue — the reference
deploys by `torch.load` + Python; SURVEY.md §2.1 "Checkpoint I/O").

TPU-native serving story: the whole batched recognizer — encoder, KV-cache
beam/greedy loop, length penalty — is ONE jittable function, so it exports
to a self-contained StableHLO artifact via ``jax.export``. A serving
process deserializes and calls it without the model code, flax, or the
config system; shapes are static per (batch, frames, beam) signature,
matching the bucketed batching the pipeline already produces.

    data = export_recognizer(cfg, params, batch_size=32, frames=1000,
                             beam_size=5, max_len=100)
    open("decoder.stablehlo", "wb").write(data)
    # serving side:
    fn = load_exported(open("decoder.stablehlo", "rb").read())
    tokens, lengths, scores = fn(params_flat, feats, frame_lens)

Params travel as a flat list of arrays (`flatten_params`) so the artifact
is independent of pytree registrations. Export on the target platform (a
TPU process exports a TPU artifact; the CPU artifact is for tests).
"""

from __future__ import annotations

import functools
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .config import ExperimentConfig
from .decoding.beam import beam_decode
from .decoding.greedy import greedy_decode_jit
from .models import SpeechTransformer


def flatten_params(params) -> List[jax.Array]:
    return jax.tree.leaves(params)


def export_recognizer(
    cfg: ExperimentConfig,
    params,
    *,
    batch_size: int,
    frames: int,
    beam_size: int = 5,
    max_len: int = 100,
    alpha: float = 1.0,
) -> bytes:
    """Serialize the batched recognizer for fixed (batch, frames) shapes.

    Returns ``jax.export`` bytes whose call signature is
    ``(params_flat, feats[B,T,F] f32, frame_lens[B] i32) ->
    (tokens[B,K,max_len] i32, lengths[B,K] i32, scores[B,K] f32)``
    (greedy when ``beam_size == 1`` returns K=1-shaped results too).
    """
    model = SpeechTransformer(cfg.model)
    flat, treedef = jax.tree.flatten(params)

    def run(params_flat, feats, frame_lens):
        p = jax.tree.unflatten(treedef, params_flat)
        if beam_size == 1:
            tokens, lengths = greedy_decode_jit(model, p, feats, frame_lens,
                                                max_len=max_len)
            scores = jnp.zeros(lengths.shape, jnp.float32)
            return (tokens[:, None, :], lengths[:, None],
                    scores[:, None])
        r = beam_decode(model, p, feats, frame_lens, beam_size=beam_size,
                        max_len=max_len, alpha=alpha)
        return r.tokens, r.lengths, r.scores

    args = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat],
        jax.ShapeDtypeStruct((batch_size, frames, cfg.model.input_dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    exported = jax_export.export(jax.jit(run))(*args)
    return bytes(exported.serialize())


def load_exported(data: bytes) -> Callable[..., Tuple[jax.Array, ...]]:
    """Deserialize an exported recognizer; returns its ``call``."""
    return jax_export.deserialize(data).call
