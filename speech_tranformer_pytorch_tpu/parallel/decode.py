"""Mesh-parallel decoding (BASELINE.json north-star: "multi-host
data-parallel beam search"; reference decodes per-utterance in Python —
SURVEY.md §3.2).

Utterance batches shard over the 'data' axis; with TP-sharded params the
decoder's per-step logits inherit a 'model'-axis sharding and GSPMD lowers
the beam prune's ``lax.top_k`` with the same local-topk + gather exchange
that ``beam_exchange.distributed_topk`` implements explicitly (that module
is the hand-rolled, shard_map-tested statement of the collective; this one
is the production jit path)."""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..decoding import BeamResult, beam_decode, greedy_decode_jit
from ..models import SpeechTransformer
from .mesh import DATA_AXIS
from .sharding import param_shardings


def make_sharded_beam_decode(
    model: SpeechTransformer,
    mesh: Mesh,
    *,
    beam_size: int,
    max_len: int,
    alpha: float = 1.0,
):
    """jit'd (params, feats[B,T,F], frame_lens[B]) -> BeamResult with the
    batch sharded over 'data' and params sharded per the TP rules."""
    data = lambda ndim: NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
    rep = NamedSharding(mesh, P())

    def fn(params, feats, frame_lens):
        return beam_decode(model, params, feats, frame_lens,
                           beam_size=beam_size, max_len=max_len, alpha=alpha)

    def build(params_example):
        p_sh = param_shardings(mesh, params_example)
        return jax.jit(
            fn,
            in_shardings=(p_sh, data(3), data(1)),
            out_shardings=BeamResult(tokens=data(3), lengths=data(2),
                                     scores=data(2)),
        )

    return build


def make_sharded_greedy_decode(model: SpeechTransformer, mesh: Mesh, *,
                               max_len: int):
    data = lambda ndim: NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    def fn(params, feats, frame_lens):
        return greedy_decode_jit(model, params, feats, frame_lens,
                                 max_len=max_len)

    def build(params_example):
        p_sh = param_shardings(mesh, params_example)
        return jax.jit(fn, in_shardings=(p_sh, data(3), data(1)),
                       out_shardings=(data(2), data(1)))

    return build
