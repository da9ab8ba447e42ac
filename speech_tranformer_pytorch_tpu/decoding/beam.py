"""Batched beam-search decoding (reference: ``Decoder.recognize_beam`` —
SURVEY.md §2.1 "Beam search" / §3.2: per-utterance Python loop, expand
beam×vocab, sorted pruning to beam width, length penalty, finished pool).

TPU-first redesign: the whole batch and all beams advance inside ONE
``lax.scan``; state is a fixed-shape pytree ``[B, K, ...]``; pruning is
``lax.top_k`` over the flattened ``K·V`` candidate scores. The reference
re-runs the full prefix each step with no KV cache; here each step is O(1)
prefix work. The self-attention KV cache is NEVER physically beam-gathered
(``use_lineage=True`` default): a [B,K,L] int32 lineage table tracks which
physical lane wrote each position and attention selects across lanes
algebraically (models/decoder.py::_lineage_self_attention) — the classic
per-step cache gather was 32 % of decode device time. ``use_lineage=False``
keeps the gathering path for comparison. Cross K/V are beam-invariant and
stored untiled either way.

Candidate selection follows the 2K-candidate scheme (select top-2K, route
<eos> candidates to the finished pool, keep the best K non-eos as the alive
set) so a step in which many beams finish cannot starve the alive set.

Length penalty: GNMT ``lp(n) = ((5+n)/6)^alpha``; finished hypotheses are
ranked by ``score / lp(len)`` ("length penalty at finalization", SURVEY.md
§3.2). ``alpha=0`` disables it.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models import SpeechTransformer

PAD, SOS, EOS = 0, 1, 2
NEG_INF = -1.0e9


def length_penalty(lengths: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """GNMT length normalisation factor lp(n) = ((5+n)/6)^alpha."""
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def _gather_beams(x: jnp.ndarray, beam_idx: jnp.ndarray, b: int, k: int) -> jnp.ndarray:
    """Reorder flattened-beam leading dim by beam_idx [B, K_out]."""
    x = x.reshape((b, k) + x.shape[1:])
    idx = beam_idx.reshape((b, -1) + (1,) * (x.ndim - 2))
    out = jnp.take_along_axis(x, idx, axis=1)
    return out.reshape((b * beam_idx.shape[1],) + x.shape[2:])


@dataclasses.dataclass(frozen=True)
class BeamResult:
    tokens: jnp.ndarray      # [B, K, L] token ids (eos-terminated, pad tail)
    lengths: jnp.ndarray     # [B, K] lengths excluding eos
    scores: jnp.ndarray      # [B, K] length-penalized log-probs, sorted desc


jax.tree_util.register_pytree_node(
    BeamResult,
    lambda r: ((r.tokens, r.lengths, r.scores), None),
    lambda _, xs: BeamResult(*xs),
)


def beam_search(
    model: SpeechTransformer,
    params,
    memory: jnp.ndarray,        # [B, S, d_model]
    mem_lens: jnp.ndarray,      # [B]
    *,
    beam_size: int,
    max_len: int,
    alpha: float = 1.0,
    sos_id: int = SOS,
    eos_id: int = EOS,
    pad_id: int = PAD,
    early_stop: bool = True,
    use_lineage: bool = True,
    int8_kv: bool = False,
) -> BeamResult:
    b = memory.shape[0]
    k = beam_size

    # Cross K/V are beam-invariant: the cache keeps them untiled [B,S,H,D]
    # and decode_step folds the K beams into cross-attention query rows
    # (models/decoder.py) — only the self-attention cache is per-beam.
    cache = model.apply(params, memory, max_len, k, int8_kv,
                        method=SpeechTransformer.init_cache)

    # Alive state. Only beam 0 live at step 0 (all beams identical).
    alive_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32), (b, 1))
    alive_tokens = jnp.full((b, k, max_len), pad_id, jnp.int32)
    cur_tokens = jnp.full((b, k), sos_id, jnp.int32)

    fin_tokens = jnp.full((b, k, max_len), pad_id, jnp.int32)
    fin_scores = jnp.full((b, k), NEG_INF, jnp.float32)
    fin_lens = jnp.zeros((b, k), jnp.int32)

    # Lineage table for the gather-free self-attention cache scheme
    # (models/decoder.py::_lineage_self_attention): lineage[b, k, j] is the
    # physical cache lane holding logical beam k's step-j key/value.
    # Identity-initialised; columns > current step stay identity by
    # construction of the prune update below.
    identity = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :, None],
                                (b, k, max_len))
    lineage = identity if use_lineage else None

    def step(carry, i):
        (cur_tokens, alive_tokens, alive_scores,
         fin_tokens, fin_scores, fin_lens, cache, lineage) = carry

        logits, cache = model.apply(
            params, cur_tokens.reshape(b * k), i, cache, mem_lens, k,
            lineage, method=SpeechTransformer.decode_step)  # [B*K, V]
        v = logits.shape[-1]
        # Fused candidate scoring + prune (kernels/beam_prune.py): one
        # Pallas pass replaces log_softmax + two masked sets + add +
        # lax.top_k over [B, K·V] — the top_k alone was ~100 us/step
        # (9.6 % of decode) on XProf at B=32.
        from ..kernels.interface import beam_candidate_topk
        top_scores, top_idx = beam_candidate_topk(
            logits, alive_scores, k2=2 * k, pad_id=pad_id, sos_id=sos_id)
        top_beam = top_idx // v
        top_tok = (top_idx % v).astype(jnp.int32)

        # Candidate token sequences [B, 2K, L].
        seqs = jnp.take_along_axis(alive_tokens, top_beam[:, :, None], axis=1)
        seqs = jax.vmap(
            lambda s, t: s.at[:, i].set(t))(seqs, top_tok)  # write col i

        is_eos = top_tok == eos_id

        # ---- finished pool update: existing K + new 2K eos-candidates.
        new_fin_lens = jnp.full((b, 2 * k), i, jnp.int32)   # length excl. eos
        penalized = top_scores / length_penalty(new_fin_lens, alpha)
        cand_fin_scores = jnp.where(is_eos, penalized, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
        all_fin_tokens = jnp.concatenate([fin_tokens, seqs], axis=1)
        all_fin_lens = jnp.concatenate([fin_lens, new_fin_lens], axis=1)
        fin_scores_new, fin_sel = jax.lax.top_k(all_fin_scores, k)
        fin_tokens_new = jnp.take_along_axis(
            all_fin_tokens, fin_sel[:, :, None], axis=1)
        fin_lens_new = jnp.take_along_axis(all_fin_lens, fin_sel, axis=1)

        # ---- alive set: best K non-eos among the 2K.
        alive_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        alive_scores_new, alive_sel = jax.lax.top_k(alive_cand_scores, k)
        alive_tokens_new = jnp.take_along_axis(
            seqs, alive_sel[:, :, None], axis=1)
        cur_tokens_new = jnp.take_along_axis(
            top_tok, alive_sel, axis=1)
        src_beam = jnp.take_along_axis(top_beam, alive_sel, axis=1)  # [B, K]

        if use_lineage:
            # Compose the beam permutation into the tiny lineage table
            # instead of physically gathering the KV cache: rows follow the
            # chosen parents, columns <= i keep the parents' history, and
            # the just-written column i maps to the parent's lane (its
            # identity entry); columns > i reset to identity for future
            # writes. [B,K,L] int32 — O(kB) traffic vs O(MB) cache gather.
            lin_g = jnp.take_along_axis(lineage, src_beam[:, :, None], axis=1)
            lineage_new = jnp.where(
                jnp.arange(max_len, dtype=jnp.int32)[None, None, :] <= i,
                lin_g, identity)
            cache_new = cache
        else:
            # Beam-gather the self-attention cache (cross K/V beam-invariant).
            def gather_layer(layer):
                out = dict(layer)
                out["self_k"] = _gather_beams(layer["self_k"], src_beam, b, k)
                out["self_v"] = _gather_beams(layer["self_v"], src_beam, b, k)
                return out
            cache_new = {name: gather_layer(layer)
                         for name, layer in cache.items()}
            lineage_new = lineage

        return (cur_tokens_new, alive_tokens_new, alive_scores_new,
                fin_tokens_new, fin_scores_new, fin_lens_new, cache_new,
                lineage_new), None

    init = (cur_tokens, alive_tokens, alive_scores,
            fin_tokens, fin_scores, fin_lens, cache, lineage)
    if early_stop:
        # lax.while_loop with the standard bound-based termination: an
        # alive hypothesis's best achievable penalized score is
        # score/lp(max_len) (scores only decrease, lp only grows), so once
        # every utterance's bound is <= its worst finished score (and the
        # finished pool is full) no further step can change the result —
        # exact, not approximate. Typical speech hypotheses finish well
        # before max_len, so this cuts most decode steps.
        max_lp = length_penalty(jnp.int32(max_len), alpha)

        def cond(state):
            i, carry = state
            alive_scores_c = carry[2]
            fin_scores_c = carry[4]
            bound = jnp.max(alive_scores_c, axis=1) / max_lp        # [B]
            worst_fin = jnp.min(fin_scores_c, axis=1)               # [B]
            pool_full = worst_fin > NEG_INF / 2.0
            work_left = jnp.logical_or(~pool_full, bound > worst_fin)
            return jnp.logical_and(i < max_len, jnp.any(work_left))

        def body(state):
            i, carry = state
            new_carry, _ = step(carry, i)
            return i + 1, new_carry

        _, (cur_tokens, alive_tokens, alive_scores,
            fin_tokens, fin_scores, fin_lens, _, _) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init))
    else:
        (cur_tokens, alive_tokens, alive_scores,
         fin_tokens, fin_scores, fin_lens, _, _), _ = jax.lax.scan(
            step, init, jnp.arange(max_len, dtype=jnp.int32))

    # Merge still-alive beams (ran out of steps) into the pool, penalized at
    # full length, so every utterance yields >= 1 hypothesis.
    alive_pen = alive_scores / length_penalty(
        jnp.full((b, k), max_len, jnp.int32), alpha)
    all_scores = jnp.concatenate([fin_scores, alive_pen], axis=1)
    all_tokens = jnp.concatenate([fin_tokens, alive_tokens], axis=1)
    all_lens = jnp.concatenate(
        [fin_lens, jnp.full((b, k), max_len, jnp.int32)], axis=1)
    final_scores, sel = jax.lax.top_k(all_scores, k)
    final_tokens = jnp.take_along_axis(all_tokens, sel[:, :, None], axis=1)
    final_lens = jnp.take_along_axis(all_lens, sel, axis=1)
    return BeamResult(tokens=final_tokens, lengths=final_lens,
                      scores=final_scores)


def beam_decode(
    model: SpeechTransformer,
    params,
    feats: jnp.ndarray,
    frame_lens: jnp.ndarray,
    *,
    beam_size: int,
    max_len: int,
    alpha: float = 1.0,
    early_stop: bool = True,
    use_lineage: bool = True,
    int8_kv: bool = False,
) -> BeamResult:
    """encode + beam search as one jittable program."""
    memory, mem_lens = model.apply(params, feats, frame_lens,
                                   method=SpeechTransformer.encode)
    return beam_search(model, params, memory, mem_lens,
                       beam_size=beam_size, max_len=max_len, alpha=alpha,
                       early_stop=early_stop, use_lineage=use_lineage,
                       int8_kv=int8_kv)


def best_hypotheses(result: BeamResult):
    """Top beam of each utterance -> python lists (host-side)."""
    import numpy as np
    t = np.asarray(result.tokens[:, 0])
    l = np.asarray(result.lengths[:, 0])
    return [t[i, :l[i]].tolist() for i in range(t.shape[0])]
