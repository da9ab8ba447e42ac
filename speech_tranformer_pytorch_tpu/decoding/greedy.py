"""Greedy autoregressive decoding (reference: argmax loop inside
``recognize`` — SURVEY.md §2.1 "Greedy decode" / §3.2).

TPU-first: the whole batch decodes inside ONE ``lax.scan`` over steps with
the KV cache threaded as carry — no per-utterance Python loop, no prefix
re-running. Finished sequences (emitted <eos>) keep emitting <pad>.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models import SpeechTransformer

PAD, SOS, EOS = 0, 1, 2


def greedy_decode(
    model: SpeechTransformer,
    params,
    memory: jnp.ndarray,        # [B, S, d_model] encoder output
    mem_lens: jnp.ndarray,      # [B]
    *,
    max_len: int,
    sos_id: int = SOS,
    eos_id: int = EOS,
    pad_id: int = PAD,
    early_stop: bool = True,
    int8_kv: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, max_len] incl. eos, lengths [B] excl. eos).

    ``early_stop`` (default): drive the steps with ``lax.while_loop`` and
    exit as soon as every sequence has emitted <eos> — exact, because a
    finished sequence only ever appends <pad>, which is exactly what the
    unstopped scan's remaining iterations would write (the reference's
    per-utterance loop stops at <eos> the same way — SURVEY.md §3.2).
    On a converged model hypotheses run far shorter than max_len, so this
    cuts most decode steps of every mid-training dev eval and of beam=1
    serving. ``early_stop=False`` keeps the fixed-trip ``lax.scan``
    (the equality-test reference, and the export path where a static
    trip count helps AOT).
    """
    b = memory.shape[0]
    cache = model.apply(params, memory, max_len, 1, int8_kv,
                        method=SpeechTransformer.init_cache)

    def step(carry, i):
        tokens, finished, cache = carry
        logits, cache = model.apply(params, tokens, i, cache, mem_lens,
                                    method=SpeechTransformer.decode_step)
        # Never emit pad/sos.
        logits = logits.at[:, pad_id].set(-jnp.inf).at[:, sos_id].set(-jnp.inf)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, jnp.int32(pad_id), nxt)
        finished = finished | (nxt == eos_id)
        return (nxt, finished, cache), nxt

    init = (jnp.full((b,), sos_id, jnp.int32), jnp.zeros((b,), bool), cache)
    if early_stop:
        # Same step body; emitted tokens land in a [B, max_len] buffer
        # (pad-initialized == what the scan pads with after <eos>).
        buf = jnp.full((b, max_len), pad_id, jnp.int32)

        def cond(state):
            i, (_, finished, _), _ = state
            return jnp.logical_and(i < max_len, ~jnp.all(finished))

        def body(state):
            i, carry, buf = state
            carry, nxt = step(carry, i)
            return i + 1, carry, buf.at[:, i].set(nxt)

        _, _, tokens = jax.lax.while_loop(cond, body, (jnp.int32(0), init, buf))
    else:
        _, outs = jax.lax.scan(step, init,
                               jnp.arange(max_len, dtype=jnp.int32))
        tokens = outs.T                               # [B, max_len]
    not_end = (tokens != eos_id) & (tokens != pad_id)
    lengths = jnp.sum(not_end.astype(jnp.int32), axis=-1)
    return tokens, lengths


def greedy_decode_jit(model, params, feats, frame_lens, *, max_len: int,
                      early_stop: bool = True, int8_kv: bool = False):
    """encode + greedy decode as one jittable program."""
    memory, mem_lens = model.apply(params, feats, frame_lens,
                                   method=SpeechTransformer.encode)
    return greedy_decode(model, params, memory, mem_lens, max_len=max_len,
                         early_stop=early_stop, int8_kv=int8_kv)


def tokens_to_lists(tokens, lengths):
    """Device arrays -> python lists of token ids (host-side)."""
    import numpy as np
    t, l = np.asarray(tokens), np.asarray(lengths)
    return [t[b, :l[b]].tolist() for b in range(t.shape[0])]
