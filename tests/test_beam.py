"""Beam search correctness vs a slow Python oracle (SURVEY.md §7 hard part
#1: "correctness vs a slow python beam oracle is the critical test").

The oracle scores hypothesis prefixes with the *teacher-forced full
forward* (independently validating the KV-cache path) and replicates the
same 2K-candidate/finished-pool/length-penalty semantics in plain Python.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.data.synthetic import (
    batch_from_dataset, make_synthetic_dataset)
from speech_tranformer_pytorch_tpu.decoding import (beam_decode, beam_search,
                                                    best_hypotheses,
                                                    greedy_decode_jit,
                                                    length_penalty,
                                                    tokens_to_lists)
from speech_tranformer_pytorch_tpu.models import SpeechTransformer
from speech_tranformer_pytorch_tpu.train import create_train_state, make_train_step

PAD, SOS, EOS = 0, 1, 2
NEG_INF = -1.0e9


def oracle_beam(score_prefix, vocab, beam, max_len, alpha):
    """Python beam search for ONE utterance.

    score_prefix(prefix_tokens) -> log-prob vector over vocab for the next
    token given <sos>+prefix (full forward, no cache).
    """
    alive = [([], 0.0)]
    finished = []   # (tokens, penalized_score)
    for i in range(max_len):
        cands = []
        for tokens, score in alive:
            lp = score_prefix(tokens)
            lp = np.asarray(lp, np.float64).copy()
            lp[PAD] = NEG_INF
            lp[SOS] = NEG_INF
            for v in range(vocab):
                cands.append((tokens, v, score + lp[v]))
        cands.sort(key=lambda c: -c[2])
        top2k = cands[:2 * beam]
        # finished pool: eos candidates, penalized at current length i
        for tokens, v, s in top2k:
            if v == EOS:
                pen = s / float(length_penalty(jnp.int32(i), alpha))
                finished.append((tokens, pen))
        finished.sort(key=lambda c: -c[1])
        finished = finished[:beam]
        # alive: best K non-eos among top 2K
        alive = [(tokens + [v], s) for tokens, v, s in top2k if v != EOS][:beam]
        if not alive:
            break
    for tokens, s in alive:
        pen = s / float(length_penalty(jnp.int32(max_len), alpha))
        finished.append((tokens, pen))
    finished.sort(key=lambda c: -c[1])
    return finished[:beam]


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=16, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        subsample_channels=8))
    ds = make_synthetic_dataset(6, vocab_size=16, seed=3, min_tokens=2,
                                max_tokens=4)
    batch = batch_from_dataset(ds, cfg.features)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    rng = jax.random.PRNGKey(7)
    for _ in range(120):   # partially trained => non-trivial distribution
        state, _ = step(state, batch, rng)
    model = SpeechTransformer(cfg.model)
    return cfg, model, state.params, ds, batch


def test_beam_matches_oracle(trained):
    cfg, model, params, ds, batch = trained
    beam, max_len, alpha = 3, 6, 1.0
    vocab = cfg.model.vocab_size

    result = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=beam, max_len=max_len, alpha=alpha)
    )(params, batch.feats, batch.frame_lens)

    memory, mem_lens = model.apply(params, batch.feats, batch.frame_lens,
                                   method=SpeechTransformer.encode)

    for b in range(len(ds.waves)):
        def score_prefix(prefix):
            u = len(prefix) + 1
            tin = np.full((1, u), PAD, np.int32)
            tin[0, 0] = SOS
            tin[0, 1:] = prefix
            logits = model.apply(
                params, tin, jnp.array([u]),
                memory[b:b + 1], mem_lens[b:b + 1],
                method=lambda m, *a, **k: m.decoder(*a, **k))
            return np.asarray(jax.nn.log_softmax(logits[0, -1]))

        want = oracle_beam(score_prefix, vocab, beam, max_len, alpha)
        got_tokens = np.asarray(result.tokens[b])
        got_lens = np.asarray(result.lengths[b])
        got_scores = np.asarray(result.scores[b])

        for k in range(beam):
            w_tokens, w_score = want[k]
            g = got_tokens[k, :got_lens[k]].tolist()
            g = [t for t in g if t != EOS]
            assert g == w_tokens, (b, k, g, w_tokens)
            np.testing.assert_allclose(got_scores[k], w_score, rtol=1e-3,
                                       atol=1e-3)


def test_beam1_matches_greedy(trained):
    """beam=1 with alpha=0 must equal greedy decoding.

    The equivalence only holds for utterances where greedy terminates by
    emitting <eos>: when greedy runs to max_len without <eos>, beam-1 may
    legitimately return a shorter hypothesis it banked in the finished
    pool (an <eos> that ranked 2nd at some step outranks the longer
    unfinished argmax chain by cumulative log-prob — reference-family
    finished-pool semantics). Compare only <eos>-terminated utterances.
    """
    cfg, model, params, ds, batch = trained
    max_len = 6
    tokens_g, lens_g = jax.jit(lambda p, f, l: greedy_decode_jit(
        model, p, f, l, max_len=max_len))(params, batch.feats,
                                          batch.frame_lens)
    result = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=1, max_len=max_len, alpha=0.0)
    )(params, batch.feats, batch.frame_lens)
    greedy_hyps = tokens_to_lists(tokens_g, lens_g)
    beam_hyps = best_hypotheses(result)
    beam_hyps = [[t for t in h if t != EOS] for h in beam_hyps]
    terminated = [b for b, h in enumerate(greedy_hyps) if len(h) < max_len]
    assert len(terminated) >= len(greedy_hyps) // 2   # fixture sanity
    for b in terminated:
        assert greedy_hyps[b] == beam_hyps[b], (b, greedy_hyps[b],
                                                beam_hyps[b])


def test_beam_scores_sorted_desc(trained):
    cfg, model, params, ds, batch = trained
    result = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=4, max_len=6)
    )(params, batch.feats, batch.frame_lens)
    s = np.asarray(result.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_trained_beam_recovers_transcripts(trained):
    """After full training, beam-5 top hypothesis == training transcripts."""
    cfg, model, params, ds, batch = trained
    # train further to convergence
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    rng = jax.random.PRNGKey(7)
    for _ in range(400):
        state, _ = step(state, batch, rng)
    result = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=5, max_len=6)
    )(state.params, batch.feats, batch.frame_lens)
    hyps = [[t for t in h if t != EOS] for h in best_hypotheses(result)]
    assert hyps == ds.transcripts


def test_lineage_equals_gathered_cache(trained):
    """Gather-free lineage self-attention (default) must reproduce the
    physically-gathered-cache beam search: same hypotheses, same scores
    (up to f32 accumulation order — the lineage path selects cache lanes
    algebraically instead of materializing a permuted cache)."""
    cfg, model, params, ds, batch = trained
    lin = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=3, max_len=8, use_lineage=True)
    )(params, batch.feats, batch.frame_lens)
    gat = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=3, max_len=8, use_lineage=False)
    )(params, batch.feats, batch.frame_lens)
    np.testing.assert_array_equal(np.asarray(lin.tokens),
                                  np.asarray(gat.tokens))
    np.testing.assert_array_equal(np.asarray(lin.lengths),
                                  np.asarray(gat.lengths))
    np.testing.assert_allclose(np.asarray(lin.scores),
                               np.asarray(gat.scores), rtol=2e-5, atol=2e-5)


def test_early_stop_equals_full_scan(trained):
    """while_loop early termination must be exact vs the full scan."""
    cfg, model, params, ds, batch = trained
    full = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=3, max_len=8, early_stop=False)
    )(params, batch.feats, batch.frame_lens)
    fast = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=3, max_len=8, early_stop=True)
    )(params, batch.feats, batch.frame_lens)
    np.testing.assert_array_equal(np.asarray(fast.tokens),
                                  np.asarray(full.tokens))
    np.testing.assert_allclose(np.asarray(fast.scores),
                               np.asarray(full.scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(fast.lengths),
                                  np.asarray(full.lengths))


def test_greedy_early_stop_equals_full_scan(trained):
    """Greedy while_loop early exit (all sequences emitted <eos>) must be
    exact vs the fixed-trip scan: finished rows append only <pad>, which
    is what the pad-initialized buffer already holds."""
    cfg, model, params, ds, batch = trained
    max_len = 8
    t_full, l_full = jax.jit(lambda p, f, l: greedy_decode_jit(
        model, p, f, l, max_len=max_len, early_stop=False)
    )(params, batch.feats, batch.frame_lens)
    t_fast, l_fast = jax.jit(lambda p, f, l: greedy_decode_jit(
        model, p, f, l, max_len=max_len, early_stop=True)
    )(params, batch.feats, batch.frame_lens)
    np.testing.assert_array_equal(np.asarray(t_fast), np.asarray(t_full))
    np.testing.assert_array_equal(np.asarray(l_fast), np.asarray(l_full))
