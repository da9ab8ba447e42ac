"""Golden tests for the fused beam-candidate top-k kernel
(kernels/beam_prune.py) vs the jnp reference (the original
decoding/beam.py inline formulation) — exact equality including
lax.top_k's stable tie order (SURVEY.md §4 kernel-vs-reference goldens;
Pallas interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.kernels.beam_prune import (
    candidate_topk, candidate_topk_reference)


def _check(logits, alive, k2, pad_id=0, sos_id=1):
    want_v, want_i = candidate_topk_reference(
        logits, alive, k2=k2, pad_id=pad_id, sos_id=sos_id)
    got_v, got_i = candidate_topk(
        logits, alive, k2=k2, pad_id=pad_id, sos_id=sos_id, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-6, atol=1e-6)


def test_random_logits(rng):
    b, k, v = 3, 5, 97
    logits = jnp.asarray(rng.standard_normal((b * k, v)).astype(np.float32))
    alive = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32))
    _check(logits, alive, k2=10)


def test_neg_inf_alive_rows(rng):
    """Step-0 shape: only beam 0 live, the rest at NEG_INF."""
    b, k, v = 2, 4, 50
    logits = jnp.asarray(rng.standard_normal((b * k, v)).astype(np.float32))
    alive = jnp.tile(jnp.array([0.0] + [-1e9] * (k - 1), jnp.float32), (b, 1))
    _check(logits, alive, k2=8)


def test_ties_within_row_prefer_lowest_vocab_index(rng):
    b, k, v = 1, 2, 40
    logits = jnp.zeros((b * k, v), jnp.float32)   # all tied
    alive = jnp.array([[0.0, -0.5]], jnp.float32)
    _check(logits, alive, k2=4)


def test_ties_across_beams_prefer_lowest_beam(rng):
    b, k, v = 1, 3, 16
    logits = jnp.zeros((b * k, v), jnp.float32)
    alive = jnp.zeros((b, k), jnp.float32)        # every candidate equal
    _check(logits, alive, k2=6)


def test_more_than_k2_ties_in_one_row(rng):
    """A single row holding > k2 equal maxima must contribute its k2
    lowest vocab indices, exactly like the flat top_k."""
    b, k, v = 1, 2, 64
    logits = jnp.zeros((b * k, v), jnp.float32).at[0, :].set(5.0)
    alive = jnp.array([[0.0, -1.0]], jnp.float32)
    _check(logits, alive, k2=5)


def test_special_token_masking(rng):
    b, k, v = 2, 3, 33
    logits = jnp.asarray(rng.standard_normal((b * k, v)).astype(np.float32))
    logits = logits.at[:, 0].set(100.0).at[:, 1].set(99.0)  # pad/sos spikes
    alive = jnp.zeros((b, k), jnp.float32)
    want_v, want_i = candidate_topk_reference(logits, alive, k2=4)
    got_v, got_i = candidate_topk(logits, alive, k2=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # No pad/sos token can ever be selected.
    assert not np.isin(np.asarray(got_i) % v, [0, 1]).any()


def test_tiny_vocab_saturation(rng):
    """Fewer than k2 candidates above NEG_INF (vocab < 2*beam+2): the
    kernel must keep returning DISTINCT indices in lax.top_k order — the
    consumed-cell mask uses -inf so it can never tie with real NEG_INF
    candidates (ADVICE r2 corner: v=6, k2=6 used to repeat index 0)."""
    b, k, v = 1, 2, 6
    logits = jnp.asarray(rng.standard_normal((b * k, v)).astype(np.float32))
    alive = jnp.array([[0.0, -1e9]], jnp.float32)  # beam 1 dead
    _check(logits, alive, k2=6)


def test_all_dead_rows(rng):
    """Every beam at NEG_INF: all candidates ~-1e9; still distinct
    indices, stable order."""
    b, k, v = 2, 3, 8
    logits = jnp.asarray(rng.standard_normal((b * k, v)).astype(np.float32))
    alive = jnp.full((b, k), -1e9, jnp.float32)
    _check(logits, alive, k2=6)


def test_vmem_guard_falls_back(monkeypatch):
    """beam_candidate_topk must route oversized blocks to the jnp
    reference instead of risking a VMEM-overflow compile failure the
    except cannot catch (ADVICE r2)."""
    from speech_tranformer_pytorch_tpu.kernels import interface

    monkeypatch.setattr(interface, "_pallas_ok", lambda: True)
    called = {}

    def boom(*a, **k):
        called["kernel"] = True
        raise AssertionError("kernel path must not run for oversized blocks")

    monkeypatch.setattr(
        "speech_tranformer_pytorch_tpu.kernels.beam_prune.candidate_topk",
        boom)
    b, k, v = 64, 5, 5000   # ~19 MB of f32 working set > the 12 MB budget
    logits = jnp.zeros((b * k, v), jnp.float32)
    alive = jnp.zeros((b, k), jnp.float32)
    got_v, got_i = interface.beam_candidate_topk(logits, alive, k2=12)
    assert "kernel" not in called
    want_v, want_i = candidate_topk_reference(logits, alive, k2=12)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_base_shapes(rng):
    """The production shape class: B=8, K=5, V=512 (trimmed base)."""
    b, k, v = 8, 5, 512
    logits = jnp.asarray(rng.standard_normal((b * k, v)).astype(np.float32))
    alive = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32) * 5)
    _check(logits, alive, k2=10)
