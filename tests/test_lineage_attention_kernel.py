"""Goldens for the fused lineage self-attention kernel
(kernels/lineage_attention.py) vs the jnp onehot-einsum reference (the
original models/decoder.py formulation) — Pallas interpret mode on CPU
(SURVEY.md §4 kernel-vs-reference goldens). The TPU-compiled path is
covered by tests/test_perf_gate.py on the chip, and end-to-end by every
beam-decode test (the decoder dispatches through kernels/interface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.kernels.lineage_attention import (
    lineage_attention, lineage_attention_reference)


def _rand_inputs(rng, b, k, L, h, d, index, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b * k, 1, h, d)), dtype)
    ck = jnp.asarray(rng.standard_normal((b * k, L, h, d)), dtype)
    cv = jnp.asarray(rng.standard_normal((b * k, L, h, d)), dtype)
    # Valid lineage: identity at j >= index, arbitrary ancestor lanes before.
    lin = rng.integers(0, k, size=(b, k, L)).astype(np.int32)
    lin[:, :, index:] = np.arange(k, dtype=np.int32)[None, :, None]
    return q, ck, cv, jnp.asarray(lin), jnp.asarray(index, jnp.int32)


def _check(rng, b, k, L, h, d, index, dtype=jnp.float32, atol=2e-6):
    q, ck, cv, lin, idx = _rand_inputs(rng, b, k, L, h, d, index, dtype)
    want = lineage_attention_reference(q, ck, cv, lin, idx, k)
    got = lineage_attention(q, ck, cv, lin, idx, k, interpret=True)
    assert got.shape == want.shape == (b * k, 1, h, d)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=atol, rtol=1e-5)


def test_beam5_base_shapes(rng):
    _check(rng, b=3, k=5, L=40, h=4, d=64, index=17)


def test_step0_identity_lineage(rng):
    """index=0: only position 0 attends, lineage is identity everywhere."""
    _check(rng, b=2, k=4, L=16, h=2, d=32, index=0)


def test_last_position(rng):
    _check(rng, b=2, k=3, L=24, h=2, d=64, index=23)


def test_greedy_width1(rng):
    _check(rng, b=4, k=1, L=20, h=4, d=64, index=9)


def test_bf16_cache(rng):
    """bf16 cache (the production decode dtype): kernel rounds softmax
    weights to the cache dtype exactly like the reference."""
    _check(rng, b=2, k=5, L=32, h=4, d=64, index=21, dtype=jnp.bfloat16,
           atol=2e-2)


def test_cross_beam_ancestry(rng):
    """All beams share beam 0's history (a common post-prune state):
    outputs for all beams must equal attention over lane 0's cache."""
    b, k, L, h, d = 1, 3, 12, 2, 32
    q, ck, cv, _, idx = _rand_inputs(np.random.default_rng(0), b, k, L, h,
                                     d, index=7)
    lin = np.zeros((b, k, L), np.int32)
    lin[:, :, 8:] = np.arange(k, dtype=np.int32)[None, :, None]
    lin = jnp.asarray(lin)
    got = lineage_attention(q, ck, cv, lin, idx, k, interpret=True)
    want = lineage_attention_reference(q, ck, cv, lin, idx, k)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-6, rtol=1e-5)


def test_decoder_dispatch_uses_reference_on_cpu(rng):
    """On CPU the interface must route to the jnp reference (no interpret
    overhead in the production path) and the full decode_step stays exact:
    covered by test_model/test_beam decode tests; here just pin dispatch."""
    from speech_tranformer_pytorch_tpu.kernels import interface
    assert not interface._pallas_ok()
