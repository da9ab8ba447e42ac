"""Pallas flash-attention goldens vs the jnp reference (SURVEY.md §4:
"flash-attn kernel vs naive jnp attention (incl. ragged-length masks)").
Runs in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.kernels.flash_attention import (
    _reference_bhtd, mha_flash)
from speech_tranformer_pytorch_tpu.models.modules import dot_product_attention
from speech_tranformer_pytorch_tpu.ops import masks as mask_ops


def _rand_qkv(rng, b, t, s, h, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("t,s,d", [(128, 128, 64), (256, 384, 64),
                                   (130, 200, 128)])
def test_matches_jnp_full_length(rng, t, s, d):
    b, h = 2, 2
    q, k, v = _rand_qkv(rng, b, t, s, h, d)
    lens = jnp.array([s, s], jnp.int32)
    got = mha_flash(q, k, v, kv_lengths=lens)
    bias = mask_ops.mask_to_bias(mask_ops.padding_attention_mask(t, lens, s))
    want = dot_product_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_matches_jnp_ragged_lengths(rng):
    b, t, s, h, d = 3, 128, 256, 2, 64
    q, k, v = _rand_qkv(rng, b, t, s, h, d)
    lens = jnp.array([256, 100, 1], jnp.int32)
    got = mha_flash(q, k, v, kv_lengths=lens)
    bias = mask_ops.mask_to_bias(mask_ops.padding_attention_mask(t, lens, s))
    want = dot_product_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_causal_matches_jnp(rng):
    b, t, h, d = 2, 256, 2, 64
    q, k, v = _rand_qkv(rng, b, t, t, h, d)
    lens = jnp.array([256, 180], jnp.int32)
    got = mha_flash(q, k, v, kv_lengths=lens, causal=True)
    mask = mask_ops.padding_attention_mask(t, lens, t) & \
        mask_ops.causal_mask(t)[None, None]
    want = dot_product_attention(q, k, v, mask_ops.mask_to_bias(mask))
    # rows beyond kv_len under causal+pad are fully masked in the jnp path
    # (uniform) but well-defined in both; compare only valid rows.
    for i, n in enumerate([256, 180]):
        np.testing.assert_allclose(np.asarray(got)[i, :n],
                                   np.asarray(want)[i, :n],
                                   rtol=2e-3, atol=2e-3)


def test_bf16_inputs(rng):
    b, t, s, h, d = 2, 128, 128, 2, 64
    q, k, v = _rand_qkv(rng, b, t, s, h, d, jnp.bfloat16)
    lens = jnp.array([128, 90], jnp.int32)
    got = mha_flash(q, k, v, kv_lengths=lens)
    bias = mask_ops.mask_to_bias(mask_ops.padding_attention_mask(t, lens, s))
    want = dot_product_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_zero_length_rows_are_zero(rng):
    b, t, s, h, d = 2, 128, 128, 1, 64
    q, k, v = _rand_qkv(rng, b, t, s, h, d)
    lens = jnp.array([128, 0], jnp.int32)
    got = np.asarray(mha_flash(q, k, v, kv_lengths=lens))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[1], 0.0)


def test_gradients_match_reference(rng):
    b, t, s, h, d = 2, 128, 128, 2, 64
    q, k, v = _rand_qkv(rng, b, t, s, h, d)
    lens = jnp.array([128, 77], jnp.int32)

    def loss_flash(q, k, v):
        o = mha_flash(q, k, v, kv_lengths=lens)
        w = (jnp.arange(t)[None, :, None, None] < lens[:, None, None, None])
        return jnp.sum((o * w) ** 2)

    def loss_ref(q, k, v):
        bias = mask_ops.mask_to_bias(
            mask_ops.padding_attention_mask(t, lens, s))
        o = dot_product_attention(q, k, v, bias)
        w = (jnp.arange(t)[None, :, None, None] < lens[:, None, None, None])
        return jnp.sum((o * w) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-3, atol=5e-3)


def test_causal_gradients_match_reference(rng):
    b, t, h, d = 2, 256, 2, 64
    q, k, v = _rand_qkv(rng, b, t, t, h, d)
    lens = jnp.array([256, 150], jnp.int32)

    def loss_flash(q, k, v):
        o = mha_flash(q, k, v, kv_lengths=lens, causal=True)
        w = (jnp.arange(t)[None, :, None, None] < lens[:, None, None, None])
        return jnp.sum((o * w) ** 2)

    def loss_ref(q, k, v):
        mask = mask_ops.padding_attention_mask(t, lens, t) & \
            mask_ops.causal_mask(t)[None, None]
        o = dot_product_attention(q, k, v, mask_ops.mask_to_bias(mask))
        w = (jnp.arange(t)[None, :, None, None] < lens[:, None, None, None])
        return jnp.sum((o * w) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-3, atol=5e-3)


def test_zero_length_gradients_finite(rng):
    b, t, s, h, d = 2, 128, 128, 1, 64
    q, k, v = _rand_qkv(rng, b, t, s, h, d)
    lens = jnp.array([128, 0], jnp.int32)
    g = jax.grad(lambda q, k, v: jnp.sum(
        mha_flash(q, k, v, kv_lengths=lens) ** 2), argnums=(0, 1, 2))(q, k, v)
    for x in g:
        assert np.isfinite(np.asarray(x)).all()
