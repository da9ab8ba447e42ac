"""Distributed topk (beam score exchange) and ring attention vs unsharded
goldens on the fake 8-device mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.parallel import make_mesh
from speech_tranformer_pytorch_tpu.parallel.beam_exchange import \
    distributed_topk
from speech_tranformer_pytorch_tpu.parallel.ring_attention import \
    ring_attention

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 fake cpu devices")


class TestDistributedTopk:
    def test_matches_dense_topk(self, rng):
        mesh = make_mesh(model_axis_size=4)
        b, f, k = 3, 4 * 64, 5
        scores = jnp.asarray(rng.standard_normal((b, f)).astype(np.float32))
        want_v, want_i = jax.lax.top_k(scores, k)
        got_v, got_i = distributed_topk(scores, k, mesh)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

    def test_beam_prune_shape(self, rng):
        """Shaped like the real use: [B, K*V] with V sharded."""
        mesh = make_mesh(model_axis_size=8)
        b, beam, vocab = 2, 5, 8 * 32
        scores = jnp.asarray(
            rng.standard_normal((b, beam * vocab)).astype(np.float32))
        # reshape so vocab (fastest-varying) is the sharded contiguous dim:
        # candidates laid out [K, V] flattened -> shard V via [B, K, V] on
        # last axis, then flatten per shard. For the test we shard K*V
        # directly, which matches a vocab-sharded layout when K*V % n == 0.
        want_v, want_i = jax.lax.top_k(scores, 2 * beam)
        got_v, got_i = distributed_topk(scores, 2 * beam, mesh)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

    def test_rejects_indivisible(self, rng):
        mesh = make_mesh(model_axis_size=8)
        with pytest.raises(ValueError):
            distributed_topk(jnp.zeros((2, 30)), 3, mesh)


class TestRingAttention:
    def test_matches_full_attention(self, rng):
        from speech_tranformer_pytorch_tpu.models.modules import \
            dot_product_attention
        from speech_tranformer_pytorch_tpu.ops import masks as mask_ops

        mesh = make_mesh(model_axis_size=4)
        b, t, h, d = 2, 64, 2, 16
        q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
        lens = jnp.array([64, 37], jnp.int32)

        got = ring_attention(q, k, v, lens, mesh)
        bias = mask_ops.mask_to_bias(
            mask_ops.padding_attention_mask(t, lens, t))
        want = dot_product_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_full_ring_8(self, rng):
        from speech_tranformer_pytorch_tpu.models.modules import \
            dot_product_attention
        from speech_tranformer_pytorch_tpu.ops import masks as mask_ops

        mesh = make_mesh(model_axis_size=8)
        b, t, h, d = 1, 128, 1, 8
        q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
        lens = jnp.array([100], jnp.int32)
        got = ring_attention(q, k, v, lens, mesh)
        bias = mask_ops.mask_to_bias(
            mask_ops.padding_attention_mask(t, lens, t))
        want = dot_product_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_rejects_indivisible(self, rng):
        mesh = make_mesh(model_axis_size=8)
        with pytest.raises(ValueError):
            ring_attention(jnp.zeros((1, 30, 1, 8)), jnp.zeros((1, 30, 1, 8)),
                           jnp.zeros((1, 30, 1, 8)), jnp.array([30]), mesh)


class TestRingFlashBody:
    """VERDICT r3 item #9: ring composed with the Pallas flash kernel as
    the per-block body (body='flash') — forward AND gradients must match
    the jnp dot body / full attention (ring reorders f32 accumulation, so
    the tolerances are the established ring rtol 2e-4)."""

    def _qkv(self, rng, b, t, h, d):
        mk = lambda: jnp.asarray(
            rng.standard_normal((b, t, h, d)).astype(np.float32))
        return mk(), mk(), mk()

    def test_forward_matches_dot_body_and_full(self, rng):
        from speech_tranformer_pytorch_tpu.models.modules import \
            dot_product_attention
        from speech_tranformer_pytorch_tpu.ops import masks as mask_ops

        mesh = make_mesh(model_axis_size=4)
        b, t, h, d = 2, 64, 2, 16
        q, k, v = self._qkv(rng, b, t, h, d)
        lens = jnp.array([64, 37], jnp.int32)

        got = ring_attention(q, k, v, lens, mesh, body="flash")
        dot_body = ring_attention(q, k, v, lens, mesh, body="dot")
        bias = mask_ops.mask_to_bias(
            mask_ops.padding_attention_mask(t, lens, t))
        want = dot_product_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dot_body),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_gradients_match_dot_body(self, rng):
        """The lse-cotangent fold (di_eff = di - dlse) and scan/ppermute
        transposition: d(loss)/d(q,k,v) through the flash-bodied ring must
        equal the dot-bodied ring's gradients."""
        mesh = make_mesh(model_axis_size=4)
        b, t, h, d = 2, 32, 2, 8
        q, k, v = self._qkv(rng, b, t, h, d)
        lens = jnp.array([32, 21], jnp.int32)
        w = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))

        def loss(body):
            def f(q_, k_, v_):
                o = ring_attention(q_, k_, v_, lens, mesh, body=body)
                return jnp.sum(o * w)      # non-uniform cotangent
            return f

        g_flash = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
        g_dot = jax.grad(loss("dot"), argnums=(0, 1, 2))(q, k, v)
        for name, gf, gd in zip("qkv", g_flash, g_dot):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                       rtol=5e-4, atol=5e-4,
                                       err_msg=f"d{name}")

    def test_masked_rows_zero(self, rng):
        """Rows past every block's valid keys must come out exactly 0 in
        both bodies (the l==0 guard vs the finite-lse merge)."""
        mesh = make_mesh(model_axis_size=4)
        b, t, h, d = 1, 32, 1, 8
        q, k, v = self._qkv(rng, b, t, h, d)
        lens = jnp.array([0], jnp.int32)
        for body in ("dot", "flash"):
            out = np.asarray(ring_attention(q, k, v, lens, mesh, body=body))
            np.testing.assert_array_equal(out, np.zeros_like(out),
                                          err_msg=body)

    def test_rejects_unknown_body(self):
        mesh = make_mesh(model_axis_size=4)
        z = jnp.zeros((1, 32, 1, 8))
        with pytest.raises(ValueError, match="body"):
            ring_attention(z, z, z, jnp.array([32]), mesh, body="bogus")


class TestMakeMeshAuto:
    """ADVICE r3 #5: auto-mode mesh selection falls back to single-device
    (with a warning) when model_axis does not fit the local devices, so a
    Sharded-preset checkpoint stays decodable on a smaller host; a valid
    topology still builds the mesh."""

    def test_builds_when_divisible(self):
        from speech_tranformer_pytorch_tpu.config import MeshConfig
        from speech_tranformer_pytorch_tpu.parallel.mesh import make_mesh_auto
        mesh = make_mesh_auto(MeshConfig(model_axis=2))
        assert mesh is not None and mesh.shape["model"] == 2

    def test_falls_back_when_indivisible(self):
        import warnings
        from speech_tranformer_pytorch_tpu.config import MeshConfig
        from speech_tranformer_pytorch_tpu.parallel.mesh import make_mesh_auto
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mesh = make_mesh_auto(MeshConfig(model_axis=3))  # 3 ∤ 8 devices
        assert mesh is None
        assert any("falling back" in str(x.message) for x in w)

    def test_falls_back_when_too_large(self):
        import warnings
        from speech_tranformer_pytorch_tpu.config import MeshConfig
        from speech_tranformer_pytorch_tpu.parallel.mesh import make_mesh_auto
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mesh = make_mesh_auto(MeshConfig(model_axis=16))
        assert mesh is None and len(w) == 1
