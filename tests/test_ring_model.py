"""In-model ring attention (model.attention_impl='ring'): encoder forward
and gradients routed through parallel/ring_attention.py must match the
full-attention encoder exactly, on the fake 8-device mesh (VERDICT.md round 1
item #1: "exactness test vs full attention in-model, not just the standalone
kernel"; SURVEY.md §2.2 CP row / §5 long-context)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import get_config, tiny_config
from speech_tranformer_pytorch_tpu.models import SpeechTransformer
from speech_tranformer_pytorch_tpu.models.encoder import Encoder
from speech_tranformer_pytorch_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 fake cpu devices")


def _model_cfg(**kw):
    m = tiny_config().model.replace(
        vocab_size=32, d_model=64, num_heads=4, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2,
        subsample_channels=8, dropout_rate=0.0, dtype="float32")
    return m.replace(**kw)


def _inputs(rng, b=4, t=230, f=80):
    feats = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    # T'=(T-odd)//4-ish: deliberately NOT divisible by the ring size, so the
    # pad-to-multiple path in ring_self_attention is exercised.
    lens = jnp.array([t, t - 31, t - 90, 17], jnp.int32)
    return feats, lens


class TestEncoderRing:
    def test_forward_matches_dot(self, rng):
        mesh = make_mesh(model_axis_size=2)     # DP4 x ring2
        enc_dot = Encoder(_model_cfg(attention_impl="dot"))
        enc_ring = Encoder(_model_cfg(attention_impl="ring"), mesh=mesh)

        feats, lens = _inputs(rng)
        params = enc_dot.init(jax.random.PRNGKey(0), feats, lens)
        want, want_lens = enc_dot.apply(params, feats, lens)
        got, got_lens = jax.jit(
            lambda p, f, l: enc_ring.apply(p, f, l))(params, feats, lens)
        np.testing.assert_array_equal(np.asarray(got_lens),
                                      np.asarray(want_lens))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_forward_ring8(self, rng):
        mesh = make_mesh(model_axis_size=8)     # pure ring over all devices
        enc_dot = Encoder(_model_cfg(attention_impl="dot"))
        enc_ring = Encoder(_model_cfg(attention_impl="ring"), mesh=mesh)
        feats, lens = _inputs(rng, b=2, t=190)
        lens = lens[:2]
        params = enc_dot.init(jax.random.PRNGKey(1), feats, lens)
        want, _ = enc_dot.apply(params, feats, lens)
        got, _ = enc_ring.apply(params, feats, lens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_forward_scan_remat_matches_dot(self, rng):
        """The sharded-preset combo (scan_layers + remat + ring — the
        preset that routes through the ring by default, config.py
        sharded_config) must stay exact vs the plain dot encoder."""
        mesh = make_mesh(model_axis_size=2)
        enc_dot = Encoder(_model_cfg(attention_impl="dot"))
        enc_ring = Encoder(_model_cfg(attention_impl="ring",
                                      scan_layers=True, remat=True),
                           mesh=mesh)
        feats, lens = _inputs(rng)
        params = enc_dot.init(jax.random.PRNGKey(3), feats, lens)
        want, _ = enc_dot.apply(params, feats, lens)
        # Restack the per-layer params into the scan layout.
        import flax
        p = flax.core.unfreeze(params)["params"]
        layers = [p.pop(f"layer_{i}") for i in range(2)]
        p["layers"] = {"layer": jax.tree.map(
            lambda *xs: jnp.stack(xs), *layers)}
        got, _ = jax.jit(lambda pp, f, l: enc_ring.apply(pp, f, l))(
            {"params": p}, feats, lens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_grads_match_dot(self, rng):
        """Ring attention is differentiable (scan+ppermute transpose) and
        its gradients match full attention — required for training the
        long-bucket presets through the ring."""
        mesh = make_mesh(model_axis_size=2)
        enc_dot = Encoder(_model_cfg(attention_impl="dot"))
        enc_ring = Encoder(_model_cfg(attention_impl="ring"), mesh=mesh)
        feats, lens = _inputs(rng)
        params = enc_dot.init(jax.random.PRNGKey(2), feats, lens)

        def loss(enc):
            def fn(p):
                out, _ = enc.apply(p, feats, lens)
                return jnp.sum(out ** 2)
            return fn

        g_dot = jax.grad(loss(enc_dot))(params)
        g_ring = jax.jit(jax.grad(loss(enc_ring)))(params)
        flat_dot = jax.tree_util.tree_leaves(g_dot)
        flat_ring = jax.tree_util.tree_leaves(g_ring)
        for a, b in zip(flat_ring, flat_dot):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-4)

    def test_requires_mesh(self, rng):
        enc = Encoder(_model_cfg(attention_impl="ring"))
        feats, lens = _inputs(rng, b=1)
        lens = lens[:1]
        with pytest.raises(ValueError, match="mesh"):
            enc.init(jax.random.PRNGKey(0), feats, lens)


class TestSharededTrainStepRing:
    def test_sharded_step_with_ring(self, rng):
        """Full sharded train step with attention_impl='ring': loss matches
        the dot-attention step (same params, dropout off)."""
        from speech_tranformer_pytorch_tpu.data.synthetic import (
            batch_from_dataset, make_synthetic_dataset)
        from speech_tranformer_pytorch_tpu.parallel import (
            batch_shardings, make_sharded_train_step, shard_train_state)
        from speech_tranformer_pytorch_tpu.train import create_train_state

        mesh = make_mesh(model_axis_size=2)
        cfg = tiny_config()
        base_m = _model_cfg(dropout_rate=0.0)
        ds = make_synthetic_dataset(8, vocab_size=32, seed=0)

        m1, m2 = {}, {}
        for impl in ("dot", "ring"):
            c = cfg.replace(model=base_m.replace(attention_impl=impl))
            batch = batch_from_dataset(ds, c.features)
            state = create_train_state(c, jax.random.PRNGKey(0), batch,
                                       sharded=True)
            sstate = shard_train_state(state, mesh)
            sbatch = jax.tree.map(jax.device_put, batch,
                                  batch_shardings(mesh, batch))
            step = make_sharded_train_step(c, mesh)(state, batch)
            sstate, metrics = step(sstate, sbatch, jax.random.PRNGKey(1))
            m1[impl] = jax.device_get(metrics)
            _, metrics2 = step(sstate, sbatch, jax.random.PRNGKey(1))
            m2[impl] = jax.device_get(metrics2)
        assert np.isfinite(m1["ring"]["loss"])
        # Step-1 loss and grad norm: the ring forward+backward matches dot.
        np.testing.assert_allclose(m1["ring"]["loss"], m1["dot"]["loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(m1["ring"]["grad_norm"],
                                   m1["dot"]["grad_norm"], rtol=1e-3)
        # Step-2 loss (after one Adam update each): the updated params agree
        # in aggregate. (Elementwise post-Adam params are NOT comparable —
        # Adam sign-normalizes near-zero grads, so float noise flips tiny
        # updates; the loss a step later is the meaningful check.)
        np.testing.assert_allclose(m2["ring"]["loss"], m2["dot"]["loss"],
                                   rtol=1e-3)

    def test_config_validates_ring(self):
        cfg = get_config("base", **{"model.attention_impl": "ring"})
        cfg.validate()
        bad = get_config("base", **{"model.attention_impl": "ring",
                                    "model.attention_dropout_rate": 0.1})
        with pytest.raises(ValueError, match="ring"):
            bad.validate()


class TestEncoderRingFlashBody:
    """ring × flash composition in-model (VERDICT r3 item #9): with
    attention_impl='ring' AND use_flash_attention=True the encoder routes
    each ring step's block through the Pallas flash kernel; forward and
    grads must still match the plain dot encoder. (CPU runs the kernel in
    interpret mode — this is the functional result; the perf claim needs
    real multi-chip TP hardware, which this sandbox does not have.)"""

    def test_forward_matches_dot(self, rng):
        mesh = make_mesh(model_axis_size=2)     # DP4 x ring2
        enc_dot = Encoder(_model_cfg(attention_impl="dot"))
        enc_rf = Encoder(_model_cfg(attention_impl="ring",
                                    use_flash_attention=True), mesh=mesh)
        feats, lens = _inputs(rng)
        params = enc_dot.init(jax.random.PRNGKey(0), feats, lens)
        want, want_lens = enc_dot.apply(params, feats, lens)
        got, got_lens = jax.jit(
            lambda p, f, l: enc_rf.apply(p, f, l))(params, feats, lens)
        np.testing.assert_array_equal(np.asarray(got_lens),
                                      np.asarray(want_lens))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_grads_match_dot(self, rng):
        mesh = make_mesh(model_axis_size=2)
        enc_dot = Encoder(_model_cfg(attention_impl="dot"))
        enc_rf = Encoder(_model_cfg(attention_impl="ring",
                                    use_flash_attention=True), mesh=mesh)
        feats, lens = _inputs(rng, t=150)   # b=4 = the 'data' axis size
        params = enc_dot.init(jax.random.PRNGKey(2), feats, lens)

        def loss(enc):
            def f(p):
                out, _ = enc.apply(p, feats, lens)
                return jnp.sum(out ** 2)
            return f

        g_dot = jax.grad(loss(enc_dot))(params)
        g_rf = jax.jit(jax.grad(loss(enc_rf)))(params)
        for (pa, a), (pb, bb) in zip(
                jax.tree_util.tree_leaves_with_path(g_dot),
                jax.tree_util.tree_leaves_with_path(g_rf)):
            np.testing.assert_allclose(
                np.asarray(bb), np.asarray(a), rtol=3e-3, atol=3e-3,
                err_msg=jax.tree_util.keystr(pa))
