"""Model tests: subsampling shapes/lengths, encoder padding invariance,
decoder causality, teacher-forced vs KV-cached step-decode equivalence
(SURVEY.md §4 "Unit"/"Integration")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.models import (SpeechTransformer,
                                                  subsampled_lengths)
from speech_tranformer_pytorch_tpu.models.modules import (
    dot_product_attention, sinusoidal_position_encoding)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config().model
    model = SpeechTransformer(cfg)
    rng = jax.random.PRNGKey(0)
    B, T, F, U = 2, 64, 80, 10
    feats = jax.random.normal(rng, (B, T, F))
    flens = jnp.array([64, 50])
    tgt = jax.random.randint(jax.random.PRNGKey(1), (B, U), 1, cfg.vocab_size)
    tlens = jnp.array([10, 7])
    params = model.init({"params": rng}, feats, flens, tgt, tlens)
    return cfg, model, params, feats, flens, tgt, tlens


class TestModules:
    def test_sinusoidal_pe(self):
        pe = sinusoidal_position_encoding(16, 8)
        assert pe.shape == (16, 8)
        np.testing.assert_allclose(pe[0], [0, 1] * 4, atol=1e-7)
        # position 1, dim 0: sin(1)
        np.testing.assert_allclose(pe[1, 0], np.sin(1.0), rtol=1e-6)

    def test_subsampled_lengths(self):
        lens = jnp.array([64, 50, 7, 3, 2])
        out = subsampled_lengths(lens)
        # conv k=3 s=2 VALID twice: 64->31->15, 50->24->11, 7->3->1, 3->1->0, 2->0->0
        assert out.tolist() == [15, 11, 1, 0, 0]

    @pytest.mark.parametrize("impl", ["im2col", "phase"])
    def test_matmul_subsamplers_match_conv(self, rng, impl):
        """impl='im2col'/'phase' ≡ impl='conv' (values, grads, params)."""
        from speech_tranformer_pytorch_tpu.models.modules import (
            Conv2dSubsampling)
        B, T, F = 2, 37, 80
        feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        conv = Conv2dSubsampling(32, channels=16, dtype=jnp.float32,
                                 impl="conv")
        alt = Conv2dSubsampling(32, channels=16, dtype=jnp.float32,
                                impl=impl)
        params = conv.init(jax.random.PRNGKey(0), feats)
        # identical param trees (names, shapes) -> checkpoint compatible
        p2 = alt.init(jax.random.PRNGKey(0), feats)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))
        out_a = conv.apply(params, feats)
        out_b = alt.apply(params, feats)
        assert out_a.shape == out_b.shape
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   rtol=1e-5, atol=1e-5)

        def loss(fn, p):
            return jnp.sum(jnp.tanh(fn.apply(p, feats)))
        g_a = jax.grad(lambda p: loss(conv, p))(params)
        g_b = jax.grad(lambda p: loss(alt, p))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
            g_a, g_b)

    @pytest.mark.parametrize("t", [3, 4, 5, 8])
    def test_phase_subsampler_edge_lengths(self, rng, t):
        """phase impl handles minimal/odd time lengths (pad-to-even path)."""
        from speech_tranformer_pytorch_tpu.models.modules import (
            Conv2dSubsampling)
        feats = jnp.asarray(rng.standard_normal((1, t, 9)).astype(np.float32))
        conv = Conv2dSubsampling(8, channels=4, dtype=jnp.float32,
                                 impl="conv")
        phase = Conv2dSubsampling(8, channels=4, dtype=jnp.float32,
                                  impl="phase")
        params = conv.init(jax.random.PRNGKey(0), feats)
        np.testing.assert_allclose(np.asarray(conv.apply(params, feats)),
                                   np.asarray(phase.apply(params, feats)),
                                   rtol=1e-5, atol=1e-5)

    def test_attention_matches_manual(self, rng):
        B, T, S, H, D = 2, 4, 6, 2, 8
        q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
        out = dot_product_attention(q, k, v, None)
        # manual per-head
        for b in range(B):
            for h in range(H):
                scores = np.asarray(q)[b, :, h] @ np.asarray(k)[b, :, h].T / np.sqrt(D)
                w = np.exp(scores - scores.max(-1, keepdims=True))
                w /= w.sum(-1, keepdims=True)
                want = w @ np.asarray(v)[b, :, h]
                np.testing.assert_allclose(np.asarray(out)[b, :, h], want, rtol=1e-4, atol=1e-5)


class TestForward:
    def test_shapes(self, setup):
        cfg, model, params, feats, flens, tgt, tlens = setup
        logits = model.apply(params, feats, flens, tgt, tlens)
        assert logits.shape == (2, 10, cfg.vocab_size)
        assert logits.dtype == jnp.float32
        assert np.isfinite(np.asarray(logits)).all()

    def test_encoder_padding_invariance(self, setup):
        """Changing audio content in padded frames must not change valid logits."""
        cfg, model, params, feats, flens, tgt, tlens = setup
        noisy = feats.at[1, 50:].set(99.0)  # utt 1 has only 50 valid frames
        a = model.apply(params, feats, flens, tgt, tlens)
        b = model.apply(params, noisy, flens, tgt, tlens)
        np.testing.assert_allclose(np.asarray(a[1, :7]), np.asarray(b[1, :7]),
                                   rtol=2e-3, atol=2e-3)

    def test_decoder_causality(self, setup):
        """Changing target token at position j must not affect logits at i<j."""
        cfg, model, params, feats, flens, tgt, tlens = setup
        tgt2 = tgt.at[0, 5].set((tgt[0, 5] + 1) % cfg.vocab_size)
        a = model.apply(params, feats, flens, tgt, tlens)
        b = model.apply(params, feats, flens, tgt2, tlens)
        np.testing.assert_allclose(np.asarray(a[0, :5]), np.asarray(b[0, :5]),
                                   rtol=1e-4, atol=1e-4)
        assert np.abs(np.asarray(a[0, 5:]) - np.asarray(b[0, 5:])).max() > 1e-4

    def test_dropout_changes_output(self, setup):
        cfg, model, params, feats, flens, tgt, tlens = setup
        a = model.apply(params, feats, flens, tgt, tlens, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        b = model.apply(params, feats, flens, tgt, tlens, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


class TestStepDecode:
    def test_step_matches_teacher_forced(self, setup):
        """KV-cached step decode must reproduce full-sequence logits."""
        cfg, model, params, feats, flens, tgt, tlens = setup
        full = model.apply(params, feats, flens, tgt, tlens)   # [B,U,V]

        memory, mem_lens = model.apply(params, feats, flens,
                                       method=SpeechTransformer.encode)
        U = tgt.shape[1]
        cache = model.apply(params, memory, U,
                            method=SpeechTransformer.init_cache)
        step_logits = []
        for i in range(U):
            lg, cache = model.apply(params, tgt[:, i], jnp.int32(i), cache,
                                    mem_lens, method=SpeechTransformer.decode_step)
            step_logits.append(np.asarray(lg))
        stepped = np.stack(step_logits, axis=1)
        # Compare only valid target positions: teacher-forced masks padded
        # query rows (excluded from loss), step decode does not distinguish.
        for b in range(2):
            n = int(tlens[b])
            np.testing.assert_allclose(stepped[b, :n], np.asarray(full)[b, :n],
                                       rtol=2e-3, atol=2e-3)

    def test_encode_matches_forward_memory(self, setup):
        cfg, model, params, feats, flens, tgt, tlens = setup
        memory, mem_lens = model.apply(params, feats, flens,
                                       method=SpeechTransformer.encode)
        assert memory.shape == (2, 15, cfg.d_model)
        assert mem_lens.tolist() == [15, 11]
        # padded memory rows are zeroed
        assert np.abs(np.asarray(memory)[1, 11:]).max() == 0.0


class TestPostLN:
    def test_post_ln_forward_and_step_decode(self):
        """paper-style post-LN variant: forward + KV-cache consistency."""
        cfg = tiny_config().model.replace(
            vocab_size=16, d_model=64, num_heads=2, d_ff=128,
            num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0,
            subsample_channels=8, normalize_before=False)
        model = SpeechTransformer(cfg)
        rng = jax.random.PRNGKey(0)
        feats = jax.random.normal(rng, (1, 64, 80))
        flens = jnp.array([64])
        tgt = jax.random.randint(rng, (1, 5), 4, 16)
        tlens = jnp.array([5])
        params = model.init({"params": rng}, feats, flens, tgt, tlens)
        full = np.asarray(model.apply(params, feats, flens, tgt, tlens))
        assert np.isfinite(full).all()

        memory, mem_lens = model.apply(params, feats, flens,
                                       method=SpeechTransformer.encode)
        cache = model.apply(params, memory, 5,
                            method=SpeechTransformer.init_cache)
        outs = []
        for i in range(5):
            lg, cache = model.apply(params, tgt[:, i], jnp.int32(i), cache,
                                    mem_lens,
                                    method=SpeechTransformer.decode_step)
            outs.append(np.asarray(lg))
        stepped = np.stack(outs, 1)
        np.testing.assert_allclose(stepped[0], full[0], rtol=2e-3, atol=2e-3)


def test_remat_config_runs_and_matches(rng):
    """remat=True (Large/Sharded presets) must run and equal non-remat."""
    base = tiny_config().model.replace(
        vocab_size=16, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        subsample_channels=8)
    feats = jnp.asarray(rng.standard_normal((2, 64, 80)).astype(np.float32))
    flens = jnp.array([64, 50])
    tgt = jnp.asarray(rng.integers(4, 16, (2, 6)).astype(np.int32))
    tlens = jnp.array([6, 4])

    outs = {}
    for remat in (False, True):
        cfg = base.replace(remat=remat)
        model = SpeechTransformer(cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, feats, flens,
                            tgt, tlens)
        loss_fn = lambda p: jnp.sum(model.apply(p, feats, flens, tgt, tlens,
                                                deterministic=False,
                                                rngs={"dropout": jax.random.PRNGKey(1)}) ** 2)
        outs[remat] = (float(loss_fn(params)),
                       jax.grad(loss_fn)(params))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_attention_remat_matches(rng):
    """attention_remat (default) must give the same loss/grads as saving the
    softmax-weight residuals (the checkpoint replays identical ops), with
    dropout active so the rbg bits are exercised through the replay."""
    base = tiny_config().model.replace(
        vocab_size=16, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.1,
        attention_dropout_rate=0.1, subsample_channels=8)
    feats = jnp.asarray(rng.standard_normal((2, 64, 80)).astype(np.float32))
    flens = jnp.array([64, 50])
    tgt = jnp.asarray(rng.integers(4, 16, (2, 6)).astype(np.int32))
    tlens = jnp.array([6, 4])

    outs = {}
    for attn_remat in (False, True):
        cfg = base.replace(attention_remat=attn_remat)
        model = SpeechTransformer(cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, feats, flens,
                            tgt, tlens)
        loss_fn = lambda p: jnp.sum(model.apply(p, feats, flens, tgt, tlens,
                                                deterministic=False,
                                                rngs={"dropout": jax.random.PRNGKey(1)}) ** 2)
        outs[attn_remat] = (float(loss_fn(params)), jax.grad(loss_fn)(params))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_attention_bf16_weights(rng):
    """bf16-residual attention core (attention_bf16_weights, default):
    forward must equal the plain path exactly (same softmax-f32 → bf16-cast
    → AV math), and gradients must agree to bf16-rounding tolerance (the
    backward consumes bf16 weights instead of the saved f32 tensor)."""
    base = tiny_config().model.replace(
        vocab_size=16, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        dtype="bfloat16", subsample_channels=8)
    feats = jnp.asarray(rng.standard_normal((2, 64, 80)).astype(np.float32))
    flens = jnp.array([64, 50])
    tgt = jnp.asarray(rng.integers(4, 16, (2, 6)).astype(np.int32))
    tlens = jnp.array([6, 4])

    outs = {}
    for bf16w in (False, True):
        cfg = base.replace(attention_bf16_weights=bf16w)
        model = SpeechTransformer(cfg)
        params = model.init({"params": jax.random.PRNGKey(0)}, feats, flens,
                            tgt, tlens)
        fwd = model.apply(params, feats, flens, tgt, tlens)
        loss_fn = lambda p: jnp.mean(
            model.apply(p, feats, flens, tgt, tlens) ** 2)
        outs[bf16w] = (np.asarray(fwd), float(loss_fn(params)),
                       jax.grad(loss_fn)(params))
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-6)
    ref_leaves = [np.asarray(x, np.float32)
                  for x in jax.tree.leaves(outs[False][2])]
    gscale = max(np.abs(x).max() for x in ref_leaves)
    for a, b in zip(ref_leaves, jax.tree.leaves(outs[True][2])):
        b = np.asarray(b, np.float32)
        assert np.isfinite(b).all()
        # leaves at bf16-noise magnitude relative to the global gradient
        # scale are covered by the atol term (bf16 eps is 7.8e-3; the bound
        # must also absorb run-to-run f32 accumulation-order variance in the
        # f32 reference itself — 2e-3 was flaky at exactly that margin)
        np.testing.assert_allclose(b, a, rtol=0.05, atol=4e-3 * gscale)


def test_scan_layers_matches_loop(rng):
    """nn.scan-stacked encoder == python-loop encoder given identical
    (transplanted) parameters."""
    import flax
    base = tiny_config().model.replace(
        vocab_size=16, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=3, num_decoder_layers=1, dropout_rate=0.0,
        subsample_channels=8)
    feats = jnp.asarray(rng.standard_normal((2, 64, 80)).astype(np.float32))
    flens = jnp.array([64, 50])
    tgt = jnp.asarray(rng.integers(4, 16, (2, 6)).astype(np.int32))
    tlens = jnp.array([6, 4])

    loop_model = SpeechTransformer(base.replace(scan_layers=False))
    scan_model = SpeechTransformer(base.replace(scan_layers=True, remat=True))
    lp = loop_model.init({"params": jax.random.PRNGKey(0)}, feats, flens,
                         tgt, tlens)
    sp = scan_model.init({"params": jax.random.PRNGKey(0)}, feats, flens,
                         tgt, tlens)
    enc = lp["params"]["encoder"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[enc[f"layer_{i}"] for i in range(3)])
    new_params = {"params": {
        **sp["params"],
        "encoder": {**sp["params"]["encoder"], "layers": {"layer": stacked},
                    "subsample": enc["subsample"],
                    "final_norm": enc["final_norm"]},
        "decoder": lp["params"]["decoder"]}}
    out_loop = np.asarray(loop_model.apply(lp, feats, flens, tgt, tlens))
    out_scan = np.asarray(scan_model.apply(new_params, feats, flens, tgt,
                                           tlens))
    np.testing.assert_allclose(out_scan, out_loop, rtol=1e-5, atol=1e-5)


def test_fused_qkv_matches_unfused():
    """Packing unfused q/k/v kernels into the fused [d,3,H,Dh] layout gives
    bit-identical logits (f32) — fused_qkv is a pure layout change."""
    rng = jax.random.PRNGKey(3)
    cfg = tiny_config()
    mcfg_u = cfg.model.replace(fused_qkv=False, dropout_rate=0.0)
    mcfg_f = cfg.model.replace(fused_qkv=True, dropout_rate=0.0)
    b, t, u = 2, 64, 10
    feats = jax.random.normal(rng, (b, t, mcfg_u.input_dim), jnp.float32)
    fl = jnp.array([t, t // 2], jnp.int32)
    ti = jax.random.randint(rng, (b, u), 4, mcfg_u.vocab_size)
    tl = jnp.array([u, u - 3], jnp.int32)

    m_u = SpeechTransformer(mcfg_u)
    m_f = SpeechTransformer(mcfg_f)
    p_u = m_u.init({"params": jax.random.PRNGKey(0)}, feats, fl, ti, tl)
    p_f = jax.tree.map(lambda x: x, m_f.init(
        {"params": jax.random.PRNGKey(0)}, feats, fl, ti, tl))

    # Pack q/k/v kernels+biases of every self_attn into the fused layout.
    import flax
    flat_u = flax.traverse_util.flatten_dict(p_u["params"])
    flat_f = flax.traverse_util.flatten_dict(p_f["params"])
    for key in list(flat_f):
        if "qkv" in key:
            base = key[:key.index("qkv")]
            leaf = key[key.index("qkv") + 1]
            packed = jnp.stack(
                [flat_u[base + (n, leaf)] for n in ("q", "k", "v")],
                axis=-3 if leaf == "kernel" else -3)
            assert packed.shape == flat_f[key].shape, (key, packed.shape,
                                                       flat_f[key].shape)
            flat_f[key] = packed
    p_f = {"params": flax.traverse_util.unflatten_dict(flat_f)}

    out_u = m_u.apply(p_u, feats, fl, ti, tl)
    out_f = m_f.apply(p_f, feats, fl, ti, tl)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_f),
                               rtol=0, atol=0)

    # Step decode parity under the fused layout too.
    mem_f, mem_lens = m_f.apply(p_f, feats, fl, method=m_f.encode)
    cache = m_f.apply(p_f, mem_f, 4, method=m_f.init_cache)
    logits_step, _ = m_f.apply(p_f, ti[:, 0], jnp.int32(0), cache, mem_lens,
                               method=m_f.decode_step)
    assert np.isfinite(np.asarray(logits_step)).all()
