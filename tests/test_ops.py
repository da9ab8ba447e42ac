"""Unit tests: masks, label-smoothed CE, Noam schedule, CER metrics
(SURVEY.md §4 "Unit")."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.ops import losses, masks, metrics, schedules


class TestMasks:
    def test_length_mask(self):
        m = masks.length_mask(jnp.array([3, 0, 5]), 5)
        want = np.array([[1, 1, 1, 0, 0], [0, 0, 0, 0, 0], [1, 1, 1, 1, 1]], bool)
        np.testing.assert_array_equal(np.asarray(m), want)

    def test_causal_mask(self):
        m = np.asarray(masks.causal_mask(4))
        assert m.tolist() == np.tril(np.ones((4, 4), bool)).tolist()

    def test_self_attention_mask_causal_pad(self):
        m = np.asarray(masks.self_attention_mask(jnp.array([2]), 3, causal=True))[0, 0]
        want = np.array([[1, 0, 0], [1, 1, 0], [0, 0, 0]], bool)
        np.testing.assert_array_equal(m, want)

    def test_bias_values(self):
        b = np.asarray(masks.mask_to_bias(jnp.array([True, False])))
        assert b[0] == 0.0 and b[1] <= -1e8

    def test_padding_attention_mask(self):
        m = np.asarray(masks.padding_attention_mask(2, jnp.array([1]), 3))
        assert m.shape == (1, 1, 2, 3)
        np.testing.assert_array_equal(m[0, 0], [[1, 0, 0], [1, 0, 0]])


class TestLabelSmoothedCE:
    def _golden(self, logits, targets, eps, pad_id):
        """Direct formula with explicit smoothed distribution."""
        B, U, V = logits.shape
        lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        lp = np.asarray(lp, np.float64)
        total, count = 0.0, 0
        for b in range(B):
            for u in range(U):
                y = targets[b, u]
                if y == pad_id:
                    continue
                dist = np.full(V, eps / (V - 1))
                dist[y] = 1.0 - eps
                total += -(dist * lp[b, u]).sum()
                count += 1
        return total / max(count, 1)

    def test_matches_golden(self, rng):
        B, U, V = 2, 5, 11
        logits = rng.standard_normal((B, U, V)).astype(np.float32)
        targets = rng.integers(0, V, (B, U)).astype(np.int32)
        targets[0, 3:] = 0  # pad tail
        loss, count = losses.label_smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), smoothing=0.1)
        want = self._golden(logits, targets, 0.1, 0)
        assert float(count) == (targets != 0).sum()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_zero_smoothing_is_ce(self, rng):
        B, U, V = 2, 4, 7
        logits = rng.standard_normal((B, U, V)).astype(np.float32)
        targets = rng.integers(1, V, (B, U)).astype(np.int32)
        loss, _ = losses.label_smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), smoothing=0.0)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        want = -np.mean([lp[b, u, targets[b, u]] for b in range(B) for u in range(U)])
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_perfect_prediction_low_loss(self):
        V = 5
        targets = jnp.array([[1, 2, 3]])
        logits = jax.nn.one_hot(targets, V) * 100.0
        loss, _ = losses.label_smoothed_cross_entropy(logits, targets, smoothing=0.0)
        assert float(loss) < 1e-3

    def test_token_accuracy(self):
        logits = jax.nn.one_hot(jnp.array([[1, 2, 4]]), 5) * 10.0
        acc = losses.token_accuracy(logits, jnp.array([[1, 2, 3]]))
        np.testing.assert_allclose(float(acc), 2.0 / 3.0, rtol=1e-6)


class TestNoam:
    def test_known_values(self):
        d, w = 512, 4000
        sched = schedules.noam_schedule(d, w)
        for step in [1, 100, 4000, 16000]:
            want = d ** -0.5 * min(step ** -0.5, step * w ** -1.5)
            np.testing.assert_allclose(float(sched(jnp.int32(step))), want, rtol=1e-6)

    def test_peak_at_warmup(self):
        sched = schedules.noam_schedule(256, 1000)
        vals = [float(sched(jnp.int32(s))) for s in [500, 1000, 2000]]
        assert vals[1] >= vals[0] and vals[1] >= vals[2]

    def test_optimizer_updates(self):
        opt = schedules.make_optimizer(64, 100)
        params = {"w": jnp.ones((3,))}
        state = opt.init(params)
        grads = {"w": jnp.full((3,), 2.0)}
        updates, state = opt.update(grads, state, params)
        assert np.asarray(updates["w"]).shape == (3,)
        assert np.isfinite(np.asarray(updates["w"])).all()


class TestMetrics:
    def test_edit_distance_basic(self):
        assert metrics.edit_distance([1, 2, 3], [1, 2, 3]) == 0
        assert metrics.edit_distance([1, 2, 3], [1, 3]) == 1
        assert metrics.edit_distance([], [1, 2]) == 2
        assert metrics.edit_distance([1, 2], []) == 2
        assert metrics.edit_distance([1, 2, 3], [4, 5, 6]) == 3
        assert metrics.edit_distance([1, 2, 3, 4], [2, 3, 4, 5]) == 2

    def test_python_vs_native_agree(self, rng):
        for _ in range(20):
            a = rng.integers(0, 10, rng.integers(0, 30)).tolist()
            b = rng.integers(0, 10, rng.integers(0, 30)).tolist()
            assert metrics.edit_distance(a, b) == metrics._edit_distance_py(a, b)

    def test_cer(self):
        out = metrics.cer([[1, 2, 3, 4]], [[1, 2, 3]])
        np.testing.assert_allclose(out["cer"], 25.0)

    def test_cer_native_corpus_vs_python_agree(self, rng):
        """The batched flat-buffer C++ corpus path (one ctypes call for the
        whole eval set) must score identically to the pure-Python per-pair
        loop, including empty refs/hyps mixed in."""
        refs = [rng.integers(0, 10, rng.integers(0, 30)).tolist()
                for _ in range(37)]
        hyps = [rng.integers(0, 10, rng.integers(0, 30)).tolist()
                for _ in range(37)]
        refs[5], hyps[9] = [], []          # empty-sequence edges
        want_err = sum(metrics._edit_distance_py(r, h)
                       for r, h in zip(refs, hyps))
        want_tot = sum(len(r) for r in refs)
        out = metrics.cer(refs, hyps)
        assert out["errors"] == float(want_err)
        assert out["ref_tokens"] == float(want_tot)
        lib = metrics._load_native()
        if lib is not None:   # exercise the native entry point directly
            err, tot = metrics._corpus_errors_native(lib, refs, hyps)
            assert (err, tot) == (want_err, want_tot)

    def test_wer(self):
        out = metrics.wer([["hello", "world"]], [["hello", "there"]])
        np.testing.assert_allclose(out["wer"], 50.0)


def test_config_roundtrip_from_dict():
    from speech_tranformer_pytorch_tpu.config import (config_from_dict,
                                                      get_config)
    cfg = get_config("large", **{"model.d_model": 640})
    d = cfg.to_dict()
    cfg2 = config_from_dict(d)
    assert cfg2.model.d_model == 640
    assert cfg2.config_hash() == cfg.config_hash()
    assert cfg2.data.bucket_boundaries == cfg.data.bucket_boundaries


def test_cli_resolve_config_with_data_dir(tmp_path):
    """cli_common wires vocab size + manifest paths from --data-dir."""
    import argparse
    from speech_tranformer_pytorch_tpu.cli_common import (add_common_args,
                                                          resolve_config)
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic
    paths = prepare_synthetic(str(tmp_path), num_train=4, num_dev=2,
                              num_test=2, vocab_size=16, seed=0)
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    args = ap.parse_args(["--preset", "tiny", "--data-dir", str(tmp_path),
                          "--set", "train.batch_size=3"])
    cfg = resolve_config(args)
    assert cfg.data.train_manifest.endswith("train.jsonl")
    assert cfg.data.vocab_path.endswith("vocab.json")
    assert cfg.train.batch_size == 3
    # vocab_size pulled from the built vocab (specials + seen chars)
    from speech_tranformer_pytorch_tpu.data.tokenizer import load_tokenizer
    assert cfg.model.vocab_size == load_tokenizer(paths["vocab"]).vocab_size


def test_config_validate():
    from speech_tranformer_pytorch_tpu.config import get_config
    # all presets validate
    for name in ("tiny", "base", "large", "librispeech", "sharded"):
        get_config(name).validate()
    cfg = get_config("base", **{"model.num_heads": 7})
    with pytest.raises(ValueError, match="not divisible"):
        cfg.validate()
    cfg = get_config("base", **{"data.max_target_len": 9999})
    with pytest.raises(ValueError, match="positional table"):
        cfg.validate()


class TestQuantizedDropout:
    def test_statistics_and_scale(self):
        import jax
        import jax.numpy as jnp
        from speech_tranformer_pytorch_tpu.ops.dropout import dropout_quantized
        x = jnp.ones((512, 512), jnp.float32)
        rate = 0.1
        y = dropout_quantized(jax.random.PRNGKey(0), x, rate)
        q = round(rate * 256)
        keep_frac = float((y > 0).mean())
        assert abs(keep_frac - (256 - q) / 256) < 0.01
        # unbiased: E[y] == E[x]
        assert abs(float(y.mean()) - 1.0) < 0.02
        # kept elements carry the exact inverse-keep scale
        kept = y[y > 0]
        assert float(jnp.max(jnp.abs(kept - 256.0 / (256 - q)))) < 1e-6

    def test_edge_rates(self):
        import jax
        import jax.numpy as jnp
        from speech_tranformer_pytorch_tpu.ops.dropout import dropout_quantized
        x = jnp.ones((16,), jnp.float32)
        assert (dropout_quantized(jax.random.PRNGKey(0), x, 0.0) == x).all()
        assert (dropout_quantized(jax.random.PRNGKey(0), x, 0.001) == x).all()
        assert (dropout_quantized(jax.random.PRNGKey(0), x, 1.0) == 0).all()

    def test_module_deterministic_passthrough(self):
        import jax
        import jax.numpy as jnp
        from speech_tranformer_pytorch_tpu.ops.dropout import Dropout
        x = jnp.arange(8.0)
        m = Dropout(0.5)
        y = m.apply({}, x, deterministic=True)
        assert (y == x).all()
        y1 = m.apply({}, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
        y2 = m.apply({}, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
        assert (y1 == y2).all()


class TestFusedAdam:
    """Fused Pallas Adam (ops/fused_adam.py) must match the optax chain
    clip_by_global_norm -> adam(noam) step for step (interpret mode on
    CPU; the TPU path is the same kernel compiled)."""

    def _trees(self, seed=0):
        import jax
        import jax.numpy as jnp
        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k, 6)
        params = {
            "w": jax.random.normal(ks[0], (37, 129), jnp.float32),
            "b": jax.random.normal(ks[1], (129,), jnp.float32),
            "nested": {"e": jax.random.normal(ks[2], (300,), jnp.float32)},
        }
        grads = jax.tree.map(
            lambda x: jax.random.normal(
                jax.random.fold_in(ks[3], x.size), x.shape, jnp.float32) *
                (10.0 if x.ndim == 1 else 0.1),   # exercise clip triggering
            params)
        return params, grads

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    @pytest.mark.parametrize("clip,wd", [(5.0, 0.0), (0.05, 0.0),
                                         (5.0, 0.01), (0.0, 0.0)])
    def test_matches_optax(self, clip, wd, impl):
        import jax
        import jax.numpy as jnp
        from speech_tranformer_pytorch_tpu.ops.fused_adam import FusedAdam
        from speech_tranformer_pytorch_tpu.ops.schedules import (
            make_optimizer, noam_schedule)
        import optax

        params, grads = self._trees()
        schedule = noam_schedule(64, 100, 1.0)
        fused = FusedAdam(schedule, b1=0.9, b2=0.98, eps=1e-9,
                          grad_clip_norm=clip, weight_decay=wd, impl=impl)
        tx = make_optimizer(64, 100, scale=1.0, b1=0.9, b2=0.98, eps=1e-9,
                            grad_clip_norm=clip, weight_decay=wd)

        fstate = fused.init(params)
        ostate = tx.init(params)
        fp, op = params, params
        fstep = jax.jit(fused.update_apply)
        for step in range(4):
            g = jax.tree.map(lambda x: x * (0.5 ** step), grads)
            fp, fstate = fstep(g, fstate, fp)
            updates, ostate = tx.update(g, ostate, op)
            op = optax.apply_updates(op, updates)
            for a, b in zip(jax.tree.leaves(op), jax.tree.leaves(fp)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=1e-6, atol=1e-7)

    def test_typed_adam_f32_matches_optax_exactly(self):
        """scale_by_adam_typed(float32) is a bit-for-bit replacement for
        the optax adam chain (the typed transform only changes STORAGE;
        with f32 storage nothing changes)."""
        import jax
        import optax
        from speech_tranformer_pytorch_tpu.ops.schedules import make_optimizer

        params, grads = self._trees(2)
        tx_ref = make_optimizer(64, 100, grad_clip_norm=5.0)
        tx_typed = make_optimizer(64, 100, grad_clip_norm=5.0,
                                  moment_dtype="float32")
        # f32 moment_dtype routes through the plain optax chain
        sr, st = tx_ref.init(params), tx_typed.init(params)
        pr = pt = params
        for step in range(3):
            ur, sr = tx_ref.update(grads, sr, pr)
            pr = optax.apply_updates(pr, ur)
            ut, st = tx_typed.update(grads, st, pt)
            pt = optax.apply_updates(pt, ut)
        for a, b in zip(jax.tree.leaves(pr), jax.tree.leaves(pt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_typed_adam_transform_matches_scale_by_adam(self):
        """The typed transform itself (not via make_optimizer) at f32 must
        equal optax.scale_by_adam step for step."""
        import jax
        import optax
        from speech_tranformer_pytorch_tpu.ops.schedules import \
            scale_by_adam_typed

        params, grads = self._trees(3)
        a = optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9)
        b = scale_by_adam_typed(b1=0.9, b2=0.98, eps=1e-9,
                                moment_dtype="float32")
        sa, sb = a.init(params), b.init(params)
        for _ in range(3):
            ua, sa = a.update(grads, sa)
            ub, sb = b.update(grads, sb)
            for x, y in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
                np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                           rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("path", ["optax", "fused_xla", "fused_pallas"])
    def test_bf16_moments_track_f32(self, path):
        """bf16 moment storage (train.moment_dtype): state is half-width
        and the trajectory stays within bf16 rounding of the f32 run over
        several steps (tolerance, not exactness — the moments are rounded
        on every store)."""
        import jax
        import jax.numpy as jnp
        import optax
        from speech_tranformer_pytorch_tpu.ops.fused_adam import FusedAdam
        from speech_tranformer_pytorch_tpu.ops.schedules import (
            make_optimizer, noam_schedule)

        params, grads = self._trees(4)

        def run(moment_dtype):
            if path == "optax":
                tx = make_optimizer(64, 100, grad_clip_norm=5.0,
                                    moment_dtype=moment_dtype)
                s = tx.init(params)
                p = params
                for step in range(8):
                    g = jax.tree.map(lambda x: x * (0.7 ** step), grads)
                    u, s = tx.update(g, s, p)
                    p = optax.apply_updates(p, u)
                return p, s
            fused = FusedAdam(noam_schedule(64, 100), grad_clip_norm=5.0,
                              impl=("pallas" if path == "fused_pallas"
                                    else "xla"),
                              moment_dtype=moment_dtype)
            s = fused.init(params)
            p = params
            step_fn = jax.jit(fused.update_apply)
            for step in range(8):
                g = jax.tree.map(lambda x: x * (0.7 ** step), grads)
                p, s = step_fn(g, s, p)
            return p, s

        p16, s16 = run("bfloat16")
        p32, _ = run("float32")
        moments = (s16.mu if hasattr(s16, "mu")
                   else None)
        if moments is None:    # optax chain: find the ScaleByAdamState
            moments = [l for l in jax.tree.leaves(s16)
                       if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
            assert moments, "no bf16 state leaves found in the optax chain"
        else:
            for leaf in jax.tree.leaves(moments):
                assert leaf.dtype == jnp.bfloat16
        for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-2, atol=5e-4)

    def test_shared_grad_norm_argument(self):
        import jax
        import optax
        from speech_tranformer_pytorch_tpu.ops.fused_adam import FusedAdam
        from speech_tranformer_pytorch_tpu.ops.schedules import noam_schedule
        params, grads = self._trees(1)
        fused = FusedAdam(noam_schedule(64, 100), grad_clip_norm=1.0)
        st = fused.init(params)
        p1, _ = fused.update_apply(grads, st, params)
        p2, _ = fused.update_apply(grads, st, params,
                                   grad_norm=optax.global_norm(grads))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
