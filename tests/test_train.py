"""Integration anchor (SURVEY.md §4): Tiny config overfits a 10-utterance
synthetic subset and greedy decode reproduces the training transcripts
exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.data.synthetic import (
    batch_from_dataset, make_synthetic_dataset)
from speech_tranformer_pytorch_tpu.decoding import (greedy_decode_jit,
                                                    tokens_to_lists)
from speech_tranformer_pytorch_tpu.train import (TrainState, build_model,
                                                 create_train_state,
                                                 make_eval_step,
                                                 make_train_step, make_tx)


@pytest.fixture(scope="module")
def overfit_setup():
    cfg = tiny_config()
    # Small model is enough for 10 synthetic tone-utterances; keep CI fast.
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=32, d_model=128, num_heads=4, d_ff=256,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        subsample_channels=16))
    ds = make_synthetic_dataset(10, vocab_size=32, seed=0)
    batch = batch_from_dataset(ds, cfg.features)
    return cfg, ds, batch


def test_train_step_runs_and_metrics(overfit_setup):
    cfg, ds, batch = overfit_setup
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert float(metrics["audio_seconds"]) > 0
    assert float(metrics["tokens"]) == float(jnp.sum(batch.target_lens))


def test_overfit_and_exact_greedy_decode(overfit_setup):
    """The end-to-end anchor: loss -> ~smoothing floor, decode == transcripts."""
    cfg, ds, batch = overfit_setup
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    rng = jax.random.PRNGKey(42)
    first_loss = None
    for i in range(300):
        state, metrics = step(state, batch, rng)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < first_loss * 0.35, (first_loss, final_loss)

    model = build_model(cfg)
    tokens, lengths = jax.jit(
        lambda p, f, l: greedy_decode_jit(model, p, f, l, max_len=8)
    )(state.params, batch.feats, batch.frame_lens)
    hyps = tokens_to_lists(tokens, lengths)
    assert hyps == ds.transcripts, list(zip(ds.transcripts, hyps))


def test_overfit_with_bf16_moments(overfit_setup):
    """Convergence anchor for train.moment_dtype='bfloat16' (VERDICT r3
    item #8): the half-width optimizer state must not break optimization —
    same overfit criterion as the f32 anchor, and the checkpointable state
    really is bf16."""
    cfg, ds, batch = overfit_setup
    cfg = cfg.replace(train=cfg.train.replace(moment_dtype="bfloat16"))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    bf16_leaves = [l for l in jax.tree.leaves(state.opt_state)
                   if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert bf16_leaves, "optimizer state has no bf16 moments"
    step = make_train_step(cfg)
    rng = jax.random.PRNGKey(42)
    first_loss = None
    for i in range(300):
        state, metrics = step(state, batch, rng)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < first_loss * 0.35, (first_loss, final_loss)


def test_eval_step_deterministic(overfit_setup):
    cfg, ds, batch = overfit_setup
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ev = make_eval_step(cfg)
    m1 = ev(state.params, batch)
    m2 = ev(state.params, batch)
    assert float(m1["loss"]) == float(m2["loss"])


def test_state_is_pytree(overfit_setup):
    cfg, ds, batch = overfit_setup
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    leaves = jax.tree.leaves(state)
    assert len(leaves) > 10
    # donation-compatible: flatten/unflatten roundtrip
    flat, treedef = jax.tree.flatten(state)
    state2 = jax.tree.unflatten(treedef, flat)
    assert int(state2.step) == int(state.step)


def test_trainer_dev_cer(tmp_path):
    """Trainer end-to-end with dev greedy-CER (synthetic corpus)."""
    import os
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic
    from speech_tranformer_pytorch_tpu.runner import Trainer

    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=32, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0,
        subsample_channels=8))
    cfg = cfg.replace(train=cfg.train.replace(
        batch_size=8, num_epochs=1, log_every=5, checkpoint_every_steps=100))
    paths = prepare_synthetic(str(tmp_path / "c"), num_train=8, num_dev=4,
                              num_test=2, vocab_size=16, seed=0)
    tr = Trainer(cfg, work_dir=str(tmp_path / "w"),
                 train_manifest=paths["train"], dev_manifest=paths["dev"])
    tr.train(max_steps=2)
    dev = tr.evaluate(decode_cer=True)
    assert "cer" in dev and 0.0 <= dev["cer"]
    assert dev["tokens"] > 0


def test_best_model_tracking_resume_safe(tmp_path):
    """VERDICT r3 item #4: best_dev_loss survives checkpoint/resume, so a
    resumed run's first (worse) dev eval leaves work_dir/best untouched —
    only a genuinely better dev loss overwrites the pre-crash best."""
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic
    from speech_tranformer_pytorch_tpu.runner import Trainer
    from speech_tranformer_pytorch_tpu.utils.checkpoint import Checkpointer

    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=32, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0,
        subsample_channels=8))
    cfg = cfg.replace(train=cfg.train.replace(
        batch_size=4, num_epochs=50, log_every=100,
        checkpoint_every_steps=100, eval_every_steps=0))
    paths = prepare_synthetic(str(tmp_path / "c"), num_train=8, num_dev=0,
                              num_test=0, vocab_size=16, seed=0)
    wd = str(tmp_path / "w")

    tr = Trainer(cfg, work_dir=wd, train_manifest=paths["train"])
    tr.evaluate = lambda **kw: {"loss": 1.0, "tokens": 10.0}
    tr._dev_eval(0, 0)                       # best model @ step 0, loss 1.0
    assert tr.best_dev_loss == 1.0
    tr.train(max_steps=2)                    # _finish persists best meta

    tr2 = Trainer(cfg, work_dir=wd, train_manifest=paths["train"],
                  resume=True)
    assert tr2.best_dev_loss == 1.0, "best_dev_loss not restored on resume"
    assert tr2.best_dev_step == 0

    tr2.evaluate = lambda **kw: {"loss": 2.0, "tokens": 10.0}   # worse
    tr2._dev_eval(0, 0)
    assert tr2.best_dev_loss == 1.0
    best = Checkpointer(f"{wd}/best")
    assert best.latest_step() == 0, "worse dev eval overwrote work_dir/best"
    best.close()

    tr2.evaluate = lambda **kw: {"loss": 0.5, "tokens": 10.0}   # better
    tr2._dev_eval(0, 0)
    assert tr2.best_dev_loss == 0.5
    tr2.best_ckpt.wait()
    best = Checkpointer(f"{wd}/best")
    assert best.latest_step() == 2
    best.close()


def test_trainer_grain_pipeline(tmp_path):
    """Trainer with the grain-backed pipeline selected via config."""
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic
    from speech_tranformer_pytorch_tpu.runner import Trainer

    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=32, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0,
        subsample_channels=8))
    cfg = cfg.replace(
        train=cfg.train.replace(batch_size=4, num_epochs=2,
                                checkpoint_every_steps=100),
        data=cfg.data.replace(pipeline="grain", max_target_len=32,
                              bucket_boundaries=(100, 200, 300, 512)))
    paths = prepare_synthetic(str(tmp_path / "c"), num_train=8, num_dev=0,
                              num_test=0, vocab_size=16, seed=0)
    tr = Trainer(cfg, work_dir=str(tmp_path / "w"),
                 train_manifest=paths["train"])
    state = tr.train(max_steps=2)
    assert int(state.step) == 2


def test_mixed_precision_master_copy(overfit_setup):
    """train.mixed_precision: params/opt-state stay f32 masters; the bf16
    compute path tracks the full-precision path closely for a few steps."""
    cfg, ds, batch = overfit_setup
    cfg_bf16 = cfg.replace(model=cfg.model.replace(dtype="bfloat16"))
    cfg_mp = cfg_bf16.replace(train=cfg_bf16.train.replace(mixed_precision=True))
    cfg_full = cfg_bf16.replace(train=cfg_bf16.train.replace(mixed_precision=False))

    rng = jax.random.PRNGKey(7)
    state_mp = create_train_state(cfg_mp, jax.random.PRNGKey(0), batch)
    state_full = create_train_state(cfg_full, jax.random.PRNGKey(0), batch)
    step_mp = make_train_step(cfg_mp, donate=False)
    step_full = make_train_step(cfg_full, donate=False)

    for _ in range(5):
        state_mp, m_mp = step_mp(state_mp, batch, rng)
        state_full, m_full = step_full(state_full, batch, rng)

    # Masters stay f32 after updates.
    for leaf in jax.tree.leaves(state_mp.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    loss_mp, loss_full = float(m_mp["loss"]), float(m_full["loss"])
    assert np.isfinite(loss_mp) and np.isfinite(loss_full)
    # Same model family, same data: bf16-weight compute drifts only slightly
    # from f32-weight compute over 5 steps.
    assert abs(loss_mp - loss_full) / max(abs(loss_full), 1e-6) < 0.05, (
        loss_mp, loss_full)


def test_dropout_rng_impls(overfit_setup):
    """rbg dropout keys: deterministic, distinct per step, and the step
    trains the same model family as threefry (different masks, same
    distribution)."""
    from speech_tranformer_pytorch_tpu.train import dropout_key, rekey_dropout

    base = jax.random.PRNGKey(5)
    k0 = dropout_key(base, jnp.int32(0), "rbg")
    k0b = dropout_key(base, jnp.int32(0), "rbg")
    k1 = dropout_key(base, jnp.int32(1), "rbg")
    assert jnp.array_equal(jax.random.key_data(k0), jax.random.key_data(k0b))
    assert not jnp.array_equal(jax.random.key_data(k0), jax.random.key_data(k1))
    # bernoulli under the rbg key actually differs across steps
    m0 = jax.random.bernoulli(k0, 0.5, (128,))
    m1 = jax.random.bernoulli(k1, 0.5, (128,))
    assert not jnp.array_equal(m0, m1)
    with pytest.raises(ValueError):
        rekey_dropout(base, "bogus")

    cfg, ds, batch = overfit_setup
    for impl in ("rbg", "threefry"):
        c = cfg.replace(train=cfg.train.replace(dropout_rng_impl=impl))
        c = c.replace(model=c.model.replace(dropout_rate=0.1))
        state = create_train_state(c, jax.random.PRNGKey(0), batch)
        step = make_train_step(c, donate=False)
        state, m = step(state, batch, jax.random.PRNGKey(1))
        s2, m2 = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m2["loss"])), impl


def test_train_cli_resume_uses_saved_config(tmp_path):
    """--resume takes the run's saved config.json as base (recognize_cli
    contract): a library-default change between versions must not silently
    alter a resumed run's optimizer/data semantics."""
    from speech_tranformer_pytorch_tpu import train_cli
    from speech_tranformer_pytorch_tpu.config import config_from_dict
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic
    import json

    prepare_synthetic(str(tmp_path / "c"), num_train=4, num_dev=0,
                      num_test=0, vocab_size=16, seed=0)
    wd = str(tmp_path / "w")
    common = ["--preset", "tiny", "--data-dir", str(tmp_path / "c"),
              "--work-dir", wd,
              "--set", "model.d_model=32", "--set", "model.num_heads=2",
              "--set", "model.d_ff=64", "--set", "model.num_encoder_layers=1",
              "--set", "model.num_decoder_layers=1",
              "--set", "model.subsample_channels=4",
              "--set", "train.batch_size=4",
              "--set", "train.checkpoint_every_steps=2"]
    # First run pins a NON-default moment dtype.
    train_cli.main(common + ["--set", "train.moment_dtype=float32",
                             "--max-steps", "2"])
    cfg0 = config_from_dict(json.load(open(f"{wd}/config.json")))
    assert cfg0.train.moment_dtype == "float32"
    # Resume WITHOUT the flag: the saved config must win over the library
    # default (bfloat16).
    train_cli.main(common + ["--resume", "--max-steps", "4"])
    cfg1 = config_from_dict(json.load(open(f"{wd}/config.json")))
    assert cfg1.train.moment_dtype == "float32"


def test_master_weights_matches_classic_scheme(overfit_setup):
    """train.master_weights: params live in bf16, the f32 master in the
    optimizer state. The rounding points are IDENTICAL to the classic
    f32-params + per-step-cast scheme (model computes on the same bf16
    values; the boundary cast bf16->f32 is exact), so the master must
    track the classic f32 params BIT-exactly — the scheme only removes
    the cast traffic, not precision."""
    cfg, ds, batch = overfit_setup
    cfg = cfg.replace(model=cfg.model.replace(dtype="bfloat16"))
    base = cfg.replace(train=cfg.train.replace(fused_optimizer=True))
    cfg_m = base.replace(train=base.train.replace(master_weights=True))
    base = base.validate()
    cfg_m = cfg_m.validate()

    s_c = create_train_state(base, jax.random.PRNGKey(0), batch)
    s_m = create_train_state(cfg_m, jax.random.PRNGKey(0), batch)
    for leaf in jax.tree.leaves(s_m.params):
        assert leaf.dtype == jnp.bfloat16, leaf.dtype
    for leaf in jax.tree.leaves(s_m.opt_state.master):
        assert leaf.dtype == jnp.float32

    step_c = make_train_step(base, donate=False)
    step_m = make_train_step(cfg_m, donate=False)
    rng = jax.random.PRNGKey(5)
    for i in range(5):
        s_c, m_c = step_c(s_c, batch, rng)
        s_m, m_m = step_m(s_m, batch, rng)
        np.testing.assert_array_equal(
            np.asarray(m_c["loss"]), np.asarray(m_m["loss"]),
            err_msg=f"step {i} loss")
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_c.params),
            jax.tree_util.tree_leaves_with_path(s_m.opt_state.master)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_master_weights_overfit_and_checkpoint(overfit_setup, tmp_path):
    """Convergence anchor + checkpoint roundtrip (the master tree must
    survive save/restore for bit-exact resume)."""
    from speech_tranformer_pytorch_tpu.utils.checkpoint import (Checkpointer,
                                                                CheckpointState)
    cfg, ds, batch = overfit_setup
    cfg = cfg.replace(
        model=cfg.model.replace(dtype="bfloat16"),
        train=cfg.train.replace(
            fused_optimizer=True, master_weights=True)).validate()
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    rng = jax.random.PRNGKey(42)
    first_loss = None
    for i in range(300):
        state, metrics = step(state, batch, rng)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < first_loss * 0.35, (first_loss, final_loss)

    ck = Checkpointer(str(tmp_path / "ck"), async_save=False)
    ck.save(1, CheckpointState(state, rng, 0, 0, "h"))
    ck.wait()
    template = CheckpointState(
        create_train_state(cfg, jax.random.PRNGKey(9), batch), rng, 0, 0, "h")
    _, restored = ck.restore(template)
    for a, b in zip(jax.tree.leaves(state.opt_state.master),
                    jax.tree.leaves(restored.state.opt_state.master)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ck.close()


def test_trainer_hot_loop_never_blocks_per_step(tmp_path, monkeypatch):
    """Behavioral guard for the de-synced hot loop (VERDICT r3 weak #1):
    the step loop must call jax.device_get only at log/checkpoint/finish
    boundaries — O(steps / log_every), NOT O(steps). A per-step device_get
    serializes dispatch against the device and kills the prefetch
    overlap."""
    from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic
    from speech_tranformer_pytorch_tpu.runner import Trainer

    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=32, d_model=32, num_heads=2, d_ff=64,
        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0,
        subsample_channels=4))
    cfg = cfg.replace(train=cfg.train.replace(
        batch_size=2, num_epochs=100, log_every=4,
        checkpoint_every_steps=1000, eval_every_steps=0))
    paths = prepare_synthetic(str(tmp_path / "c"), num_train=16, num_dev=0,
                              num_test=0, vocab_size=16, seed=0)
    tr = Trainer(cfg, work_dir=str(tmp_path / "w"),
                 train_manifest=paths["train"])

    calls = {"n": 0}
    orig = jax.device_get

    def counting(x):
        calls["n"] += 1
        return orig(x)

    monkeypatch.setattr(jax, "device_get", counting)
    tr.train(max_steps=8)
    # Expected: 1 (initial step read) + 2 log boundaries (one BATCHED
    # device_get each) + _finish (1 step read). Generous bound far below
    # the 8+ a per-step sync would cost.
    assert calls["n"] <= 6, (
        f"{calls['n']} device_get calls for 8 steps at log_every=4 — "
        "the hot loop is blocking per step again")
