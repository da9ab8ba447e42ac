"""Trainer mesh mode (SURVEY.md §3.1 "one jit'd train_step ... under mesh").

The production driver must (a) route through the sharded SPMD steps when
given a mesh, matching the collective-free driver step-for-step, (b) keep
dev eval + greedy CER working on the mesh, (c) checkpoint-resume sharded
state, and (d) refuse the collective-free path under multi-process
launches (the silent-divergence footgun).
"""

import jax
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.data.prepare import prepare_synthetic
from speech_tranformer_pytorch_tpu.parallel import make_mesh
from speech_tranformer_pytorch_tpu.runner import Trainer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    prepare_synthetic(str(d), num_train=8, num_dev=8, num_test=0,
                      vocab_size=32, seed=1)
    return str(d)


def _cfg(corpus):
    cfg = get_config("tiny")
    return cfg.replace(
        model=cfg.model.replace(
            vocab_size=36, d_model=32, num_heads=2, d_ff=64,
            num_encoder_layers=1, num_decoder_layers=1,
            subsample_channels=4, dropout_rate=0.0),
        train=cfg.train.replace(batch_size=4, checkpoint_every_steps=1000,
                                num_epochs=50, log_every=1000),
        data=cfg.data.replace(train_manifest=f"{corpus}/train.jsonl",
                              dev_manifest=f"{corpus}/dev.jsonl",
                              vocab_path=f"{corpus}/vocab.json"))


def _run_recording(trainer, n):
    losses = []
    orig = trainer.step_fn

    def rec(st, ab, rng):
        st, m = orig(st, ab, rng)
        losses.append(float(jax.device_get(m["loss"])))
        return st, m

    trainer.step_fn = rec
    trainer.train(max_steps=n)
    return losses


@pytest.mark.slow
def test_mesh_trainer_matches_plain_trainer(corpus, tmp_path):
    cfg = _cfg(corpus)
    plain = Trainer(cfg, work_dir=str(tmp_path / "plain"), mesh=None)
    ref = _run_recording(plain, 3)

    mesh = make_mesh(model_axis_size=2)  # DP4 x TP2 on the 8 fake devices
    mt = Trainer(cfg, work_dir=str(tmp_path / "mesh"), mesh=mesh)
    got = _run_recording(mt, 3)

    assert len(ref) == len(got) == 3
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.slow
def test_mesh_trainer_grain_pipeline_matches_python(corpus, tmp_path):
    """Mesh mode with the grain input pipeline (the production multi-host
    path: grain per-host workers + make_array_from_process_local_data
    assembly) must produce the same per-step losses as the python
    pipeline (both follow the same metadata-only epoch plan)."""
    cfg = _cfg(corpus)
    mesh = make_mesh(model_axis_size=2)
    t_py = Trainer(cfg, work_dir=str(tmp_path / "py"), mesh=mesh)
    ref = _run_recording(t_py, 3)

    cfg_g = cfg.replace(data=cfg.data.replace(pipeline="grain"))
    t_gr = Trainer(cfg_g, work_dir=str(tmp_path / "grain"), mesh=mesh)
    got = _run_recording(t_gr, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.slow
def test_mesh_trainer_evaluate_and_dev_cer(corpus, tmp_path):
    cfg = _cfg(corpus)
    mesh = make_mesh(model_axis_size=2)
    mt = Trainer(cfg, work_dir=str(tmp_path / "mesh"), mesh=mesh)
    dev_mesh = mt.evaluate(decode_cer=True, max_decode_batches=1)

    plain = Trainer(cfg, work_dir=str(tmp_path / "plain"), mesh=None)
    dev_plain = plain.evaluate(decode_cer=True, max_decode_batches=1)

    np.testing.assert_allclose(dev_mesh["loss"], dev_plain["loss"],
                               rtol=1e-5)
    assert dev_mesh["tokens"] == dev_plain["tokens"]
    # Same params (same init seed), same batch -> identical greedy CER.
    key = "cer_sampled" if "cer_sampled" in dev_plain else "cer"
    assert key in dev_mesh
    assert dev_mesh[key] == dev_plain[key]


@pytest.mark.slow
def test_mesh_trainer_checkpoint_resume(corpus, tmp_path):
    cfg = _cfg(corpus)
    wd = str(tmp_path / "run")
    mesh = make_mesh(model_axis_size=2)
    t1 = Trainer(cfg, work_dir=wd, mesh=mesh)
    t1.train(max_steps=2)
    assert int(jax.device_get(t1.state.step)) == 2

    t2 = Trainer(cfg, work_dir=wd, mesh=mesh, resume=True)
    assert int(jax.device_get(t2.state.step)) == 2
    a = jax.tree_util.tree_leaves(jax.device_get(t1.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(t2.state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_mesh_trainer_frame_budget_batches_divisible(corpus, tmp_path):
    """Frame-budget batching yields arbitrary per-bucket batch sizes; in
    mesh mode the Trainer must round them up so every global batch's rows
    divide the 'data' axis (else NamedSharding(P('data')) fails)."""
    cfg = _cfg(corpus)
    cfg = cfg.replace(train=cfg.train.replace(max_frames_per_batch=300))
    mesh = make_mesh(model_axis_size=2)   # dp=4
    tr = Trainer(cfg, work_dir=str(tmp_path / "fb"), mesh=mesh)
    assert all(s % 4 == 0 for s in tr.batcher.bucket_batch_sizes), \
        tr.batcher.bucket_batch_sizes
    tr.train(max_steps=2)
    assert int(jax.device_get(tr.state.step)) == 2


def test_collective_free_step_refuses_multiprocess(monkeypatch):
    from speech_tranformer_pytorch_tpu.data.pipeline import \
        make_audio_train_step
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(RuntimeError, match="divergent replicas"):
        make_audio_train_step(get_config("tiny"))


def test_dev_cer_sampled_label(corpus, tmp_path):
    """A partial dev decode must be reported as cer_sampled, a full one as
    cer (VERDICT r2 weak #6)."""
    cfg = _cfg(corpus)
    tr = Trainer(cfg, work_dir=str(tmp_path / "s"), mesh=None)
    n_dev_batches = sum(1 for _ in tr.dev_batcher.epoch(0))
    if n_dev_batches < 2:
        pytest.skip("need >=2 dev batches for the sampled case")
    sampled = tr.evaluate(decode_cer=True, max_decode_batches=1)
    assert "cer_sampled" in sampled and "cer" not in sampled
    full = tr.evaluate(decode_cer=True, max_decode_batches=0)
    assert "cer" in full and "cer_sampled" not in full


def test_eval_every_steps_fires_mid_epoch(corpus, tmp_path):
    """train.eval_every_steps triggers mid-epoch dev CV + best-model
    tracking (previously a dead config field)."""
    import json
    import os

    cfg = _cfg(corpus)
    cfg = cfg.replace(train=cfg.train.replace(eval_every_steps=2,
                                              num_epochs=3))
    wd = str(tmp_path / "es")
    tr = Trainer(cfg, work_dir=wd, mesh=None)
    tr.train(max_steps=3)
    lines = [json.loads(l)
             for l in open(os.path.join(wd, "train_metrics.jsonl"))]
    dev_steps = [l["step"] for l in lines if "dev_loss" in l]
    assert 2 in dev_steps, (dev_steps, lines)
    assert os.path.isdir(os.path.join(wd, "best"))
