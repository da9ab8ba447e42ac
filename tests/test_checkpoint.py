"""Checkpoint/resume tests incl. the fault-injection contract: resume from
a mid-run checkpoint is BIT-EXACT vs the uninterrupted run (SURVEY.md §5
"Failure detection / elastic recovery")."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.data.synthetic import (
    batch_from_dataset, make_synthetic_dataset)
from speech_tranformer_pytorch_tpu.train import create_train_state, make_train_step
from speech_tranformer_pytorch_tpu.utils.checkpoint import (Checkpointer,
                                                            CheckpointState)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=16, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.1,
        subsample_channels=8))
    ds = make_synthetic_dataset(4, vocab_size=16, seed=0)
    batch = batch_from_dataset(ds, cfg.features)
    return cfg, batch


def _params_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        if not np.array_equal(np.asarray(x), np.asarray(y)):
            return False
    return True


def test_save_restore_roundtrip(setup, tmp_path):
    cfg, batch = setup
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ck = Checkpointer(str(tmp_path / "ck"), async_save=False)
    ck.save(0, CheckpointState(state, jax.random.PRNGKey(7), 3, 11, "h"))
    ck.wait()
    template = CheckpointState(state, jax.random.PRNGKey(0), 0, 0, "h")
    step, restored = ck.restore(template)
    assert step == 0
    assert restored.epoch == 3 and restored.batch_in_epoch == 11
    assert _params_equal(restored.state.params, state.params)
    np.testing.assert_array_equal(np.asarray(restored.rng),
                                  np.asarray(jax.random.PRNGKey(7)))
    ck.close()


def test_resume_bit_exact(setup, tmp_path):
    """Uninterrupted 10 steps == 5 steps + crash + resume + 5 steps."""
    cfg, batch = setup
    step_fn = make_train_step(cfg, donate=False)
    rng = jax.random.PRNGKey(3)

    # Uninterrupted run.
    state_a = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    for _ in range(10):
        state_a, _ = step_fn(state_a, batch, rng)

    # Interrupted run: 5 steps, checkpoint, "crash", restore, 5 more.
    state_b = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    for _ in range(5):
        state_b, _ = step_fn(state_b, batch, rng)
    ck = Checkpointer(str(tmp_path / "ck2"), async_save=False)
    ck.save(5, CheckpointState(state_b, rng, 0, 5, "h"))
    ck.wait()
    ck.close()

    del state_b  # crash
    ck2 = Checkpointer(str(tmp_path / "ck2"), async_save=False)
    template = CheckpointState(
        create_train_state(cfg, jax.random.PRNGKey(99), batch),
        jax.random.PRNGKey(0), 0, 0, "h")
    _, restored = ck2.restore(template)
    state_c = restored.state
    for _ in range(5):
        state_c, _ = step_fn(state_c, batch, restored.rng)

    assert int(state_c.step) == int(state_a.step) == 10
    assert _params_equal(state_a.params, state_c.params), \
        "resume is not bit-exact"
    ck2.close()


def test_latest_step_and_retention(setup, tmp_path):
    cfg, batch = setup
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ck = Checkpointer(str(tmp_path / "ck3"), max_to_keep=2, async_save=False)
    for s in (1, 2, 3):
        ck.save(s, CheckpointState(state, jax.random.PRNGKey(0), 0, s, "h"))
    ck.wait()
    assert ck.latest_step() == 3
    steps = ck.mngr.all_steps()
    assert 1 not in steps and len(steps) <= 2
    ck.close()


def test_restore_missing_raises(setup, tmp_path):
    cfg, batch = setup
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ck = Checkpointer(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ck.restore(CheckpointState(state, jax.random.PRNGKey(0), 0, 0, "h"))
    ck.close()
