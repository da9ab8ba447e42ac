"""DP (and DP×TP) beam decode on the fake 8-device mesh must equal the
unsharded decode exactly (SURVEY.md §4: "multi-host beam prune equivalence
vs gathered single-host prune")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.data.synthetic import (
    batch_from_dataset, make_synthetic_dataset)
from speech_tranformer_pytorch_tpu.decoding import beam_decode
from speech_tranformer_pytorch_tpu.models import SpeechTransformer
from speech_tranformer_pytorch_tpu.parallel import make_mesh
from speech_tranformer_pytorch_tpu.parallel.decode import (
    make_sharded_beam_decode, make_sharded_greedy_decode)
from speech_tranformer_pytorch_tpu.train import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 fake cpu devices")


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=16, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        subsample_channels=8))
    ds = make_synthetic_dataset(8, vocab_size=16, seed=4)
    batch = batch_from_dataset(ds, cfg.features)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    for _ in range(100):
        state, _ = step(state, batch, jax.random.PRNGKey(9))
    model = SpeechTransformer(cfg.model)
    return cfg, model, state.params, batch


def test_dp_beam_equals_unsharded(trained):
    cfg, model, params, batch = trained
    ref = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=3, max_len=6))(
            params, batch.feats, batch.frame_lens)

    mesh = make_mesh(model_axis_size=1)   # 8-way DP
    fn = make_sharded_beam_decode(model, mesh, beam_size=3, max_len=6)(params)
    got = fn(params, batch.feats, batch.frame_lens)

    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                               rtol=1e-5, atol=1e-5)


def test_dptp_beam_equals_unsharded(trained):
    cfg, model, params, batch = trained
    ref = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=3, max_len=6))(
            params, batch.feats, batch.frame_lens)

    mesh = make_mesh(model_axis_size=2)   # 4-way DP x 2-way TP
    fn = make_sharded_beam_decode(model, mesh, beam_size=3, max_len=6)(params)
    got = fn(params, batch.feats, batch.frame_lens)

    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                               rtol=1e-4, atol=1e-4)


def test_dp_greedy_equals_unsharded(trained):
    from speech_tranformer_pytorch_tpu.decoding import greedy_decode_jit
    cfg, model, params, batch = trained
    ref_t, ref_l = jax.jit(lambda p, f, l: greedy_decode_jit(
        model, p, f, l, max_len=6))(params, batch.feats, batch.frame_lens)
    mesh = make_mesh(model_axis_size=2)
    fn = make_sharded_greedy_decode(model, mesh, max_len=6)(params)
    got_t, got_l = fn(params, batch.feats, batch.frame_lens)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
