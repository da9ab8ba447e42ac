"""AOT serving export (serving.py): the exported StableHLO recognizer must
reproduce the live beam/greedy decode exactly, through serialize →
deserialize, with params passed as a flat array list."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.decoding import beam_decode, greedy_decode_jit
from speech_tranformer_pytorch_tpu.models import SpeechTransformer
from speech_tranformer_pytorch_tpu.serving import (export_recognizer,
                                                   flatten_params,
                                                   load_exported)


def _setup():
    cfg = tiny_config()
    cfg = cfg.replace(model=cfg.model.replace(
        vocab_size=16, d_model=64, num_heads=2, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        subsample_channels=8))
    b, frames = 3, 120
    rng = jax.random.PRNGKey(0)
    model = SpeechTransformer(cfg.model)
    feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim),
                              jnp.float32)
    fl = jnp.array([120, 90, 70], jnp.int32)
    params = model.init(rng, feats, fl, jnp.zeros((b, 4), jnp.int32),
                        jnp.full((b,), 4, jnp.int32))
    return cfg, model, params, feats, fl, b, frames


def test_export_beam_roundtrip():
    cfg, model, params, feats, fl, b, frames = _setup()
    data = export_recognizer(cfg, params, batch_size=b, frames=frames,
                             beam_size=3, max_len=8)
    assert isinstance(data, bytes) and len(data) > 0
    fn = load_exported(data)
    tokens, lengths, scores = fn(flatten_params(params), feats, fl)
    ref = jax.jit(lambda p, f, l: beam_decode(
        model, p, f, l, beam_size=3, max_len=8))(params, feats, fl)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref.scores),
                               rtol=1e-6)


def test_export_greedy_roundtrip():
    cfg, model, params, feats, fl, b, frames = _setup()
    data = export_recognizer(cfg, params, batch_size=b, frames=frames,
                             beam_size=1, max_len=8)
    fn = load_exported(data)
    tokens, lengths, _ = fn(flatten_params(params), feats, fl)
    rt, rl = jax.jit(lambda p, f, l: greedy_decode_jit(
        model, p, f, l, max_len=8))(params, feats, fl)
    np.testing.assert_array_equal(np.asarray(tokens[:, 0]), np.asarray(rt))
    np.testing.assert_array_equal(np.asarray(lengths[:, 0]), np.asarray(rl))
