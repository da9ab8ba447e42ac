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


def test_export_cli_end_to_end(tmp_path):
    """export_cli: checkpoint -> StableHLO artifact + flat-params npz; the
    loaded artifact decodes with the npz params and matches the live
    Recognizer's hypotheses on the same batch."""
    import json

    from speech_tranformer_pytorch_tpu import export_cli, prepare_cli, train_cli
    from speech_tranformer_pytorch_tpu.serving import load_exported

    data = tmp_path / "data"
    work = tmp_path / "work"
    prepare_cli.main(["synthetic", "--out", str(data), "--num-train", "4",
                      "--num-dev", "0", "--num-test", "0",
                      "--vocab-size", "16"])
    train_cli.main(["--preset", "tiny", "--data-dir", str(data),
                    "--work-dir", str(work),
                    "--set", "model.d_model=32", "--set", "model.num_heads=2",
                    "--set", "model.d_ff=64",
                    "--set", "model.num_encoder_layers=1",
                    "--set", "model.num_decoder_layers=1",
                    "--set", "model.subsample_channels=4",
                    "--set", "train.batch_size=4",
                    "--set", "train.checkpoint_every_steps=2",
                    "--max-steps", "2"])
    out = tmp_path / "dec.stablehlo"
    export_cli.main(["--work-dir", str(work), "--out", str(out),
                     "--batch-size", "2", "--frames", "80", "--beam", "3",
                     "--max-len", "6"])
    assert out.exists() and out.stat().st_size > 0
    npz = np.load(str(out) + ".params.npz")
    params_flat = [npz[k] for k in sorted(npz.files)]

    fn = load_exported(out.read_bytes())
    feats = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (2, 80, 80)), np.float32)
    lens = np.array([80, 60], np.int32)
    tokens, lengths, scores = fn(params_flat, feats, lens)
    assert tokens.shape == (2, 3, 6) and lengths.shape == (2, 3)

    # Must match the live decode from the same checkpoint.
    from speech_tranformer_pytorch_tpu.config import config_from_dict
    from speech_tranformer_pytorch_tpu.recognize import load_recognizer
    cfg = config_from_dict(json.load(open(work / "config.json")))
    rec = load_recognizer(cfg, str(work / "checkpoints"))
    live = jax.jit(lambda p, f, l: beam_decode(
        SpeechTransformer(cfg.model), p, f, l, beam_size=3, max_len=6,
        alpha=cfg.decode.length_penalty))(rec.params, feats, lens)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(live.tokens))
