"""Performance regression gate (SURVEY.md §4: "benchmark harness asserting
audio-seconds/s/chip and RTF floors so kernel regressions fail CI rather
than ship").

These tests SKIP off-TPU (the CI suite runs on CPU with virtual devices);
on the real chip they fail if training throughput or decode RTF regresses
past the floors below. Floors are set ~20 % under the measured numbers in
BENCHMARKS.md (19.4k audio-s/s train, beam-5 RTF 0.00020 at B=16) so
tunnel jitter doesn't flake, while real regressions (a kernel falling off
its fused path, an accidental f32 activation, a cache gather creeping
back) trip them.

Run manually on the chip:  python -m pytest tests/test_perf_gate.py -q
(the conftest CPU pin is overridden here via a subprocess-free check of
the actual backend).
"""

import functools
import time

import jax
import jax.numpy as jnp
import pytest

TRAIN_AUDIO_SPS_FLOOR = 15000.0   # measured 19.4k (BENCHMARKS.md)
BEAM5_RTF_CEILING = 0.00030       # measured 0.00020 at B=16, max_len=50

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="perf gate runs on real TPU only (CI uses CPU)")


def _sync(x):
    return float(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0])


@requires_tpu
def test_train_throughput_floor():
    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.data.pipeline import (
        AudioBatch, make_audio_train_step, make_preprocess_fn)
    from speech_tranformer_pytorch_tpu.train import create_train_state

    cfg = get_config("base")
    b, secs, u = 32, 10.0, 30
    rng = jax.random.PRNGKey(0)
    n = int(secs * cfg.features.sample_rate)
    audio = jax.random.normal(rng, (b, n), jnp.float32) * 0.1
    ti = jax.random.randint(rng, (b, u), 4, cfg.model.vocab_size)
    ti = ti.at[:, 0].set(1)
    to = jnp.concatenate([ti[:, 1:], jnp.full((b, 1), 2, jnp.int32)], 1)
    batch = AudioBatch(audio, jnp.full((b,), n, jnp.int32), ti, to,
                       jnp.full((b,), u, jnp.int32), jnp.ones((b,), bool))
    example = jax.jit(make_preprocess_fn(cfg.features, None))(batch)
    state = create_train_state(cfg, rng, example)
    step = make_audio_train_step(cfg)
    r = jax.random.PRNGKey(1)
    for _ in range(6):
        state, m = step(state, batch, r)
    _sync(m["loss"])
    steps = 30
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch, r)
    _sync(m["loss"])
    sps = b * secs * steps / (time.perf_counter() - t0)
    assert sps > TRAIN_AUDIO_SPS_FLOOR, (
        f"train throughput regressed: {sps:.0f} audio-s/s < floor "
        f"{TRAIN_AUDIO_SPS_FLOOR:.0f} (BENCHMARKS.md measured 19.4k)")


@requires_tpu
def test_beam5_rtf_ceiling():
    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.decoding.beam import beam_decode
    from speech_tranformer_pytorch_tpu.models import SpeechTransformer

    cfg = get_config("base")
    b, frames = 16, 1000
    rng = jax.random.PRNGKey(0)
    model = SpeechTransformer(cfg.model)
    feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim),
                              jnp.float32)
    fl = jnp.full((b,), frames, jnp.int32)
    params = model.init(rng, feats, fl, jnp.zeros((b, 5), jnp.int32),
                        jnp.full((b,), 5, jnp.int32))
    fn = jax.jit(functools.partial(beam_decode, model, beam_size=5,
                                   max_len=50, early_stop=False))
    r = fn(params, feats, fl)
    _sync(r.scores)
    runs = 8
    t0 = time.perf_counter()
    for _ in range(runs):
        r = fn(params, feats, fl)
    _sync(r.scores)
    rtf = (time.perf_counter() - t0) / runs / (b * 10.0)
    assert rtf < BEAM5_RTF_CEILING, (
        f"beam-5 decode regressed: RTF {rtf:.6f} > ceiling "
        f"{BEAM5_RTF_CEILING} (BENCHMARKS.md measured 0.00020)")
