"""Performance regression gate (SURVEY.md §4: "benchmark harness asserting
audio-seconds/s/chip and RTF floors so kernel regressions fail CI rather
than ship").

These tests SKIP off-TPU (the CI suite runs on CPU with virtual devices);
on the real chip they fail if training throughput or decode RTF regresses
past the bounds below. Bounds sit 20-50 % off the measured numbers in
BENCHMARKS.md (19.4k audio-s/s train, beam-5 RTF 0.00020 at B=16) so
tunnel jitter doesn't flake, while real regressions (a kernel falling off
its fused path, an accidental f32 activation, a cache gather creeping
back) trip them.

Run on the chip (the env var stops conftest.py pinning the CPU backend —
without it every test here just skips):

    ST_TPU_PERF_GATE=1 python -m pytest tests/test_perf_gate.py -q
"""

import functools
import time

import jax
import jax.numpy as jnp
import pytest

TRAIN_AUDIO_SPS_FLOOR = 18000.0   # measured 19.9-20.2k (r4 driver bench)
                                  # and 19.6-19.8k across five r5 runs;
                                  # ~9% jitter margin per VERDICT r4 #8
                                  # (raise after one more stable round
                                  # >= 19.9k — held). 17.5k the round
                                  # before, 15k before that.
BEAM5_RTF_CEILING = 0.00018       # measured 0.000148 at B=16, max_len=50
                                  # (2026-08-20, candidate-topk kernel +
                                  # head-major cross cache); 1.22x headroom.
                                  # The topk kernel silently falling off its
                                  # Pallas path costs ~1.25-1.31x isolated
                                  # (B=32: 54.3 vs 41.4 ms) -> RTF ~0.000185+,
                                  # ABOVE this ceiling — a silent fallback
                                  # now trips the gate (the old 0.00020 let
                                  # it pass; ADVICE r3 #1)
GREEDY_RTF_CEILING = 0.00013      # measured 0.000095 at B=16, max_len=50
                                  # (BENCHMARKS.md); 1.35x headroom — no
                                  # greedy gate existed before r4, so a
                                  # KV-cache/gather regression on the
                                  # greedy path was invisible

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="perf gate runs on real TPU only (CI uses CPU)")


def _sync(x):
    return float(jax.device_get(jax.tree.leaves(x)[0]).ravel()[0])


@requires_tpu
def test_train_throughput_floor():
    """Runs bench.py's exact headline workload (shared builder) so the
    gate and BENCHMARKS.md can't measure different things."""
    import bench
    from speech_tranformer_pytorch_tpu.config import get_config

    sps, step_s, _ = bench.run_train_bench(
        get_config("base"), batch_size=32, seconds_per_utt=10.0,
        steps=30, warmup=6)
    assert sps > TRAIN_AUDIO_SPS_FLOOR, (
        f"train throughput regressed: {sps:.0f} audio-s/s "
        f"({step_s*1e3:.1f} ms/step) < floor {TRAIN_AUDIO_SPS_FLOOR:.0f} "
        f"(BENCHMARKS.md measured 19.4k)")


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
        f"{BEAM5_RTF_CEILING} (BENCHMARKS.md measured 0.000148)")


@requires_tpu
def test_greedy_rtf_ceiling():
    """Greedy decode (beam path's little sibling — same KV cache, no beam
    bookkeeping): measured 0.000095 RTF at B=16/max_len=50 (BENCHMARKS.md
    'greedy 15.2 ms'); a cache-layout or gather regression here was
    previously ungated."""
    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.decoding import greedy_decode_jit
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
    fn = jax.jit(lambda p, f, l: greedy_decode_jit(model, p, f, l,
                                                   max_len=50))
    tokens, lengths = fn(params, feats, fl)
    _sync(lengths)
    runs = 8
    t0 = time.perf_counter()
    for _ in range(runs):
        tokens, lengths = fn(params, feats, fl)
    _sync(lengths)
    rtf = (time.perf_counter() - t0) / runs / (b * 10.0)
    assert rtf < GREEDY_RTF_CEILING, (
        f"greedy decode regressed: RTF {rtf:.6f} > ceiling "
        f"{GREEDY_RTF_CEILING} (BENCHMARKS.md measured 0.000095)")


@requires_tpu
def test_int8_matmul_compiled_matches_reference():
    """TPU-COMPILED (Mosaic) equality of the int8-weight decode matmul vs
    its jnp reference at the shapes the d2048 serving decode dispatches
    (k·n >= the 2 MB threshold) plus one base-shape block. Exact on-chip
    (rel-err 0.0 measured r5); calling int8_matmul directly turns a
    Mosaic compile failure into a test failure instead of a silent
    fallback."""
    import numpy as np

    from speech_tranformer_pytorch_tpu.kernels.int8_matmul import (
        int8_matmul, int8_matmul_reference)

    rng = np.random.default_rng(0)
    for m, k, n, bn in ((48, 2048, 6144, 512),    # d2048 fused qkv
                        (48, 8192, 2048, 512),    # d2048 ffn w2
                        (80, 512, 1536, 512)):    # base fused qkv
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)).astype(np.int8))
        s = jnp.asarray(rng.uniform(1e-3, 2e-2, n).astype(np.float32))
        got = np.asarray(int8_matmul(x, wq, s, block_n=bn,
                                     out_dtype=jnp.float32))
        want = np.asarray(int8_matmul_reference(x, wq, s))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5,
                                   err_msg=f"shape {(m, k, n)}")


@requires_tpu
def test_int8_ffn_compiled_matches_reference():
    """TPU-COMPILED equality of the fused int8 FFN kernel vs its jnp
    reference at the decode shapes that dispatch it (base + d2048 FFN).
    Row-relative bound: per-block f32 partial sums reorder accumulation
    vs the reference's single dot."""
    import numpy as np

    from speech_tranformer_pytorch_tpu.kernels.int8_ffn import (
        int8_ffn, int8_ffn_reference)

    rng = np.random.default_rng(0)
    for m, k, ff, n in ((80, 512, 2048, 512),      # base FFN, B=16 beam 5
                        (48, 2048, 8192, 2048)):   # d2048 serving FFN
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.integers(-127, 128, (k, ff)).astype(np.int8))
        s1 = jnp.asarray(rng.uniform(1e-3, 2e-2, ff).astype(np.float32))
        b1 = jnp.asarray(rng.standard_normal(ff).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.integers(-127, 128, (ff, n)).astype(np.int8))
        s2 = jnp.asarray(rng.uniform(1e-3, 2e-2, n).astype(np.float32))
        b2 = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
        got = np.asarray(int8_ffn(x, w1, s1, b1, w2, s2, b2, block_ff=512,
                                  out_dtype=jnp.float32))
        want = np.asarray(int8_ffn_reference(x, w1, s1, b1, w2, s2, b2))
        scale = np.maximum(np.abs(want).max(axis=1, keepdims=True), 1.0)
        rel = (np.abs(got - want) / scale).max()
        assert rel < 1e-3, (m, k, ff, n, rel)


@requires_tpu
def test_candidate_topk_compiled_matches_reference():
    """TPU-COMPILED (Mosaic, not interpret) equality of the fused
    beam-candidate top-k kernel vs the jnp reference — exact indices and
    tie order at production shapes. The CPU goldens run interpret=True
    only; this is the path decode actually dispatches to on the chip
    (VERDICT r2 weak #2). Calling candidate_topk directly (no interface
    fallback) also turns a Mosaic compile failure into a test failure
    instead of a silent perf regression."""
    import numpy as np

    from speech_tranformer_pytorch_tpu.kernels.beam_prune import (
        candidate_topk, candidate_topk_reference)

    rng = np.random.default_rng(0)
    for b, k, v, k2 in ((32, 5, 4336, 12), (8, 5, 512, 10), (1, 2, 6, 6)):
        logits = jnp.asarray(rng.standard_normal((b * k, v)).astype(np.float32))
        alive = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32))
        want_v, want_i = jax.jit(
            lambda l, a: candidate_topk_reference(l, a, k2=k2))(logits, alive)
        got_v, got_i = jax.jit(
            lambda l, a: candidate_topk(l, a, k2=k2))(logits, alive)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i),
                                      err_msg=f"shape {(b, k, v, k2)}")
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"shape {(b, k, v, k2)}")
