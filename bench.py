"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): audio-seconds/s/chip for Base-config training,
measured on the END-TO-END production step (raw PCM -> on-device Pallas
fbank(+CMVN) -> model -> loss -> update, one jit — the Trainer's actual
step). ``vs_baseline`` is measured against REFERENCE_AUDIO_SPS, the
recalled single-GPU throughput of the PyTorch reference repo family on
AISHELL-1 (~120 audio-s/s on a consumer GPU; BASELINE.md records that no
published number exists — re-measure when the reference is runnable).
Target is >= 5x (BASELINE.json "north_star").

``build_train_workload`` is shared with the on-chip perf-regression gate
(tests/test_perf_gate.py) so the gate asserts floors on EXACTLY the
workload this headline reports.

Usage: python bench.py [--steps N] [--batch B] [--seconds-per-utt S]
"""

import argparse
import json
import os
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_AUDIO_SPS = 120.0  # recalled estimate, single consumer GPU

# Persistent XLA compilation cache: the driver-run bench previously timed
# out because >95% of the ~11-min wall was XLA compile over the axon
# tunnel (BENCH_r02.json rc=124 while the timed steps cost <1 s). The
# cache dir is repo-local but GITIGNORED (round 4, per ADVICE r3 #4: the
# blobs are opaque, large, and accrete per server version — they ballooned
# git history to 1.4 GB before being purged). The driver reuses this
# working tree across rounds (PROGRESS.jsonl is continuous), so the
# on-disk cache keeps rounds warm without living in version control; a
# fresh clone simply pays one compile to repopulate it.
_CACHE_DIR = pathlib.Path(__file__).resolve().parent / ".xla_cache"


def enable_compilation_cache():
    _CACHE_DIR.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def build_train_workload(cfg, batch_size: int, seconds_per_utt: float,
                         target_tokens: int = 30):
    """(state, step_fn, audio_batch) for the production audio train step.

    All inputs are built host-side (numpy) and the example Batch for init
    is shape-derived — the whole bench runs exactly TWO device programs
    (model.init and the train step). Every extra program matters: over
    the axon tunnel, per-program load can cost minutes when the service
    is busy, and the driver's bench has a hard timeout (BENCH_r02 lesson).
    """
    import numpy as np

    from speech_tranformer_pytorch_tpu.data.pipeline import (
        AudioBatch, make_audio_train_step)
    from speech_tranformer_pytorch_tpu.train import Batch, create_train_state

    b, u = batch_size, target_tokens
    host = np.random.default_rng(0)
    n_samples = int(seconds_per_utt * cfg.features.sample_rate)
    audio = (host.standard_normal((b, n_samples)) * 0.1).astype(np.float32)
    sample_lens = np.full((b,), n_samples, np.int32)
    targets_in = host.integers(4, cfg.model.vocab_size,
                               size=(b, u)).astype(np.int32)
    targets_in[:, 0] = 1
    targets_out = np.concatenate(
        [targets_in[:, 1:], np.full((b, 1), 2, np.int32)], axis=1)
    target_lens = np.full((b,), u, np.int32)
    batch = AudioBatch(jnp.asarray(audio), jnp.asarray(sample_lens),
                       jnp.asarray(targets_in), jnp.asarray(targets_out),
                       jnp.asarray(target_lens), jnp.ones((b,), bool))

    # Tiny-shape example for init: parameter shapes do not depend on
    # batch/time, so init runs on a [1, 64, F] example — the init program
    # shrinks ~30x, cutting the tunnel's program-load exposure (the train
    # step is then the only big executable).
    feat_dt = jnp.dtype(cfg.features.output_dtype)
    example = Batch(
        feats=np.zeros((1, 64, cfg.features.num_mel_bins), feat_dt),
        frame_lens=np.full((1,), 64, np.int32),
        targets_in=targets_in[:1, :4], targets_out=targets_out[:1, :4],
        target_lens=np.full((1,), 4, np.int32))
    state = create_train_state(cfg, jax.random.PRNGKey(0), example)
    return state, make_audio_train_step(cfg), batch


def run_train_bench(cfg, *, batch_size: int, seconds_per_utt: float,
                    steps: int, warmup: int):
    """Timed audio-step loop; returns (audio_sps, step_seconds, last_loss).

    Sync via device_get — ``block_until_ready`` does not fully synchronize
    over the axon TPU tunnel.
    """
    state, step, batch = build_train_workload(cfg, batch_size,
                                              seconds_per_utt)
    step_rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, metrics = step(state, batch, step_rng)
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch, step_rng)
    loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    return batch_size * seconds_per_utt * steps / dt, dt / steps, loss


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds-per-utt", type=float, default=10.0)
    ap.add_argument("--preset", default="base")
    args = ap.parse_args()

    from speech_tranformer_pytorch_tpu.config import get_config
    cfg = get_config(args.preset)
    audio_sps, step_s, loss = run_train_bench(
        cfg, batch_size=args.batch, seconds_per_utt=args.seconds_per_utt,
        steps=args.steps, warmup=args.warmup)
    n_chips = 1  # single-chip bench (driver runs on one real TPU)
    value = audio_sps / n_chips

    print(json.dumps({
        "metric": "train_audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / REFERENCE_AUDIO_SPS, 2),
    }))
    print(f"# steps={args.steps} batch={args.batch} "
          f"secs/utt={args.seconds_per_utt} "
          f"step_time={step_s*1000:.1f}ms loss={loss:.3f} "
          f"backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()
