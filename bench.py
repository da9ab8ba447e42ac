"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): audio-seconds/s/chip for Base-config training.
``vs_baseline`` is measured against REFERENCE_AUDIO_SPS, the recalled
single-GPU throughput of the PyTorch reference repo family on AISHELL-1
(~120 audio-s/s on a consumer GPU; BASELINE.md records that no published
number exists — re-measure when the reference is runnable). Target is
>= 5x (BASELINE.json "north_star").

Usage: python bench.py [--steps N] [--batch B] [--seconds-per-utt S]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_AUDIO_SPS = 120.0  # recalled estimate, single consumer GPU


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds-per-utt", type=float, default=10.0)
    ap.add_argument("--preset", default="base")
    args = ap.parse_args()

    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.train import (Batch,
                                                     create_train_state,
                                                     make_train_step)

    cfg = get_config(args.preset)
    b = args.batch
    frames = int(args.seconds_per_utt * 100)          # 10 ms hop
    u = 30                                            # target tokens/utt

    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim),
                              jnp.float32)
    frame_lens = jnp.full((b,), frames, jnp.int32)
    targets_in = jax.random.randint(rng, (b, u), 4, cfg.model.vocab_size)
    targets_in = targets_in.at[:, 0].set(1)
    targets_out = jnp.concatenate(
        [targets_in[:, 1:], jnp.full((b, 1), 2, jnp.int32)], axis=1)
    target_lens = jnp.full((b,), u, jnp.int32)
    batch = Batch(feats=feats, frame_lens=frame_lens,
                  targets_in=targets_in, targets_out=targets_out,
                  target_lens=target_lens)

    state = create_train_state(cfg, rng, batch)
    step = make_train_step(cfg)
    step_rng = jax.random.PRNGKey(1)

    # Warmup (compile). NOTE: sync via device_get — block_until_ready does
    # not fully synchronize over the axon TPU tunnel.
    for _ in range(args.warmup):
        state, metrics = step(state, batch, step_rng)
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch, step_rng)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    audio_seconds = float(b * args.seconds_per_utt * args.steps)
    audio_sps = audio_seconds / dt
    n_chips = 1  # single-chip bench (driver runs on one real TPU)
    value = audio_sps / n_chips

    print(json.dumps({
        "metric": "train_audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / REFERENCE_AUDIO_SPS, 2),
    }))
    print(f"# steps={args.steps} batch={b} frames={frames} "
          f"step_time={dt/args.steps*1000:.1f}ms "
          f"loss={float(metrics['loss']):.3f} "
          f"backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()
