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
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds-per-utt", type=float, default=10.0)
    ap.add_argument("--preset", default="base")
    args = ap.parse_args()

    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.data.pipeline import (
        AudioBatch, make_audio_train_step, make_preprocess_fn)
    from speech_tranformer_pytorch_tpu.train import create_train_state

    cfg = get_config(args.preset)
    b = args.batch
    u = 30                                            # target tokens/utt

    # End-to-end production step: raw PCM -> on-device fbank(+CMVN) ->
    # model -> loss -> update, all one jit (the Trainer's actual step).
    # Measured within 2% of the feats-only step — the Pallas STFT+mel
    # kernel amortizes to ~free in-model (BENCHMARKS.md).
    rng = jax.random.PRNGKey(0)
    n_samples = int(args.seconds_per_utt * cfg.features.sample_rate)
    audio = jax.random.normal(rng, (b, n_samples), jnp.float32) * 0.1
    sample_lens = jnp.full((b,), n_samples, jnp.int32)
    targets_in = jax.random.randint(rng, (b, u), 4, cfg.model.vocab_size)
    targets_in = targets_in.at[:, 0].set(1)
    targets_out = jnp.concatenate(
        [targets_in[:, 1:], jnp.full((b, 1), 2, jnp.int32)], axis=1)
    target_lens = jnp.full((b,), u, jnp.int32)
    batch = AudioBatch(audio, sample_lens, targets_in, targets_out,
                       target_lens, jnp.ones((b,), bool))

    example = jax.jit(make_preprocess_fn(cfg.features, None))(batch)
    state = create_train_state(cfg, rng, example)
    step = make_audio_train_step(cfg)
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
    print(f"# steps={args.steps} batch={b} secs/utt={args.seconds_per_utt} "
          f"step_time={dt/args.steps*1000:.1f}ms "
          f"loss={float(metrics['loss']):.3f} "
          f"backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()
