"""Trainer-vs-bench throughput check (VERDICT r3 item #2 done-criterion).

bench.py's headline is the jit'd step FUNCTION's throughput (one batch,
host-built inputs, synced once at the end). ``Trainer.train`` is what users
actually run: manifest IO, bucketed batching, the prefetch thread, H2D
transfer, logging, and — before round 4 — a per-step ``jax.device_get``
that serialized dispatch. This tool measures the production loop's
wall-clock audio-s/s on the SAME workload as bench (Base config, B=32,
10-s utterances) and prints both numbers side by side; the done-bar is
Trainer within ~3% of bench or the gap explained (BENCHMARKS.md).

Usage (on the TPU):  python tools/trainer_vs_bench.py [--steps 60]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_corpus(root: str, *, n_utts: int, n_entries: int, seconds: float,
                 n_tokens: int, vocab_size: int,
                 sample_rate: int = 16000) -> str:
    """n_utts WAVs of `seconds` noise each + an n_entries manifest cycling
    over them (distinct utt-ids, shared files) — real per-batch audio IO
    with bounded disk, and epochs long enough that the per-epoch checkpoint
    save stays off the measured windows (production AISHELL epochs are
    thousands of steps; 2-step epochs would measure orbax, not the loop)."""
    from speech_tranformer_pytorch_tpu.data.prepare import (write_manifest,
                                                            write_wav)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rng = np.random.default_rng(0)
    n_samples = int(seconds * sample_rate)
    wavs = []
    for i in range(n_utts):
        wav = os.path.join(root, "wav", f"utt{i:04d}.wav")
        write_wav(wav, (rng.standard_normal(n_samples) * 0.1).astype(
            np.float32), sample_rate)
        wavs.append(wav)
    entries = [{
        "utt_id": f"e{i:05d}", "audio": wavs[i % n_utts],
        "num_samples": n_samples,
        "tokens": rng.integers(4, vocab_size, n_tokens).tolist(),
    } for i in range(n_entries)]
    manifest = os.path.join(root, "train.jsonl")
    write_manifest(manifest, entries)
    return manifest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--utts", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--preset", default="base")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (smoke-testing the tool)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import bench
    bench.enable_compilation_cache()

    import jax
    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.runner import Trainer

    cfg = get_config(args.preset)
    root = tempfile.mkdtemp(prefix="trainer_vs_bench_")
    manifest = build_corpus(root, n_utts=args.utts,
                            n_entries=(args.steps + 10) * args.batch,
                            seconds=args.seconds,
                            n_tokens=min(
                                30, cfg.data.max_target_len - 2),
                            vocab_size=cfg.model.vocab_size)
    cfg = cfg.replace(
        train=cfg.train.replace(
            batch_size=args.batch, num_epochs=10_000,
            log_every=args.log_every, checkpoint_every_steps=10_000_000,
            eval_every_steps=0),
        data=cfg.data.replace(train_manifest=manifest, dev_manifest=""))

    work = os.path.join(root, "work")
    tr = Trainer(cfg, work_dir=work, mesh=None)
    tr.train(max_steps=args.steps)

    # Parse the logged windows; drop the first (contains compile) and report
    # the steady-state windows.
    windows = []
    with open(os.path.join(work, "train_metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "audio_sps" in r:
                windows.append((r["step"], r["audio_sps"]))
    steady = [sps for step, sps in windows if step > args.log_every]
    trainer_sps = float(np.median(steady)) if steady else 0.0

    # Raw H2D bandwidth for attribution: a Base-config audio batch is
    # ~20 MB; if transfer alone exceeds the 16 ms step compute, the loop is
    # transfer-bound no matter how de-synced the host side is.
    import time
    payload = np.zeros((args.batch, int(args.seconds * 16000)), np.float32)
    jax.device_put(payload).block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        x = jax.device_put(payload)
        float(jax.device_get(x[0, 0]))      # full sync (tunnel-safe)
    h2d_s = (time.perf_counter() - t0) / reps
    h2d_mbps = payload.nbytes / 1e6 / h2d_s

    out = {"trainer_audio_sps_median": round(trainer_sps, 2),
           "trainer_windows": [(s, round(v, 1)) for s, v in windows],
           "steps": args.steps, "batch": args.batch,
           "h2d_mbps": round(h2d_mbps, 1),
           "h2d_ms_per_batch": round(h2d_s * 1e3, 1),
           "backend": jax.default_backend()}
    if not args.skip_bench:
        bench_sps, step_s, _ = bench.run_train_bench(
            cfg, batch_size=args.batch, seconds_per_utt=args.seconds,
            steps=30, warmup=6)
        out["bench_audio_sps"] = round(bench_sps, 2)
        out["trainer_over_bench"] = round(trainer_sps / bench_sps, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
