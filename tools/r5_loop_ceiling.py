"""r5: demonstrate the Trainer-loop ceiling with device-resident batches.

VERDICT r4 next #4: tools/trainer_vs_bench.py measured the production
``Trainer.train`` at ~2,014 audio-s/s vs bench.py's ~20k and ATTRIBUTED
the gap to the axon tunnel's 42-119 MB/s H2D — plausible arithmetic, but
no measurement existed of what the loop itself (dispatch, host-side step
counter, logging, prefetch machinery) can sustain once transfer is out of
the path. This tool pre-stages a pool of batches ON the device, swaps the
Trainer's batcher for a pool-cycling stub, and runs the REAL
``Trainer.train`` loop — every line of runner.py's hot loop executes,
only the per-step H2D vanishes (the loop's ``jnp.asarray`` H2D map
becomes a no-op on committed device arrays; only state is donated, so
re-feeding pool batches is safe). Done-bar: Trainer wall-clock within
~5-10% of bench.py on the same workload.

Usage (on the TPU):  PYTHONPATH=. python tools/r5_loop_ceiling.py [--steps 60]
"""

import argparse
import itertools
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class DevicePoolBatcher:
    """Stands in for BucketedBatcher: cycles a pool of device-resident
    AudioBatches. Same epoch() signature the train loop uses."""

    def __init__(self, pool, batches_per_epoch):
        self.pool = pool
        self.batches_per_epoch = batches_per_epoch

    def epoch(self, epoch_idx, *, skip_batches=0, with_rows=False):
        it = itertools.islice(itertools.cycle(self.pool),
                              self.batches_per_epoch - skip_batches)
        return iter(it)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--pool", type=int, default=4)
    ap.add_argument("--preset", default="base")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--bare", action="store_true",
                    help="bare step_fn dispatch loop, no Trainer machinery")
    ap.add_argument("--target-len", type=int, default=31)
    args = ap.parse_args()

    import bench
    bench.enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from tools.trainer_vs_bench import build_corpus
    from speech_tranformer_pytorch_tpu.config import get_config
    from speech_tranformer_pytorch_tpu.runner import Trainer

    cfg = get_config(args.preset)
    root = tempfile.mkdtemp(prefix="loop_ceiling_")
    manifest = build_corpus(root, n_utts=args.pool * args.batch,
                            n_entries=args.pool * args.batch,
                            seconds=args.seconds,
                            n_tokens=min(30, cfg.data.max_target_len - 2),
                            vocab_size=cfg.model.vocab_size)
    cfg = cfg.replace(
        train=cfg.train.replace(
            batch_size=args.batch, num_epochs=10_000,
            log_every=args.log_every, checkpoint_every_steps=10_000_000,
            eval_every_steps=0),
        # max_target_len pins the batcher's target pad: the default 128
        # makes every Trainer batch run a 128-position decoder against
        # bench's 30-token targets — a 4x decoder-compute mismatch that
        # masquerades as "loop overhead" (r5 finding). 31 = bench's 30
        # tokens + sos.
        data=cfg.data.replace(train_manifest=manifest, dev_manifest="",
                              max_target_len=args.target_len))

    work = os.path.join(root, "work")
    tr = Trainer(cfg, work_dir=work, mesh=None)

    # Pre-stage the pool ON the device, then swap the batcher. The train
    # loop's own `map(jnp.asarray, ...)` H2D stage no-ops on these.
    pool = []
    for ab in tr.batcher.epoch(0):
        pool.append(jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x)), ab))
        if len(pool) >= args.pool:
            break
    jax.block_until_ready([b.audio for b in pool])
    tr.batcher = DevicePoolBatcher(pool, batches_per_epoch=args.steps + 10)

    if args.bare:
        # Bare dispatch loop: the same step_fn on the same device-resident
        # pool with ZERO Trainer machinery (no prefetch thread, no logging,
        # no pending-metrics list) — separates runner.py overhead from the
        # inherent per-dispatch cost of the audio step over this backend.
        import time
        state, rng = tr.state, tr.rng
        for i in range(6):                       # warmup + compile
            state, m = tr.step_fn(state, pool[i % len(pool)], rng)
        jax.block_until_ready(m["loss"])
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = tr.step_fn(state, pool[i % len(pool)], rng)
        float(jax.device_get(m["loss"]))        # full sync (tunnel-safe)
        dt = time.perf_counter() - t0
        audio = args.steps * args.batch * args.seconds
        out = {"bare_loop_sps": round(audio / dt, 2),
               "bare_ms_per_step": round(dt / args.steps * 1e3, 2),
               "steps": args.steps, "batch": args.batch,
               "backend": jax.default_backend()}
        if not args.skip_bench:
            bench_sps, _, _ = bench.run_train_bench(
                cfg, batch_size=args.batch, seconds_per_utt=args.seconds,
                steps=30, warmup=6)
            out["bench_audio_sps"] = round(bench_sps, 2)
            out["bare_over_bench"] = round(out["bare_loop_sps"] / bench_sps,
                                           4)
        print(json.dumps(out))
        return

    tr.train(max_steps=args.steps)

    windows = []
    with open(os.path.join(work, "train_metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "audio_sps" in r:
                windows.append((r["step"], r["audio_sps"]))
    steady = [sps for step, sps in windows if step > args.log_every]
    trainer_sps = float(np.median(steady)) if steady else 0.0

    out = {"trainer_device_resident_sps_median": round(trainer_sps, 2),
           "trainer_windows": [(s, round(v, 1)) for s, v in windows],
           "steps": args.steps, "batch": args.batch, "pool": args.pool,
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
