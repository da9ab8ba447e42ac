"""Round-4 TPU measurement sweep (VERDICT r3 items #3 and #8):

1. Batch scaling WITH the flash kernel (B in {32,48,64,96,128},
   use_flash_attention=True): the B>32 throughput collapse in
   BENCHMARKS.md was measured on the XLA attention core, whose [B,H,T,S]
   f32 workspace is exactly what flash's O(T) memory removes.
2. bf16 optimizer moments (train.moment_dtype='bfloat16'): the optimizer
   is the measured HBM bandwidth floor (~1.9 ms/step f32 mu/nu).

Each config is one bench.run_train_bench call (the headline workload);
results print as JSONL. Run on the chip:  python tools/r4_sweep.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench.enable_compilation_cache()

from speech_tranformer_pytorch_tpu.config import get_config


def run(tag, cfg, batch, steps=30):
    sps, step_s, loss = bench.run_train_bench(
        cfg, batch_size=batch, seconds_per_utt=10.0, steps=steps, warmup=6)
    r = {"tag": tag, "batch": batch, "audio_sps": round(sps, 1),
         "step_ms": round(step_s * 1e3, 2), "loss": round(float(loss), 3)}
    print(json.dumps(r), flush=True)
    return r


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    base = get_config("base")
    flash = base.replace(model=base.model.replace(use_flash_attention=True))
    bf16m = base.replace(train=base.train.replace(moment_dtype="bfloat16"))

    jobs = [("base-b32", base, 32)]
    jobs += [(f"flash-b{b}", flash, b) for b in (32, 48, 64, 96, 128)]
    jobs += [(f"dot-b{b}", base, b) for b in (64, 128)]
    jobs += [("bf16mom-b32", bf16m, 32)]
    for tag, cfg, b in jobs:
        if only and only not in tag:
            continue
        try:
            run(tag, cfg, b)
        except Exception as e:  # one OOM/compile failure must not kill the sweep
            print(json.dumps({"tag": tag, "batch": b,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
