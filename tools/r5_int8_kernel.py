"""r5: measure the Pallas int8-weight decode kernel on the chip.

VERDICT r4 next #1: the XLA dequant-fusion int8 path measured NEUTRAL in
production decode because XLA hoists the loop-invariant dequant out of the
decode scan. This script measures the new path where QuantDenseGeneral
dispatches kernels/int8_matmul.py inside the scan (HBM serves int8 bytes
per step).

Run on the real chip:  python tools/r5_int8_kernel.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.decoding import greedy_decode_jit
from speech_tranformer_pytorch_tpu.decoding.beam import beam_decode
from speech_tranformer_pytorch_tpu.models import SpeechTransformer
from speech_tranformer_pytorch_tpu.ops.quantize import (decode_variables,
                                                        quantize_params)
from speech_tranformer_pytorch_tpu.train import cast_params

print("backend:", jax.default_backend(), jax.devices())

# ---- 1. kernel golden at production shapes, on-chip (compiled Mosaic). ----
from speech_tranformer_pytorch_tpu.kernels.int8_matmul import (
    int8_matmul, int8_matmul_reference)

for (m, k, n, bn) in [(80, 512, 1536, 512), (160, 2048, 512, 512),
                      (160, 512, 512, 512), (32, 512, 2048, 512)]:
    rng = jax.random.PRNGKey(m)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    wq = jax.random.randint(rng, (k, n), -127, 128, jnp.int8)
    s = jax.random.uniform(rng, (n,), jnp.float32, 0.001, 0.02)
    got = np.asarray(int8_matmul(x, wq, s, block_n=bn))
    want = np.asarray(int8_matmul_reference(x, wq, s))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"kernel golden m={m} k={k} n={n}: rel-err {err:.2e}")
    assert err < 2e-2, err

# ---- 2. production decode: bf16 vs int8-kernel. ----
import sys
cfg = get_config("base")
if "d2048" in sys.argv:
    # The weight-heavy serving regime the r4 study identified: decoder
    # weights dominate per-step HBM traffic, so the int8 kernel's
    # bandwidth cut should finally show (the r4 XLA-dequant path measured
    # neutral here because of hoisting).
    cfg = cfg.replace(model=cfg.model.replace(
        d_model=2048, num_heads=16, d_ff=8192))
model = SpeechTransformer(cfg.model)
rng = jax.random.PRNGKey(0)


def bench(b, frames=1000, beam=5, max_len=50):
    feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim),
                              jnp.float32)
    fl = jnp.full((b,), frames, jnp.int32)
    ti = jnp.zeros((b, 5), jnp.int32)
    params = model.init(rng, feats, fl, ti, jnp.full((b,), 5, jnp.int32))
    p16 = cast_params(params, jnp.bfloat16)
    qp = quantize_params(params, embedding_rows=True)   # production --int8

    if beam == 1:
        base = jax.jit(functools.partial(greedy_decode_jit, model,
                                         max_len=max_len, early_stop=False))
        kv = jax.jit(functools.partial(greedy_decode_jit, model,
                                       max_len=max_len, early_stop=False,
                                       int8_kv=True))
        i8 = jax.jit(lambda q, f, l: greedy_decode_jit(
            model, decode_variables(*q, jnp.bfloat16), f, l,
            max_len=max_len, early_stop=False))
        both = jax.jit(lambda q, f, l: greedy_decode_jit(
            model, decode_variables(*q, jnp.bfloat16), f, l,
            max_len=max_len, early_stop=False, int8_kv=True))
    else:
        base = jax.jit(functools.partial(
            beam_decode, model, beam_size=beam, max_len=max_len,
            early_stop=False))
        kv = jax.jit(functools.partial(
            beam_decode, model, beam_size=beam, max_len=max_len,
            early_stop=False, int8_kv=True))
        i8 = jax.jit(lambda q, f, l: beam_decode(
            model, decode_variables(*q, jnp.bfloat16), f, l,
            beam_size=beam, max_len=max_len, early_stop=False))
        both = jax.jit(lambda q, f, l: beam_decode(
            model, decode_variables(*q, jnp.bfloat16), f, l,
            beam_size=beam, max_len=max_len, early_stop=False,
            int8_kv=True))

    def run(tag, fn, p):
        r = fn(p, feats, fl)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = fn(p, feats, fl)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 10 * 1000
        audio = b * frames * 0.01                       # 10ms hop
        print(f"  B={b} beam={beam} {tag}: {dt:7.2f} ms/batch  "
              f"RTF {dt / 1000 / audio:.6f}")
        return dt, r

    d0, r0 = run("bf16       ", base, p16)
    d1, r1 = run("int8-weights", i8, qp)
    dk, rk = run("int8-kv     ", kv, p16)
    db, rb = run("int8-both   ", both, qp)
    t0 = np.asarray(jax.tree.leaves(r0)[0])
    t1 = np.asarray(jax.tree.leaves(r1)[0])
    tk = np.asarray(jax.tree.leaves(rk)[0])
    tb = np.asarray(jax.tree.leaves(rb)[0])
    print(f"  weights {d0 / d1:.3f}x  kv {d0 / dk:.3f}x  "
          f"both {d0 / db:.3f}x   agreement w={np.mean(t0 == t1):.3f} "
          f"kv={np.mean(t0 == tk):.3f} both={np.mean(t0 == tb):.3f}")


if "d2048" in sys.argv:
    bench(8, beam=5)
    bench(8, beam=1)
else:
    for b in (16, 32):
        bench(b, beam=5)
    bench(16, beam=1)
