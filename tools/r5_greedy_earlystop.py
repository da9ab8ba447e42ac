"""Round-5 measurement: greedy decode early termination (while_loop vs scan).

Three data points at the perf-gate shape (Base, B=16, frames=1000,
max_len=50):
  1. scan (early_stop=False), random params  — the r4 baseline.
  2. while_loop, random params               — sequences never emit <eos>
     (worst case: all 50 steps run) — isolates while_loop overhead.
  3. while_loop, eos-forcing params          — out_proj kernel zeroed, so
     after pad/sos masking argmax lands on <eos> at step 0 and every
     sequence finishes after one step (best case: the converged-model
     regime where hypotheses run ~15-20 tokens vs max_len 50+ sits
     between 2 and 3).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python tools/r5_greedy_earlystop.py
"""
import functools
import time

import jax
import jax.numpy as jnp

from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.decoding import greedy_decode_jit
from speech_tranformer_pytorch_tpu.models import SpeechTransformer


def measure(fn, params, feats, fl, runs=8):
    tokens, lengths = fn(params, feats, fl)
    float(jax.device_get(lengths).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(runs):
        tokens, lengths = fn(params, feats, fl)
    float(jax.device_get(lengths).ravel()[0])
    dt = (time.perf_counter() - t0) / runs
    return dt, jax.device_get(lengths)


def main():
    cfg = get_config("base")
    b, frames, max_len = 16, 1000, 50
    rng = jax.random.PRNGKey(0)
    model = SpeechTransformer(cfg.model)
    feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim),
                              jnp.float32)
    fl = jnp.full((b,), frames, jnp.int32)
    params = model.init(rng, feats, fl, jnp.zeros((b, 5), jnp.int32),
                        jnp.full((b,), 5, jnp.int32))

    fns = {
        "scan": jax.jit(lambda p, f, l: greedy_decode_jit(
            model, p, f, l, max_len=max_len, early_stop=False)),
        "while": jax.jit(lambda p, f, l: greedy_decode_jit(
            model, p, f, l, max_len=max_len, early_stop=True)),
    }

    dt, lens = measure(fns["scan"], params, feats, fl)
    print(f"scan  random-params: {dt*1e3:7.2f} ms  RTF {dt/(b*10):0.6f} "
          f"(lens {lens.min()}..{lens.max()})")
    dt, lens = measure(fns["while"], params, feats, fl)
    print(f"while random-params: {dt*1e3:7.2f} ms  RTF {dt/(b*10):0.6f} "
          f"(lens {lens.min()}..{lens.max()})")

    # eos-forcing params: zero the output projection => all logits equal
    # => argmax after pad/sos masking = <eos> (id 2) at step 0. Base ties
    # embed/out_proj (share_embedding), so zero the embedding table too.
    hits = []

    def zero_proj(path, x):
        names = {getattr(k, "key", None) for k in path}
        if "out_proj" in names or "embed" in names:
            hits.append("/".join(str(getattr(k, "key", k)) for k in path))
            return jnp.zeros_like(x)
        return x

    zeroed = jax.tree_util.tree_map_with_path(zero_proj, params)
    assert hits, "eos-forcing probe matched no params"
    print(f"zeroed {len(hits)} leaves: {hits[:3]}...")
    dt, lens = measure(fns["while"], zeroed, feats, fl)
    print(f"while eos-at-step0 : {dt*1e3:7.2f} ms  RTF {dt/(b*10):0.6f} "
          f"(lens {lens.min()}..{lens.max()})")
    dt, lens = measure(fns["scan"], zeroed, feats, fl)
    print(f"scan  eos-at-step0 : {dt*1e3:7.2f} ms  RTF {dt/(b*10):0.6f} "
          f"(lens {lens.min()}..{lens.max()})")


if __name__ == "__main__":
    main()
