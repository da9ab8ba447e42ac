"""Quick TPU step timer: base config train step, variants via argv flags.

Usage: python _t.py [key=value ...]   (keys are ModelConfig/TrainConfig fields)
"""
import sys
import time

import jax
import jax.numpy as jnp

from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.train import (Batch, create_train_state,
                                                 make_train_step)

cfg = get_config("base")
frames = 1000
b = 32
for kv in sys.argv[1:]:
    k, v = kv.split("=", 1)
    if k == "frames":
        frames = int(v); continue
    if k == "batch":
        b = int(v); continue
    try:
        v = eval(v)
    except Exception:
        pass
    if hasattr(cfg.model, k):
        cfg = cfg.replace(model=cfg.model.replace(**{k: v}))
    elif hasattr(cfg.train, k):
        cfg = cfg.replace(train=cfg.train.replace(**{k: v}))
    else:
        raise SystemExit(f"unknown key {k}")

u = 30
rng = jax.random.PRNGKey(0)
feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim), jnp.float32)
fl = jnp.full((b,), frames, jnp.int32)
ti = jax.random.randint(rng, (b, u), 4, cfg.model.vocab_size).at[:, 0].set(1)
to = jnp.concatenate([ti[:, 1:], jnp.full((b, 1), 2, jnp.int32)], 1)
tl = jnp.full((b,), u, jnp.int32)
batch = Batch(feats, fl, ti, to, tl)
state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
step = make_train_step(cfg)
for _ in range(5):
    state, m = step(state, batch, rng)
float(jax.device_get(m["loss"]))  # block_until_ready under-syncs on axon
n = 30
t0 = time.perf_counter()
for _ in range(n):
    state, m = step(state, batch, rng)
float(jax.device_get(m["loss"]))
dt = (time.perf_counter() - t0) / n
print(f"step {dt*1e3:.2f} ms  loss {float(m['loss']):.3f}  "
      f"audio-s/s {b*frames*0.01/dt:.0f}  args={sys.argv[1:]}")
