import sys, time, jax, jax.numpy as jnp
from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.train import Batch, create_train_state, make_train_step
use_flash = sys.argv[1] == "1"
frames = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
cfg = get_config("base")
cfg = cfg.replace(model=cfg.model.replace(use_flash_attention=use_flash))
b, u = 32, 30
rng = jax.random.PRNGKey(0)
feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim), jnp.float32)
fl = jnp.full((b,), frames, jnp.int32)
ti = jax.random.randint(rng, (b, u), 4, cfg.model.vocab_size).at[:, 0].set(1)
to = jnp.concatenate([ti[:, 1:], jnp.full((b,1),2,jnp.int32)], 1)
tl = jnp.full((b,), u, jnp.int32)
batch = Batch(feats, fl, ti, to, tl)
state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
step = make_train_step(cfg)
for _ in range(5):
    state, m = step(state, batch, rng)
float(jax.device_get(m["loss"]))
t0 = time.perf_counter(); N=20
for _ in range(N):
    state, m = step(state, batch, rng)
float(jax.device_get(m["loss"]))
print(f"flash={use_flash} frames={frames}: {(time.perf_counter()-t0)/N*1e3:.2f} ms/step loss={float(m['loss']):.4f}")
