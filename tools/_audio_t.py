import sys, time
import numpy as np
import jax, jax.numpy as jnp
from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.data.pipeline import AudioBatch, make_audio_train_step, make_preprocess_fn
from speech_tranformer_pytorch_tpu.train import create_train_state

cfg = get_config("base")
for kv in sys.argv[1:]:
    k, v = kv.split("=", 1)
    try: v = eval(v)
    except Exception: pass
    if hasattr(cfg.features, k): cfg = cfg.replace(features=cfg.features.replace(**{k: v}))
    elif hasattr(cfg.model, k): cfg = cfg.replace(model=cfg.model.replace(**{k: v}))
    elif hasattr(cfg.train, k): cfg = cfg.replace(train=cfg.train.replace(**{k: v}))
b, secs, u = 32, 10.0, 30
sr = cfg.features.sample_rate
ns = int(secs * sr)
rng = np.random.RandomState(0)
audio = jnp.asarray(rng.randn(b, ns).astype(np.float32) * 0.1)
slens = jnp.full((b,), ns, jnp.int32)
ti = jnp.asarray(rng.randint(4, cfg.model.vocab_size, (b, u)).astype(np.int32))
ti = ti.at[:, 0].set(1)
to = jnp.concatenate([ti[:, 1:], jnp.full((b, 1), 2, jnp.int32)], 1)
tl = jnp.full((b,), u, jnp.int32)
abatch = AudioBatch(audio, slens, ti, to, tl, jnp.ones((b,), bool))
pre = make_preprocess_fn(cfg.features, None)
example = jax.jit(pre)(abatch)
state = create_train_state(cfg, jax.random.PRNGKey(0), example)
step = make_audio_train_step(cfg)
r = jax.random.PRNGKey(1)
for _ in range(5):
    state, m = step(state, abatch, r)
float(jax.device_get(m["loss"]))
n = 30
t0 = time.perf_counter()
for _ in range(n):
    state, m = step(state, abatch, r)
float(jax.device_get(m["loss"]))
dt = (time.perf_counter() - t0) / n
print(f"audio step {dt*1e3:.2f} ms  audio-s/s {b*secs/dt:.0f}  args={sys.argv[1:]}")
