import time
import jax, jax.numpy as jnp
from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.models import SpeechTransformer
from speech_tranformer_pytorch_tpu.decoding.beam import beam_decode

cfg = get_config("base")
b, frames = 16, 1000
rng = jax.random.PRNGKey(0)
model = SpeechTransformer(cfg.model)
feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim), jnp.float32)
fl = jnp.full((b,), frames, jnp.int32)
ti = jnp.zeros((b, 5), jnp.int32)
params = model.init(rng, feats, fl, ti, jnp.full((b,), 5, jnp.int32))
import functools
fn = jax.jit(functools.partial(beam_decode, model, beam_size=5, max_len=50,
                               early_stop=False))
r = fn(params, feats, fl)
jax.device_get(r.scores)
t0 = time.perf_counter()
for _ in range(5):
    r = fn(params, feats, fl)
jax.device_get(r.scores)
print("beam5 per-batch ms:", (time.perf_counter()-t0)/5*1000)
jax.profiler.start_trace("/tmp/prof_beam3")
for _ in range(5):
    r = fn(params, feats, fl)
jax.device_get(r.scores)
jax.profiler.stop_trace()
print("ok")
