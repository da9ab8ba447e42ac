import time, functools, sys
import jax, jax.numpy as jnp
from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.models import SpeechTransformer
from speech_tranformer_pytorch_tpu.decoding.beam import beam_decode
from speech_tranformer_pytorch_tpu.decoding import greedy_decode_jit

cfg = get_config("base")
b, frames = 16, 1000
rng = jax.random.PRNGKey(0)
model = SpeechTransformer(cfg.model)
feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim), jnp.float32)
fl = jnp.full((b,), frames, jnp.int32)
ti = jnp.zeros((b, 5), jnp.int32)
params = model.init(rng, feats, fl, ti, jnp.full((b,), 5, jnp.int32))

def run(tag, fn):
    r = fn(params, feats, fl)
    jax.device_get(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        r = fn(params, feats, fl)
    jax.device_get(jax.tree.leaves(r)[0])
    dt = (time.perf_counter()-t0)/10*1000
    audio = b * 10.0
    print(f"{tag}: {dt:.1f} ms/batch  RTF {dt/1000/audio:.5f}")

for lin in (False, True):
    run(f"beam5 lineage={lin}", jax.jit(functools.partial(
        beam_decode, model, beam_size=5, max_len=50, early_stop=False,
        use_lineage=lin)))
run("greedy           ", jax.jit(functools.partial(
    greedy_decode_jit, model, max_len=50)))
