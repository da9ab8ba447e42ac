"""Profile the round-4 production audio train step (bf16 moments default,
int16 PCM input) and print the top device ops. Usage: python tools/_prof_r4.py"""
import numpy as np
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import bench
bench.enable_compilation_cache()
from speech_tranformer_pytorch_tpu.config import get_config

cfg = get_config("base")
state, step, batch = bench.build_train_workload(cfg, 32, 10.0)
# production transport: int16 PCM
batch = batch.__class__(
    audio=jnp.asarray((np.asarray(batch.audio) * 32767).astype(np.int16)),
    sample_lens=batch.sample_lens, targets_in=batch.targets_in,
    targets_out=batch.targets_out, target_lens=batch.target_lens,
    valid=batch.valid)
rng = jax.random.PRNGKey(1)
for _ in range(6):
    state, m = step(state, batch, rng)
float(jax.device_get(m["loss"]))
jax.profiler.start_trace("/tmp/prof_r4")
for _ in range(10):
    state, m = step(state, batch, rng)
float(jax.device_get(m["loss"]))
jax.profiler.stop_trace()
print("trace ok")
