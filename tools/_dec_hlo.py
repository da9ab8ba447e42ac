import functools
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
params = model.init(rng, feats, fl, jnp.zeros((b,5),jnp.int32), jnp.full((b,),5,jnp.int32))
fn = jax.jit(functools.partial(beam_decode, model, beam_size=5, max_len=50, early_stop=False))
txt = fn.lower(params, feats, fl).compile().as_text()
open("/tmp/beam.hlo","w").write(txt)
print("ok")
