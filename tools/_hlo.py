import jax, jax.numpy as jnp
from speech_tranformer_pytorch_tpu.config import get_config
from speech_tranformer_pytorch_tpu.train import Batch, create_train_state, make_train_step
cfg = get_config("base")
b, frames, u = 32, 1000, 30
rng = jax.random.PRNGKey(0)
feats = jax.random.normal(rng, (b, frames, cfg.model.input_dim), jnp.float32)
fl = jnp.full((b,), frames, jnp.int32)
ti = jax.random.randint(rng, (b, u), 4, cfg.model.vocab_size).at[:, 0].set(1)
to = jnp.concatenate([ti[:, 1:], jnp.full((b,1),2,jnp.int32)], 1)
tl = jnp.full((b,), u, jnp.int32)
batch = Batch(feats, fl, ti, to, tl)
state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
step = make_train_step(cfg, donate=False)
txt = step.lower(state, batch, rng).compile().as_text()
open("/tmp/rbg_step.hlo","w").write(txt)
print("ok")
