from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh, replicated
from .sharding import (audio_batch_shardings, batch_shardings,
                       make_sharded_audio_train_step, make_sharded_train_step,
                       param_shardings, param_spec, shard_train_state,
                       state_shardings)
from .decode import make_sharded_beam_decode, make_sharded_greedy_decode
from .beam_exchange import distributed_topk
from .ring_attention import ring_attention, ring_self_attention
