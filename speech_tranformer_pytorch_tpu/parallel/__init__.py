from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh, replicated
from .sharding import (batch_shardings, make_sharded_train_step,
                       param_shardings, param_spec, shard_train_state,
                       state_shardings)
