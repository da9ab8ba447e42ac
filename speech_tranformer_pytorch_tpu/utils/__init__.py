from .checkpoint import Checkpointer, CheckpointState
from .logging import MetricsLogger, is_primary
from .profiling import StepTimer, named_scope, sync, trace
