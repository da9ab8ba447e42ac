"""TPU-native Speech-Transformer ASR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
reference ``ZhengkunTian/Speech-Tranformer-Pytorch`` (see SURVEY.md for the
layer map; the reference mount was empty this session so parity claims cite
SURVEY.md sections rather than reference file:line).
"""

from . import config
from .config import ExperimentConfig, get_config

__version__ = "0.1.0"
