"""Device-mesh construction (reference: none — the PyTorch reference is
single-process/single-GPU, SURVEY.md §2.2; all parallelism here is new,
idiomatic TPU: ``jax.sharding.Mesh`` + GSPMD).

Mesh axes: ``('data', 'model')`` — utterance batches split over ``data``
(across hosts/chips, gradients all-reduced over ICI by XLA), attention
heads / FFN hidden split over ``model`` when weights exceed one chip
(the d_model=2048 Sharded preset, BASELINE.json configs[4]).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    model_axis_size: Optional[int] = None,
) -> Mesh:
    """Build a 2-D ('data', 'model') mesh over the given devices.

    ``model_axis_size`` (or cfg.model_axis) fixes the TP degree; remaining
    devices form the data axis. Uses ``jax.experimental.mesh_utils`` device
    ordering so the model axis lands on physically adjacent chips (ICI).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = model_axis_size if model_axis_size is not None else (
        cfg.model_axis if cfg is not None else 1)
    if tp < 1 or n % tp != 0:
        raise ValueError(f"model axis {tp} must divide device count {n}")
    dp = n // tp
    try:
        from jax.experimental import mesh_utils
        mesh_devices = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    except Exception:
        mesh_devices = np.asarray(devices).reshape(dp, tp)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def make_mesh_auto(cfg: MeshConfig) -> Optional[Mesh]:
    """Auto-mode mesh selection for drivers (Trainer mesh='auto',
    recognize_cli --mesh auto): build the mesh when the topology supports
    it, else fall back to ``None`` (single-device path) with a warning.

    Rationale: a Sharded-preset checkpoint (mesh.model_axis=4) must remain
    decodable on a 1-chip host — auto mode previously hard-failed in
    ``make_mesh`` ("model axis must divide device count"). The fallback is
    single-process only: under a multi-process launch the collective-free
    path would train/decode silently-divergent replicas, so auto stays
    strict there ('on' is always strict).
    """
    n = len(jax.devices())
    tp = cfg.model_axis
    if jax.process_count() == 1 and (tp > n or n % tp != 0):
        import warnings
        warnings.warn(
            f"mesh auto mode: cfg.mesh.model_axis={tp} does not fit the "
            f"{n} local device(s); falling back to the single-device path "
            "(pass --mesh on / an explicit Mesh to make this an error)")
        return None
    return make_mesh(cfg)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
