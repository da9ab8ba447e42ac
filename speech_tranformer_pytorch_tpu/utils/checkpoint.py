"""Checkpoint/resume (reference: ``torch.save({'model','optimizer','epoch'})``
per epoch + ``--continue-from`` — SURVEY.md §2.1 "Checkpoint I/O" / §5).

TPU-native: orbax step-based async checkpointing of the full training
pytree — params, optax state, PRNG key, data-iterator position (epoch +
batch offset) and the config hash, so resume is bit-exact including the
input stream (SURVEY.md §5 "Checkpoint / resume")."""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..train import TrainState


@dataclasses.dataclass
class CheckpointState:
    """Everything needed for bit-exact resume.

    ``best_dev_loss``/``best_dev_step`` make best-model tracking survive
    restarts (reference parity: the Solver tracks the best dev model across
    the whole run — SURVEY.md §2.1 "Trainer/solver"): without them a resumed
    run's first dev eval would always overwrite ``work_dir/best``, possibly
    with a worse model than the pre-crash best.
    """
    state: TrainState
    rng: jax.Array
    epoch: int
    batch_in_epoch: int
    config_hash: str
    best_dev_loss: float = float("inf")
    best_dev_step: int = -1


class Checkpointer:
    def __init__(self, directory: str, *, max_to_keep: int = 5,
                 async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save)
        self.mngr = ocp.CheckpointManager(self.directory, options=opts)

    def save(self, step: int, ckpt: CheckpointState) -> None:
        payload = {
            "state": ckpt.state,
            "rng": ckpt.rng,
            "meta": {
                "epoch": np.asarray(ckpt.epoch, np.int64),
                "batch_in_epoch": np.asarray(ckpt.batch_in_epoch, np.int64),
                "best_dev_loss": np.asarray(ckpt.best_dev_loss, np.float64),
                "best_dev_step": np.asarray(ckpt.best_dev_step, np.int64),
            },
        }
        self.mngr.save(step, args=ocp.args.StandardSave(payload),
                       metrics=None)
        # config hash as sidecar text (human-checkable)
        with open(os.path.join(self.directory, "config_hash.txt"), "w") as f:
            f.write(ckpt.config_hash + "\n")

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, template: CheckpointState,
                step: Optional[int] = None) -> Tuple[int, CheckpointState]:
        """Restore into the shapes/dtypes of ``template``. Returns
        (step, CheckpointState)."""
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        payload = {
            "state": template.state,
            "rng": template.rng,
            "meta": {"epoch": np.asarray(0, np.int64),
                     "batch_in_epoch": np.asarray(0, np.int64),
                     "best_dev_loss": np.asarray(np.inf, np.float64),
                     "best_dev_step": np.asarray(-1, np.int64)},
        }
        try:
            restored = self.mngr.restore(
                step, args=ocp.args.StandardRestore(payload))
        except (ValueError, KeyError):
            # Checkpoint written before best-model meta existed: restore
            # without those keys and keep the template defaults (inf / -1 —
            # first dev eval re-seeds the best tracker).
            payload["meta"].pop("best_dev_loss")
            payload["meta"].pop("best_dev_step")
            restored = self.mngr.restore(
                step, args=ocp.args.StandardRestore(payload))
            restored["meta"]["best_dev_loss"] = np.asarray(np.inf)
            restored["meta"]["best_dev_step"] = np.asarray(-1)
        hash_path = os.path.join(self.directory, "config_hash.txt")
        config_hash = ""
        if os.path.exists(hash_path):
            config_hash = open(hash_path).read().strip()
        return step, CheckpointState(
            state=restored["state"], rng=restored["rng"],
            epoch=int(restored["meta"]["epoch"]),
            batch_in_epoch=int(restored["meta"]["batch_in_epoch"]),
            config_hash=config_hash,
            best_dev_loss=float(restored["meta"]["best_dev_loss"]),
            best_dev_step=int(restored["meta"]["best_dev_step"]))

    def wait(self) -> None:
        self.mngr.wait_until_finished()

    def close(self) -> None:
        self.mngr.close()
