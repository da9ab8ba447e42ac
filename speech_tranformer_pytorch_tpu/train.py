"""Training driver (reference: ``train.py`` + ``solver.py`` epoch loop with
label-smoothed CE, grad clip, dev cross-validation, per-epoch checkpoints —
SURVEY.md §2.1 "Trainer/solver" / §3.1).

TPU-first: one jit'd ``train_step(state, batch, rng)`` with donated state;
the epoch skeleton is identical to the reference's but every batch is a
single XLA program. Sharding (DP/TP) is layered on by ``parallel/`` —
the step function itself is mesh-agnostic.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from .config import ExperimentConfig
from .models import SpeechTransformer
from .ops.fused_adam import FusedAdam
from .ops.losses import label_smoothed_cross_entropy, token_accuracy
from .ops.schedules import make_optimizer, noam_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


@dataclasses.dataclass(frozen=True)
class Batch:
    """One padded batch. ``targets_in`` is <sos>+y, ``targets_out`` is y+<eos>."""
    feats: jnp.ndarray          # [B, T, F]
    frame_lens: jnp.ndarray     # [B]
    targets_in: jnp.ndarray     # [B, U]
    targets_out: jnp.ndarray    # [B, U]
    target_lens: jnp.ndarray    # [B] (length incl. the <eos>)


jax.tree_util.register_pytree_node(
    Batch,
    lambda b: ((b.feats, b.frame_lens, b.targets_in, b.targets_out, b.target_lens), None),
    lambda _, xs: Batch(*xs),
)


def build_model(cfg: ExperimentConfig, mesh=None) -> SpeechTransformer:
    """Model constructor shared by every driver. ``attention_impl='ring'``
    needs a device mesh; mesh-less construction (init, eval, inference,
    greedy dev decode) substitutes the numerically-identical dot core —
    ring does not change the param tree or (deterministic) outputs, so
    checkpoints trained with ring load and decode unchanged."""
    mcfg = cfg.model
    if mcfg.attention_impl == "ring" and mesh is None:
        mcfg = mcfg.replace(attention_impl="dot")
    return SpeechTransformer(mcfg, mesh=mesh)


def compute_cast_dtype(cfg: ExperimentConfig):
    """Dtype to cast f32 params to for compute, or None (full precision).

    Mixed-precision master-copy scheme: ``TrainState.params`` (and adam
    mu/nu, and checkpoints) stay float32; inside the loss the whole param
    tree is cast to ``model.dtype`` ONCE per step, so every matmul reads
    bf16 weights directly instead of converting f32 weights at each use
    site (the converts measured ~17% of the base train step on XProf).
    The cast's VJP converts the bf16 cotangents back to f32 at the
    boundary, so the optimizer update happens in f32.
    """
    if not cfg.train.mixed_precision:
        return None
    dt = jnp.dtype(cfg.model.dtype)
    return None if dt == jnp.float32 else dt


def cast_params(params: Any, dtype) -> Any:
    """Cast every f32 leaf of the param tree to ``dtype`` (None = no-op)."""
    if dtype is None:
        return params
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)


def dropout_key(rng: jax.Array, step: jnp.ndarray, impl: str) -> jax.Array:
    """Per-step dropout key, optionally re-keyed onto the rbg PRNG.

    Threefry (JAX's default) generates dropout bits on the VPU at real
    cost: 42% of the base train step on v5e (see BENCHMARKS.md). ``rbg``
    maps the folded key's data onto ``jax.random.key(impl='rbg')`` state so
    every bulk ``bernoulli`` inside the model lowers to the TPU-native XLA
    RngBitGenerator. Deterministic given (rng, step); rbg bit-streams are
    stable per backend/compiler version, which is the reproducibility bar
    the epoch-shuffle/resume path needs (same machine, same binary).
    """
    return rekey_dropout(jax.random.fold_in(rng, step), impl)


def rekey_dropout(k: jax.Array, impl: str) -> jax.Array:
    """Map a (possibly raw-uint32) threefry key onto the requested impl."""
    if impl == "threefry":
        return k
    if impl != "rbg":
        raise ValueError(f"dropout_rng_impl must be 'rbg' or 'threefry', "
                         f"got {impl!r}")
    if jnp.issubdtype(k.dtype, jnp.integer):   # raw uint32[2] legacy key
        data = k
    else:
        data = jax.random.key_data(k)          # [2] uint32 (threefry)
    rbg_data = jnp.concatenate([data, data ^ jnp.uint32(0x9E3779B9)])
    return jax.random.wrap_key_data(rbg_data, impl="rbg")


def init_params(cfg: ExperimentConfig, rng: jax.Array, example: Batch) -> Any:
    # build_model substitutes ring->dot mesh-less; the attention impl does
    # not change the parameter tree, so init works for every impl.
    model = build_model(cfg)
    return model.init({"params": rng}, example.feats, example.frame_lens,
                      example.targets_in, example.target_lens)


def make_train_step(
    cfg: ExperimentConfig,
    tx: Optional[optax.GradientTransformation] = None,
    *,
    donate: bool = True,
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jit'd train step. Returns (new_state, metrics)."""
    model = build_model(cfg)
    fused = tx is None and uses_fused_optimizer(cfg)
    if fused:
        fused_opt = make_fused_opt(cfg)
    elif tx is None:
        tx = make_tx(cfg)
    smoothing = cfg.train.label_smoothing
    lr_schedule = noam_schedule(cfg.model.d_model, cfg.train.warmup_steps,
                                cfg.train.peak_lr_scale)
    cast_dt = compute_cast_dtype(cfg)
    rng_impl = cfg.train.dropout_rng_impl

    def step(state: TrainState, batch: Batch, rng: jax.Array):
        dropout_rng = dropout_key(rng, state.step, rng_impl)

        def loss_fn(params):
            logits = model.apply(
                cast_params(params, cast_dt), batch.feats, batch.frame_lens,
                batch.targets_in, batch.target_lens,
                deterministic=False, rngs={"dropout": dropout_rng})
            loss, tokens = label_smoothed_cross_entropy(
                logits, batch.targets_out, smoothing=smoothing)
            acc = token_accuracy(logits, batch.targets_out)
            return loss, (tokens, acc)

        (loss, (tokens, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # f32 accumulation: with master_weights the params (and thus the
        # cotangents) are bf16 — a bf16-accumulated norm would make the
        # clip threshold noisy.
        from .ops.fused_adam import global_norm_f32
        grad_norm = global_norm_f32(grads)
        if fused:
            # Single-pass Pallas Adam; shares the grad-norm reduction with
            # the metric (ops/fused_adam.py).
            params, opt_state = fused_opt.update_apply(
                grads, state.opt_state, state.params, grad_norm=grad_norm)
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "tokens": tokens,
            "accuracy": acc,
            "lr": lr_schedule(state.step + 1),
            # audio seconds in this batch (frames * 10ms hop), for
            # audio-seconds/s throughput accounting (BASELINE.json metric).
            "audio_seconds": jnp.sum(batch.frame_lens).astype(jnp.float32)
                             * (cfg.features.frame_shift_ms / 1000.0),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(cfg: ExperimentConfig):
    """Deterministic dev-loss step (reference: ``_run_one_epoch(train=False)``)."""
    model = build_model(cfg)
    smoothing = cfg.train.label_smoothing
    cast_dt = compute_cast_dtype(cfg)

    @jax.jit
    def step(params, batch: Batch):
        params = cast_params(params, cast_dt)
        logits = model.apply(params, batch.feats, batch.frame_lens,
                             batch.targets_in, batch.target_lens)
        loss, tokens = label_smoothed_cross_entropy(
            logits, batch.targets_out, smoothing=smoothing)
        acc = token_accuracy(logits, batch.targets_out)
        return {"loss": loss, "tokens": tokens, "accuracy": acc}

    return step


def make_tx(cfg: ExperimentConfig) -> optax.GradientTransformation:
    t = cfg.train
    return make_optimizer(
        cfg.model.d_model, t.warmup_steps, scale=t.peak_lr_scale,
        b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps,
        grad_clip_norm=t.grad_clip_norm, weight_decay=t.weight_decay,
        moment_dtype=t.moment_dtype)


def uses_fused_optimizer(cfg: ExperimentConfig) -> bool:
    return cfg.train.fused_optimizer


def make_fused_opt(cfg: ExperimentConfig) -> FusedAdam:
    t = cfg.train
    schedule = noam_schedule(cfg.model.d_model, t.warmup_steps,
                             t.peak_lr_scale)
    return FusedAdam(schedule, b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps,
                     grad_clip_norm=t.grad_clip_norm,
                     weight_decay=t.weight_decay,
                     moment_dtype=t.moment_dtype,
                     master_weights=t.master_weights)


def create_train_state(cfg: ExperimentConfig, rng: jax.Array, example: Batch,
                       *, sharded: bool = False) -> TrainState:
    """``sharded=True`` builds the optax-chain optimizer state — the mesh
    train steps (parallel/sharding.py) keep the optax path because GSPMD
    cannot partition the fused-Adam Pallas call over TP-sharded params.

    With ``train.master_weights`` (single-device, fused path):
    ``TrainState.params`` are the COMPUTE-dtype cast and the f32 master
    lives in the optimizer state — the per-step cast disappears."""
    params = init_params(cfg, rng, example)
    if sharded and cfg.train.master_weights:
        raise ValueError(
            "train.master_weights is single-device-only (the mesh path "
            "uses the optax chain); disable it for sharded training")
    if not sharded and uses_fused_optimizer(cfg):
        opt = make_fused_opt(cfg)
        if cfg.train.master_weights:
            opt_state = opt.init(params)            # f32 master inside
            return TrainState(step=jnp.zeros((), jnp.int32),
                              params=cast_params(params,
                                                 compute_cast_dtype(cfg)),
                              opt_state=opt_state)
        return TrainState.create(params, opt)
    return TrainState.create(params, make_tx(cfg))
