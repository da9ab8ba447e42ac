"""GSPMD sharding rules (reference: none — single-GPU; SURVEY.md §2.2).

Parameter layout on the ('data', 'model') mesh for the TP/Sharded preset:

  attention q/k/v DenseGeneral kernel  (d_model, H, Dh) -> P(None,'model',None)
  attention out  DenseGeneral kernel  (H, Dh, d_model) -> P('model',None,None)
  FFN first Dense kernel              (d_model, d_ff)  -> P(None,'model')
  FFN second Dense kernel             (d_ff, d_model)  -> P('model',None)
  decoder embedding                   (V, d_model)     -> P(None,'model')
  conv / layernorm / biases / PE                       -> replicated

i.e. head-sharded attention and column/row-split FFN — the classic
Megatron decomposition, expressed purely as GSPMD annotations; XLA inserts
the (reduce-)scatter/all-gather collectives over ICI. Optimizer state
(adam mu/nu) mirrors the param specs. Batches shard batch-dim over 'data'.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import Batch, TrainState
from .mesh import DATA_AXIS, MODEL_AXIS

# (path regex, spec builder). Paths look like
# "params/encoder/layer_0/self_attn/q/kernel".
_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*/(self_attn|cross_attn)/(q|k|v)/kernel$", P(None, MODEL_AXIS, None)),
    # fused_qkv kernel (d_model, 3, H, Dh): shard the head axis.
    (r".*/self_attn/qkv/kernel$", P(None, None, MODEL_AXIS, None)),
    (r".*/self_attn/qkv/bias$", P(None, MODEL_AXIS, None)),
    (r".*/(self_attn|cross_attn)/out/kernel$", P(MODEL_AXIS, None, None)),
    # FeedForward submodules are Dense_0 (in->hidden) and Dense_1 (hidden->out)
    (r".*/FeedForward_\d+/Dense_0/kernel$", P(None, MODEL_AXIS)),
    (r".*/FeedForward_\d+/Dense_1/kernel$", P(MODEL_AXIS, None)),
    (r".*/ffn/Dense_0/kernel$", P(None, MODEL_AXIS)),
    (r".*/ffn/Dense_1/kernel$", P(MODEL_AXIS, None)),
    (r".*/embed/embedding$", P(None, MODEL_AXIS)),
    (r".*/out_proj/kernel$", P(None, MODEL_AXIS)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(path_str: str, leaf) -> P:
    for pattern, spec in _RULES:
        if re.match(pattern, path_str):
            if leaf.ndim == len(spec):
                return spec
            # nn.scan-stacked layout (model.scan_layers): same kernel with a
            # leading layer axis — replicate that axis, shard the rest.
            if "/layers/" in path_str and leaf.ndim == len(spec) + 1:
                return P(None, *spec)
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings matching ``params``."""
    def fn(path, leaf):
        return NamedSharding(mesh, param_spec(_path_str(path), leaf))
    return jax.tree_util.tree_map_with_path(fn, params)


def opt_state_shardings(mesh: Mesh, opt_state: Any, params: Any) -> Any:
    """Adam mu/nu mirror the param specs; scalar counts are replicated."""
    p_spec = {id_path: s for id_path, s in _flatten_with_path(param_shardings(mesh, params))}

    def fn(path, leaf):
        ps = _path_str(path)
        # strip optax wrapper prefixes ("0/mu/...", "inner_state/...") down
        # to the param-tree suffix and look it up.
        for id_path, sharding in p_spec.items():
            if ps.endswith(id_path):
                if leaf.ndim == len(sharding.spec):
                    return sharding
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(fn, opt_state)


def _flatten_with_path(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(_path_str(path), leaf) for path, leaf in flat]


def state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    return TrainState(
        step=NamedSharding(mesh, P()),
        params=param_shardings(mesh, state.params),
        opt_state=opt_state_shardings(mesh, state.opt_state, state.params),
    )


def batch_shardings(mesh: Mesh, batch: Batch) -> Batch:
    ds = lambda ndim: NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
    return Batch(
        feats=ds(3), frame_lens=ds(1), targets_in=ds(2),
        targets_out=ds(2), target_lens=ds(1),
    )


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place an (unsharded) TrainState onto the mesh per the rules."""
    sh = state_shardings(mesh, state)
    return jax.tree.map(jax.device_put, state, sh)


def _check_optax_state(state: TrainState, where: str) -> None:
    """The mesh steps use the optax chain (GSPMD cannot partition the
    fused-Adam Pallas call over TP-sharded params); catch the mismatched
    state early with an actionable message instead of a tree-structure
    error from deep inside ``tx.update``."""
    from ..ops.fused_adam import FusedAdamState
    if isinstance(state.opt_state, FusedAdamState):
        raise TypeError(
            f"{where} uses the optax optimizer, but state.opt_state is a "
            "FusedAdamState (train.fused_optimizer). Build the state with "
            "create_train_state(..., sharded=True).")


def make_sharded_train_step(cfg, mesh: Mesh, *, donate: bool = True):
    """jit the train step with explicit in/out shardings over the mesh.

    Gradient all-reduce over 'data' and TP collectives over 'model' are
    inserted by GSPMD — no hand-written communication (SURVEY.md §5
    "Distributed communication backend").
    """
    from ..train import (build_model, cast_params, compute_cast_dtype,
                         dropout_key, make_tx)

    tx = make_tx(cfg)
    from ..ops.losses import label_smoothed_cross_entropy, token_accuracy
    import jax.numpy as jnp

    model = build_model(cfg, mesh=mesh)
    smoothing = cfg.train.label_smoothing
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
            return loss, (tokens, token_accuracy(logits, batch.targets_out))

        (loss, (tokens, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {"loss": loss, "grad_norm": grad_norm, "tokens": tokens,
                   "accuracy": acc}
        return new_state, metrics

    def with_shardings(state_example: TrainState, batch_example: Batch):
        _check_optax_state(state_example, "make_sharded_train_step")
        s_sh = state_shardings(mesh, state_example)
        b_sh = batch_shardings(mesh, batch_example)
        m_sh = {k: NamedSharding(mesh, P()) for k in
                ("loss", "grad_norm", "tokens", "accuracy")}
        return jax.jit(
            step,
            in_shardings=(s_sh, b_sh, NamedSharding(mesh, P())),
            out_shardings=(s_sh, m_sh),
            donate_argnums=(0,) if donate else (),
        )

    return with_shardings


def audio_batch_shardings(mesh: Mesh, batch) -> Any:
    """AudioBatch counterpart of batch_shardings (raw-audio production path)."""
    from ..data.pipeline import AudioBatch
    ds = lambda ndim: NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
    return AudioBatch(audio=ds(2), sample_lens=ds(1), targets_in=ds(2),
                      targets_out=ds(2), target_lens=ds(1), valid=ds(1))


def globalize_audio_batch(mesh: Mesh, abatch) -> Any:
    """Assemble a host-local AudioBatch into global arrays sharded over the
    mesh's 'data' axis. Under multi-process launches every host contributes
    its shard (all hosts follow the same metadata-only epoch plan, so
    shapes agree); single-process this is a device_put onto the mesh."""
    import numpy as np
    sh = audio_batch_shardings(mesh, abatch)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        abatch, sh)


def make_sharded_audio_eval_step(cfg, mesh: Mesh):
    """Sharded counterpart of ``runner.make_audio_eval_step``: deterministic
    dev loss over a 'data'-sharded AudioBatch with TP-sharded params. The
    token-weighted reductions inside the loss become global sums under
    GSPMD, so the returned (per-token loss, token count) match the
    unsharded step bit-for-bit on the same global batch."""
    import jax.numpy as jnp

    from ..data.pipeline import make_preprocess_fn
    from ..ops.losses import label_smoothed_cross_entropy
    from ..train import build_model, cast_params, compute_cast_dtype

    model = build_model(cfg, mesh=mesh)
    preprocess = make_preprocess_fn(cfg.features, None)
    smoothing = cfg.train.label_smoothing
    cast_dt = compute_cast_dtype(cfg)

    def step(params, abatch):
        batch = preprocess(abatch)
        logits = model.apply(cast_params(params, cast_dt), batch.feats,
                             batch.frame_lens, batch.targets_in,
                             batch.target_lens)
        tgt = jnp.where(abatch.valid[:, None], batch.targets_out, 0)
        loss, tokens = label_smoothed_cross_entropy(
            logits, tgt, smoothing=smoothing)
        return {"loss": loss, "tokens": tokens}

    def with_shardings(params_example, batch_example):
        p_sh = param_shardings(mesh, params_example)
        b_sh = audio_batch_shardings(mesh, batch_example)
        m_sh = {k: NamedSharding(mesh, P()) for k in ("loss", "tokens")}
        return jax.jit(step, in_shardings=(p_sh, b_sh), out_shardings=m_sh)

    return with_shardings


def make_sharded_audio_train_step(cfg, mesh: Mesh, *, donate: bool = True):
    """Sharded fused (on-device fbank -> SpecAugment -> model -> update)
    step over raw AudioBatch — the full production path under the mesh."""
    import jax.numpy as jnp

    from ..data.pipeline import make_preprocess_fn
    from ..ops.losses import label_smoothed_cross_entropy, token_accuracy
    from ..ops.schedules import noam_schedule
    from ..train import (build_model, cast_params, compute_cast_dtype,
                         make_tx, rekey_dropout)

    tx = make_tx(cfg)
    model = build_model(cfg, mesh=mesh)
    preprocess = make_preprocess_fn(cfg.features, cfg.spec_augment)
    smoothing = cfg.train.label_smoothing
    cast_dt = compute_cast_dtype(cfg)
    rng_impl = cfg.train.dropout_rng_impl
    lr_schedule = noam_schedule(cfg.model.d_model, cfg.train.warmup_steps,
                                cfg.train.peak_lr_scale)
    shift_s = cfg.features.frame_shift_ms / 1000.0

    def step(state: TrainState, abatch, rng: jax.Array):
        aug_key, dropout_rng = jax.random.split(
            jax.random.fold_in(rng, state.step))
        dropout_rng = rekey_dropout(dropout_rng, rng_impl)
        batch = preprocess(abatch, aug_key)

        def loss_fn(params):
            logits = model.apply(
                cast_params(params, cast_dt), batch.feats, batch.frame_lens,
                batch.targets_in, batch.target_lens,
                deterministic=False, rngs={"dropout": dropout_rng})
            loss, tokens = label_smoothed_cross_entropy(
                logits, batch.targets_out, smoothing=smoothing)
            return loss, (tokens, token_accuracy(logits, batch.targets_out))

        (loss, (tokens, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {"loss": loss, "grad_norm": grad_norm, "tokens": tokens,
                   "accuracy": acc, "lr": lr_schedule(state.step + 1),
                   "audio_seconds":
                       jnp.sum(batch.frame_lens).astype(jnp.float32) * shift_s}
        return new_state, metrics

    def with_shardings(state_example: TrainState, batch_example):
        _check_optax_state(state_example, "make_sharded_audio_train_step")
        s_sh = state_shardings(mesh, state_example)
        b_sh = audio_batch_shardings(mesh, batch_example)
        m_sh = {k: NamedSharding(mesh, P()) for k in
                ("loss", "grad_norm", "tokens", "accuracy", "lr",
                 "audio_seconds")}
        return jax.jit(
            step,
            in_shardings=(s_sh, b_sh, NamedSharding(mesh, P())),
            out_shardings=(s_sh, m_sh),
            donate_argnums=(0,) if donate else (),
        )

    return with_shardings
