"""Fused single-pass Adam + global-norm clip (Pallas).

The reference wraps ``torch.optim.Adam`` in a Noam-schedule
``TransformerOptimizer`` (SURVEY.md §2.1 "Noam optimizer"); the semantics
here are exactly ``optax.chain(clip_by_global_norm, adam(noam))`` — the
equivalence is pinned step-for-step by ``tests/test_ops.py``.

Why a kernel: the optax chain lowers to an elementwise pass *per
transform* over every f32 leaf (clip-scale, mu, nu, bias-corrections,
param update). XLA horizontally fuses them but still moved ~1.5 GB/step at
base config — 1.9 ms of a 16.8 ms train step (XProf; an SGD-only step is
1.8 ms faster). This kernel does the whole update in ONE read of
(g, mu, nu, p) and one write of (mu, nu, p), with input/output aliasing so
nothing is copied: the HBM floor for Adam.

State is a compact ``FusedAdamState(count, mu, nu)`` (vs optax's nested
chain tuples); mu/nu mirror the param tree, so the sharding rules that
mirror params onto the optimizer state apply unchanged. The global-norm
pass stays in jnp (one reduce over the grads, shared with the grad-norm
metric). The TP-sharded train step keeps the optax chain — GSPMD cannot
partition a custom call, and the optimizer is a smaller fraction of the
sharded step anyway.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 131072          # f32 elements per grid step (512 KB x 7 refs ~ 3.5 MB VMEM)


class FusedAdamState(NamedTuple):
    count: jnp.ndarray   # [] int32, completed steps
    mu: Any              # param-tree of first moments (train.moment_dtype)
    nu: Any              # param-tree of second moments
    master: Any = None   # f32 master params (train.master_weights) or None


def _adam_kernel(sc_ref, g_ref, p_ref, mu_ref, nu_ref,
                 p_out, mu_out, nu_out, *, b1: float, b2: float, eps: float,
                 weight_decay: float):
    """One block: g*clip_scale -> mu/nu update -> bias-corr -> param step.

    sc_ref (SMEM) holds [clip_scale, lr, 1/(1-b1^t), 1/(1-b2^t)].
    mu/nu refs may be bfloat16 (train.moment_dtype): compute in f32,
    round on store — halves the optimizer's HBM traffic.
    """
    g = g_ref[...] * sc_ref[0]
    mu = b1 * mu_ref[...].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[...].astype(jnp.float32) + (1.0 - b2) * (g * g)
    mu_hat = mu * sc_ref[2]
    nu_hat = nu * sc_ref[3]
    upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
    if weight_decay:
        upd = upd + weight_decay * p_ref[...]
    p_out[...] = p_ref[...] - sc_ref[1] * upd
    mu_out[...] = mu.astype(mu_out.dtype)
    nu_out[...] = nu.astype(nu_out.dtype)


def _update_leaf(g, p, mu, nu, *, scalars, b1, b2, eps, weight_decay,
                 interpret):
    shape, dtype = p.shape, p.dtype
    n = p.size
    flat = lambda x: x.reshape(n)
    block = min(_BLOCK, n)
    grid = (-(-n // block),)
    kernel = functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps,
                               weight_decay=weight_decay)
    spec = pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM)
    p2, mu2, nu2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct((n,), jnp.float32),
                   jax.ShapeDtypeStruct((n,), mu.dtype),
                   jax.ShapeDtypeStruct((n,), nu.dtype)),
        input_output_aliases={2: 0, 3: 1, 4: 2},   # p, mu, nu in-place
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(scalars, flat(g), flat(p), flat(mu), flat(nu))
    return p2.reshape(shape).astype(dtype), mu2.reshape(shape), nu2.reshape(shape)


def global_norm_f32(tree) -> jnp.ndarray:
    """optax.global_norm with f32 accumulation — exact-enough clip scales
    even when gradients arrive in bf16 (the master_weights path keeps
    cotangents in the compute dtype; squaring/summing them in bf16 would
    make the clip threshold noisy)."""
    return jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree.leaves(tree)))


class FusedAdam:
    """Drop-in (init / update_apply) fused optimizer.

    ``update_apply(grads, state, params, grad_norm=None)`` returns
    ``(new_params, new_state)`` directly — the separate optax
    ``update`` + ``apply_updates`` round trip would re-materialize the
    update tree. Pass ``grad_norm`` (e.g. the metrics value) to share the
    global-norm reduction; it must equal ``optax.global_norm(grads)``.
    """

    def __init__(self, schedule, *, b1=0.9, b2=0.98, eps=1e-9,
                 grad_clip_norm=5.0, weight_decay=0.0, impl: str = "xla",
                 moment_dtype: str = "float32",
                 master_weights: bool = False):
        self.schedule = schedule
        self.b1, self.b2, self.eps = float(b1), float(b2), float(eps)
        self.grad_clip_norm = float(grad_clip_norm or 0.0)
        self.weight_decay = float(weight_decay or 0.0)
        if impl not in ("xla", "pallas"):
            raise ValueError(f"impl must be 'xla' or 'pallas', got {impl!r}")
        if master_weights and impl == "pallas":
            raise ValueError("master_weights supports impl='xla' (the "
                             "pallas per-leaf kernel measured slower anyway"
                             " — BENCHMARKS.md)")
        self.impl = impl
        # bf16 moments (train.moment_dtype): mu/nu stored half-width,
        # computed in f32 per step — halves the optimizer's HBM floor.
        self.moment_dtype = jnp.dtype(moment_dtype)
        # master_weights (train.master_weights): TrainState.params live in
        # the compute dtype; the f32 master lives HERE and the update math
        # runs against it — no per-step full-tree cast.
        self.master_weights = bool(master_weights)

    def init(self, params) -> FusedAdamState:
        """``params``: the freshly initialized f32 tree. With
        master_weights it becomes the f32 master (TrainState.params should
        then be its compute-dtype cast — create_train_state does this)."""
        zeros = lambda: jax.tree.map(
            lambda p: jnp.zeros_like(p, self.moment_dtype), params)
        master = None
        if self.master_weights:
            master = jax.tree.map(
                lambda p: jnp.asarray(p, jnp.float32), params)
        return FusedAdamState(count=jnp.zeros((), jnp.int32),
                              mu=zeros(), nu=zeros(), master=master)

    def update_apply(self, grads, state: FusedAdamState, params,
                     grad_norm: jnp.ndarray | None = None
                     ) -> Tuple[Any, FusedAdamState]:
        if grad_norm is None:
            grad_norm = global_norm_f32(grads)
        if self.grad_clip_norm > 0:
            # optax.clip_by_global_norm: scale = clip / max(norm, clip)
            clip = jnp.float32(self.grad_clip_norm)
            scale = clip / jnp.maximum(grad_norm.astype(jnp.float32), clip)
        else:
            scale = jnp.float32(1.0)
        # optax.adam: bias corrections at count+1; the lr schedule sees the
        # pre-increment count (scale_by_schedule semantics).
        count_inc = state.count + 1
        t = count_inc.astype(jnp.float32)
        c1 = 1.0 / (1.0 - jnp.float32(self.b1) ** t)
        c2 = 1.0 / (1.0 - jnp.float32(self.b2) ** t)
        lr = self.schedule(state.count).astype(jnp.float32)
        if self.impl == "pallas":
            scalars = jnp.stack([scale, lr, c1, c2])
            # TPU-only kernel: interpret everywhere else (CPU tests, GPU).
            interpret = jax.default_backend() != "tpu"
            upd = functools.partial(_update_leaf, scalars=scalars,
                                    b1=self.b1, b2=self.b2, eps=self.eps,
                                    weight_decay=self.weight_decay,
                                    interpret=interpret)
        else:
            def upd(g, p, mu, nu):
                g = g * scale
                mu2 = self.b1 * mu.astype(jnp.float32) + (1.0 - self.b1) * g
                nu2 = self.b2 * nu.astype(jnp.float32) \
                    + (1.0 - self.b2) * (g * g)
                u = (mu2 * c1) / (jnp.sqrt(nu2 * c2) + self.eps)
                if self.weight_decay:
                    u = u + self.weight_decay * p
                return (p - lr * u, mu2.astype(self.moment_dtype),
                        nu2.astype(self.moment_dtype))
        flat_g, treedef = jax.tree.flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        if self.master_weights:
            # Compute against the f32 master; emit compute-dtype params +
            # the updated master. Grads may arrive in the compute dtype
            # (no boundary cast) — upcast per element inside the fused
            # expression.
            flat_m = treedef.flatten_up_to(state.master)

            def updm(g, p, m, mu, nu):
                g32 = g.astype(jnp.float32) * scale
                mu2 = self.b1 * mu.astype(jnp.float32) + (1.0 - self.b1) * g32
                nu2 = self.b2 * nu.astype(jnp.float32) \
                    + (1.0 - self.b2) * (g32 * g32)
                u = (mu2 * c1) / (jnp.sqrt(nu2 * c2) + self.eps)
                if self.weight_decay:
                    u = u + self.weight_decay * m
                m2 = m - lr * u
                return (m2.astype(p.dtype), m2,
                        mu2.astype(self.moment_dtype),
                        nu2.astype(self.moment_dtype))

            out = [updm(g, p, m, mu, nu) for g, p, m, mu, nu
                   in zip(flat_g, flat_p, flat_m, flat_mu, flat_nu)]
            return (jax.tree.unflatten(treedef, [o[0] for o in out]),
                    FusedAdamState(
                        count=count_inc,
                        mu=jax.tree.unflatten(treedef, [o[2] for o in out]),
                        nu=jax.tree.unflatten(treedef, [o[3] for o in out]),
                        master=jax.tree.unflatten(treedef,
                                                  [o[1] for o in out])))
        out = [upd(g, p, mu, nu)
               for g, p, mu, nu in zip(flat_g, flat_p, flat_mu, flat_nu)]
        new_params = jax.tree.unflatten(treedef, [o[0] for o in out])
        new_mu = jax.tree.unflatten(treedef, [o[1] for o in out])
        new_nu = jax.tree.unflatten(treedef, [o[2] for o in out])
        return new_params, FusedAdamState(count=count_inc, mu=new_mu,
                                          nu=new_nu)
