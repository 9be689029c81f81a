"""Train state: params + AdamW optimizer + importance-sampler state + RNG.

The reference keeps the ring buffer and RNG implicit (module attributes /
global torch RNG). Here everything that evolves across steps is one explicit
pytree, which makes the step function pure, jittable, shardable, and the whole
state checkpointable/resumable (which the reference cannot do — it pickles the
module only, ref main.py:373-375, and has no loading code)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gdmcf_tpu.diffusion.engine import LtState


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any
    opt_state: Any
    lt: LtState
    key: jax.Array


def _trainable_mask(params):
    """False for params whose key starts with 'frozen_' — deterministic
    constants (e.g. the lightGCN backbone's propagated link tables) that must
    receive neither updates nor weight decay."""

    def mask(path, leaf):
        for p in path:
            key = getattr(p, "key", None)
            if isinstance(key, str) and key.startswith("frozen_"):
                return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def with_f32_master(inner: optax.GradientTransformation
                    ) -> optax.GradientTransformation:
    """bf16 parameter storage with float32 master weights.

    Params live (and are read by the model) in bfloat16 — halving HBM reads
    of the embedding tables and tower weights — while the optimizer
    accumulates into a float32 master copy kept in the optimizer state, so
    small updates (lr ~1e-5 on ~1e-2 weights) are never lost to bf16
    rounding. The emitted update is ``new_master - old_params`` in f32; the
    Trainer applies it in f32 and casts back to the storage dtype.
    """

    def init(params):
        master = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32), params)
        return (inner.init(master), master)

    def update(grads, state, params=None):
        inner_state, master = state
        g32 = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads)
        upd, inner_state = inner.update(g32, inner_state, master)
        new_master = optax.apply_updates(master, upd)
        out = jax.tree_util.tree_map(
            lambda nm, p: nm - p.astype(jnp.float32), new_master, params)
        return out, (inner_state, new_master)

    return optax.GradientTransformation(init, update)


def make_optimizer(lr: float, weight_decay: float,
                   param_dtype: str = "float32") -> optax.GradientTransformation:
    """AdamW with torch defaults (ref main.py:258 uses optim.AdamW defaults:
    betas=(0.9, 0.999), eps=1e-8); 'frozen_*' params are masked out.
    param_dtype='bfloat16' wraps it with f32 master weights."""
    tx = optax.masked(
        optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
        _trainable_mask)
    if param_dtype == "bfloat16":
        tx = with_f32_master(tx)
    return tx


def create_train_state(cfg, model_init, seed: int = None) -> TrainState:
    seed = cfg.random_seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    params = model_init(k_init)
    if cfg.param_dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), params)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.param_dtype)
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
        lt=LtState.create(cfg.steps, cfg.history_num_per_term),
        key=k_run,
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
