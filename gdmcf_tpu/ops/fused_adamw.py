"""Fused AdamW step: one Pallas pass over HBM per parameter tensor.

Motivation (measured, benchmarks/profile_train3.py): swapping AdamW for
plain SGD saves 0.37 ms of the 1.83 ms fused train step — far above the
~0.1 ms bandwidth floor of the extra moment traffic, i.e. XLA schedules the
optax chain (adam scale -> weight decay -> lr scale -> apply_updates) as
several passes over each model-sized tensor plus per-leaf kernel launches.
This kernel performs the whole update — moment EMAs, bias correction,
weight decay, learning rate, and the parameter write — in ONE pass: read
(p f32, g f32, mu, nu) / write (p f32, mu, nu), with p/mu/nu aliased
input->output so nothing is reallocated.

MEASURED OUTCOME (TPU v5e, bench geometry, k=100 fusion): three
implementations of the same math rank

    inline jnp single pass   1.75 ms/step   (``opt_impl="auto"`` default)
    optax chain              1.88 ms/step   (``opt_impl="optax"``)
    Pallas kernel            2.21 ms/step   (``opt_impl="fused"``, opt-in)

The *inline* path (``impl="inline"``: one multi-output jnp expression per
leaf, this module, no pallas) wins: XLA emits a single multi-output fusion
per leaf AND can still overlap it with the backward matmuls of the same
scan iteration. The optax chain pays extra HLO/buffer plumbing across its
three chained transforms; the Pallas kernel, at every block size tried
(512 KB–2 MB blocks, parallel dimension semantics), loses MORE — each
opaque ``pallas_call`` is a scheduling barrier, and the per-leaf launch +
lost overlap exceed the ~0.3 ms of multi-pass traffic it saves. Lesson: on
the elementwise tail, beat XLA by giving it a cleaner expression, not by
hiding the loop in an opaque kernel. The kernel is kept opt-in as the
substrate for a future offloaded/sharded optimizer.

Math is the exact optax ordering used by train/state.py:make_optimizer
(scale_by_adam_lowp -> add_decayed_weights -> scale_by_learning_rate),
which itself mirrors the reference's torch AdamW defaults (ref
main.py:258): oracle equality vs the optax path is tested in
tests/test_fused_adamw.py. Moments may be stored bfloat16 (the default,
see Config.opt_moment_dtype) or float32; update arithmetic is always f32.

Sharding caveat: a pallas_call is opaque to GSPMD, so this path is only
selected for single-device runs (Trainer gates on mesh size); multi-chip
meshes keep the optax path whose elementwise ops partition trivially.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Below this many elements the launch overhead outweighs the fused pass;
# such leaves (biases, the sumW scalar) take the inline jnp formula, which
# XLA fuses into a couple of trivially small kernels.
_MIN_KERNEL_ELEMS = 1 << 16

# Per-input VMEM block budget (bytes). Keep modest: with 4 streamed inputs
# (p, g f32; mu, nu possibly bf16), double-buffering, and aliased outputs the
# scoped-vmem total is ~6x this; the TPU scoped-vmem stack limit is 16 MB.
_BLOCK_BYTES = 1 << 19


class FusedAdamWState(NamedTuple):
    """Optimizer state for the fused path.

    ``mu``/``nu`` mirror the param tree; frozen (non-trainable) leaves hold
    empty ``shape=(0,)`` placeholders so the pytree structure stays stable
    for checkpointing without spending memory on dead moments.

    ``master``: flat ``{path: f32 array}`` dict of master weights for
    bfloat16-STORED param leaves (Config.bf16_weights selective operand
    storage) — empty when all params are f32. The update math runs on the
    master; the param write is its bf16 cast, so lr~1e-5 updates on ~1e-2
    weights are never lost to bf16 rounding while forward/backward reads
    of the selected weights ride half-width HBM streams.
    """
    count: jnp.ndarray   # scalar int32, number of completed steps
    mu: Any
    nu: Any
    master: Any = None  # None (not {}): a shared mutable default is a trap


def _adamw_kernel(c_ref, p_ref, g_ref, mu_ref, nu_ref,
                  p_out, mu_out, nu_out, *, b1, b2, eps, lr, wd):
    c1 = c_ref[0]
    c2 = c_ref[1]
    g = g_ref[...].astype(jnp.float32)
    mu = b1 * mu_ref[...].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[...].astype(jnp.float32) + (1.0 - b2) * g * g
    upd = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
    p = p_ref[...]
    p_out[...] = p - lr * (upd + wd * p)
    mu_out[...] = mu.astype(mu_out.dtype)
    nu_out[...] = nu.astype(nu_out.dtype)


def _adamw_leaf_kernel(p, g, mu, nu, c, *, b1, b2, eps, lr, wd,
                       interpret=False):
    """One-pass fused update for a single 2-D leaf."""
    rows, cols = p.shape
    # 2-D blocking: col blocks cap at 2048 lanes so arbitrarily wide leaves
    # (a [dims, n_item] tower head at n_item=1M is 4 GB) stream in bounded
    # VMEM; row blocks fill the per-input budget, multiple of 16 for the
    # bf16 sublane tiling.
    bc = min(2048, pl.cdiv(cols, 128) * 128)
    br = max(16, min(512, _BLOCK_BYTES // (4 * bc)) // 16 * 16)
    grid = (pl.cdiv(rows, br), pl.cdiv(cols, bc))
    vmem = functools.partial(pl.BlockSpec, (br, bc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    out = pl.pallas_call(
        functools.partial(_adamw_kernel, b1=b1, b2=b2, eps=eps, lr=lr,
                          wd=wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # c = [c1, c2]
            vmem(), vmem(), vmem(), vmem(),
        ],
        out_specs=[vmem(), vmem(), vmem()],
        out_shape=[
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(mu.shape, mu.dtype),
            jax.ShapeDtypeStruct(nu.shape, nu.dtype),
        ],
        input_output_aliases={1: 0, 3: 1, 4: 2},
        compiler_params=compiler_params,
        interpret=interpret,
    )(c, p, g, mu, nu)
    return out


def _adamw_leaf_inline(p, g, mu, nu, c1, c2, *, b1, b2, eps, lr, wd):
    """Same math, plain jnp — for small / non-2-D leaves."""
    g32 = g.astype(jnp.float32)
    mu32 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
    nu32 = b2 * nu.astype(jnp.float32) + (1.0 - b2) * g32 * g32
    upd = (mu32 / c1) / (jnp.sqrt(nu32 / c2) + eps)
    p32 = p.astype(jnp.float32)
    new_p = (p32 - lr * (upd + wd * p32)).astype(p.dtype)
    return new_p, mu32.astype(mu.dtype), nu32.astype(nu.dtype)


def fused_adamw_init(params, trainable_mask, moment_dtype=jnp.bfloat16
                     ) -> FusedAdamWState:
    """Zero moments for trainable leaves; (0,)-placeholders for frozen.
    Trainable bfloat16-stored leaves additionally get an f32 master."""
    from gdmcf_tpu.train.state import path_str  # lazy: avoids import cycle

    def z(p, t):
        if not t:
            return jnp.zeros((0,), dtype=moment_dtype)
        return jnp.zeros_like(p, dtype=moment_dtype)

    master = {}
    def collect(path, p, t):
        if t and p.dtype == jnp.bfloat16:
            master[path_str(path)] = p.astype(jnp.float32)
        return p
    jax.tree_util.tree_map_with_path(collect, params, trainable_mask)

    return FusedAdamWState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree_util.tree_map(z, params, trainable_mask),
        nu=jax.tree_util.tree_map(z, params, trainable_mask),
        master=master)


def fused_adamw_apply(params, grads, state: FusedAdamWState,
                      trainable_mask, *, lr: float, weight_decay: float = 0.0,
                      b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                      impl: str = "inline", interpret: bool = False):
    """Apply one AdamW step in place; returns (new_params, new_state).

    ``impl="inline"`` (default, measured fastest — module header) keeps every
    leaf as one jnp expression; ``impl="kernel"`` routes large 2-D leaves
    through the Pallas single-pass kernel.
    """
    count = state.count + 1
    cf = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** cf
    c2 = 1.0 - b2 ** cf
    c = jnp.stack([c1, c2])

    kw = dict(b1=b1, b2=b2, eps=eps, lr=lr, wd=weight_decay)
    from gdmcf_tpu.train.state import path_str  # lazy: avoids import cycle
    masters = state.master or {}
    new_master = {}

    def leaf(path, p, g, mu, nu, t):
        if not t:
            return p, mu, nu
        s = path_str(path)
        if s in masters:
            # selective bf16 storage: math on the f32 master, bf16 write
            m32, mu32, nu32 = _adamw_leaf_inline(masters[s], g, mu, nu,
                                                 c1, c2, **kw)
            new_master[s] = m32
            return m32.astype(p.dtype), mu32, nu32
        if impl == "kernel" and p.ndim == 2 and p.size >= _MIN_KERNEL_ELEMS:
            return _adamw_leaf_kernel(p, g, mu, nu, c, interpret=interpret,
                                      **kw)
        return _adamw_leaf_inline(p, g, mu, nu, c1, c2, **kw)

    out = jax.tree_util.tree_map_with_path(
        lambda path, *a: tuple(leaf(path, *a)), params, grads, state.mu,
        state.nu, trainable_mask)
    # out mirrors params' structure with (p, mu, nu) tuples at the leaves;
    # transpose to three params-structured trees
    new_params, new_mu, new_nu = jax.tree_util.tree_transpose(
        jax.tree_util.tree_structure(params),
        jax.tree_util.tree_structure((0, 0, 0)), out)
    return new_params, FusedAdamWState(count=count, mu=new_mu, nu=new_nu,
                                       master=new_master)
