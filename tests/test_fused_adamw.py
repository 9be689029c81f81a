"""Fused single-pass AdamW (ops/fused_adamw.py) vs the optax chain.

The kernel claims exact optax math (scale_by_adam_lowp -> add_decayed_weights
-> scale_by_learning_rate, the ordering of train/state.py:make_optimizer,
mirroring the reference's torch AdamW defaults at ref main.py:258). These
tests pin that equality leaf-by-leaf over multiple steps, for both moment
dtypes, across the kernel/inline dispatch boundary, with frozen-leaf masking,
and at the Trainer level (opt_impl fused vs optax on identical data).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdmcf_tpu.config import Config
from gdmcf_tpu.ops.fused_adamw import (
    _MIN_KERNEL_ELEMS,
    FusedAdamWState,
    fused_adamw_apply,
    fused_adamw_init,
)
from gdmcf_tpu.train.state import _trainable_mask, make_optimizer

LR, WD = 1e-3, 0.01


def _tree(key):
    """Params with a kernel-path leaf (>= _MIN_KERNEL_ELEMS, 2-D), an
    inline 2-D leaf, a bias, and a frozen leaf."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    big = (256, 300)
    assert big[0] * big[1] >= _MIN_KERNEL_ELEMS
    return {
        "w_big": jax.random.normal(k1, big, jnp.float32),
        "w_small": jax.random.normal(k2, (10, 12), jnp.float32),
        "b": jax.random.normal(k3, (300,), jnp.float32),
        "frozen_table": jax.random.normal(k4, (7, 5), jnp.float32),
    }


def _run_optax(params, grads_seq, moment_dtype):
    tx = make_optimizer(LR, WD, "float32", moment_dtype)
    opt = tx.init(params)
    for g in grads_seq:
        upd, opt = tx.update(g, opt, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    return params


def _run_fused(params, grads_seq, moment_dtype, impl="kernel"):
    mask = _trainable_mask(params)
    st = fused_adamw_init(params, mask, moment_dtype=jnp.dtype(moment_dtype))
    for g in grads_seq:
        params, st = fused_adamw_apply(
            params, g, st, mask, lr=LR, weight_decay=WD, impl=impl,
            interpret=True)
    return params, st


@pytest.mark.parametrize("impl", ["kernel", "inline"])
@pytest.mark.parametrize("moment_dtype", ["float32", "bfloat16"])
def test_fused_matches_optax(key, moment_dtype, impl):
    params = _tree(key)
    gk = jax.random.split(jax.random.PRNGKey(7), 5)
    mask = _trainable_mask(params)
    # frozen leaves carry exact-zero grads in production (stop_gradient,
    # models/backbones.py:588) — mirror that, since optax.masked passes raw
    # grads through for masked-out leaves while the fused path skips them
    grads_seq = [
        jax.tree_util.tree_map(
            lambda p, t: (jax.random.normal(
                jax.random.fold_in(k, p.size), p.shape, p.dtype) * 0.1
                if t else jnp.zeros_like(p)),
            params, mask)
        for k in gk
    ]
    ref = _run_optax(params, grads_seq, moment_dtype)
    got, _ = _run_fused(params, grads_seq, moment_dtype, impl=impl)
    # f32 moments: identical op order -> tight. bf16 moments: the kernel's
    # bf16 round/reload can differ from XLA's by the last bf16 bit on a
    # handful of elements, amplified ~lr through the next step's update.
    rtol, atol = ((2e-6, 1e-7) if moment_dtype == "float32"
                  else (5e-5, 1e-5))
    for name in params:
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(ref[name]),
            rtol=rtol, atol=atol, err_msg=f"{name} ({moment_dtype})")


def test_frozen_leaves_untouched(key):
    params = _tree(key)
    grads = [jax.tree_util.tree_map(jnp.ones_like, params)]
    got, st = _run_fused(params, grads, "float32")
    np.testing.assert_array_equal(np.asarray(got["frozen_table"]),
                                  np.asarray(params["frozen_table"]))
    # frozen moments stay (0,)-placeholders — no dead-moment memory
    assert st.mu["frozen_table"].shape == (0,)
    assert int(st.count) == 1


def test_moment_dtype_respected(key):
    params = _tree(key)
    mask = _trainable_mask(params)
    st = fused_adamw_init(params, mask, moment_dtype=jnp.bfloat16)
    assert st.mu["w_big"].dtype == jnp.bfloat16
    p2, st2 = fused_adamw_apply(params, params, st, mask, lr=LR,
                                interpret=True)
    assert st2.nu["w_big"].dtype == jnp.bfloat16
    assert p2["w_big"].dtype == jnp.float32


# ---------------------------------------------------------------------------
# config gating + trainer-level equivalence
# ---------------------------------------------------------------------------

def test_config_opt_impl_resolution():
    for impl in ("fused", "inline"):
        with pytest.raises(ValueError):
            Config(opt_impl=impl, mesh_dp=2)
        with pytest.raises(ValueError):
            Config(opt_impl=impl, param_dtype="bfloat16")
    # measured ranking (fused_adamw.py header): auto = inline when eligible
    assert Config(opt_impl="auto").resolved_opt_impl == "inline"
    assert Config(opt_impl="auto", mesh_dp=2).resolved_opt_impl == "optax"
    assert Config(opt_impl="auto",
                  param_dtype="bfloat16").resolved_opt_impl == "optax"
    assert Config(opt_impl="fused").resolved_opt_impl == "kernel"
    assert Config(opt_impl="inline").resolved_opt_impl == "inline"
    assert Config(opt_impl="optax").resolved_opt_impl == "optax"
    assert Config(opt_impl="auto").use_fused_opt
    assert not Config(opt_impl="optax").use_fused_opt


@pytest.mark.parametrize("impl", ["fused", "inline"])
def test_trainer_fused_equals_optax(impl):
    from gdmcf_tpu.train.trainer import Trainer

    def run(opt_impl):
        cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[12], emb_size=10,
                     steps=5, noise_scale=0.01, batch_size=8,
                     sampling_steps=0, opt_impl=opt_impl,
                     opt_moment_dtype="float32")
        t = Trainer(cfg, 24, 20)
        state = t.init_state()
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.integers(0, 2, (8, 20)).astype(np.float32))
        idx = jnp.asarray(np.arange(8, dtype=np.int32))
        losses = []
        for _ in range(3):
            state, loss = t._train_step(state, x, idx)
            losses.append(float(loss))
        return losses, state.params

    l_fused, p_fused = run(impl)
    l_optax, p_optax = run("optax")
    np.testing.assert_allclose(l_fused, l_optax, rtol=1e-5)
    leaves_f = jax.tree_util.tree_leaves_with_path(p_fused)
    leaves_o = jax.tree_util.tree_leaves(p_optax)
    assert len(leaves_f) == len(leaves_o)
    for (path, a), b in zip(leaves_f, leaves_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))
