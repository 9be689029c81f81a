"""Selective bf16 operand storage (Config.bf16_weights, VERDICT r4 weak 1):
only the named weights are stored bfloat16; f32 masters ride the optimizer
state so tiny (lr~1e-5) updates are never lost to bf16 rounding. Covered on
both optimizer paths (inline single-pass AdamW and the optax chain) plus
checkpoint round-trip of the new master slot.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdmcf_tpu.config import Config
from gdmcf_tpu.train.state import path_str
from gdmcf_tpu.train.trainer import Trainer

SEL = ("in_layers/", "embedding_item")


def _cfg(**kw):
    base = dict(backbone="DNNOneHotEmbeddingGCN", dims=[32], emb_size=10,
                steps=5, batch_size=16, sampling_steps=0, lr=1e-3,
                bf16_weights=SEL)
    base.update(kw)
    return Config(**base)


def _dtypes(params):
    out = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        out[path_str(p)] = leaf.dtype
    return out


def _batch(n_item, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray((rng.random((batch, n_item)) < 0.2).astype(np.float32))
    idx = jnp.arange(batch, dtype=jnp.int32)
    return x, idx


@pytest.mark.parametrize("opt_impl", ["inline", "optax"])
def test_selected_leaves_bf16_with_f32_masters(opt_impl):
    tr = Trainer(_cfg(opt_impl=opt_impl), 64, 48)
    st = tr.init_state()
    dts = _dtypes(st.params)
    sel = {k for k in dts if any(s in k for s in SEL)}
    assert sel, dts
    for k, dt in dts.items():
        assert dt == (jnp.bfloat16 if k in sel else jnp.float32), (k, dt)
    # masters: exactly the selected leaves, all f32
    if opt_impl == "inline":
        masters = st.opt_state.master
    else:
        masters = st.opt_state[1]
    assert set(masters) == sel, (set(masters), sel)
    assert all(m.dtype == jnp.float32 for m in masters.values())


@pytest.mark.parametrize("opt_impl", ["inline", "optax"])
def test_master_preserves_tiny_updates(opt_impl):
    """At lr=1e-5 a ~1e-2-magnitude bf16 weight cannot represent single
    updates; without the master the weight would freeze. The master must
    accumulate and the stored bf16 param must track its cast."""
    tr = Trainer(_cfg(opt_impl=opt_impl, lr=1e-5), 64, 48)
    st = tr.init_state()
    x, idx = _batch(48)
    masters0 = {k: np.asarray(v)  # host copies: st is donated into the step
                for k, v in (st.opt_state.master if opt_impl == "inline"
                             else st.opt_state[1]).items()}
    for _ in range(10):
        st, loss = tr._train_step(st, x, idx)
    assert np.isfinite(float(loss))
    masters = (st.opt_state.master if opt_impl == "inline"
               else st.opt_state[1])
    moved = {k: float(jnp.max(jnp.abs(m - masters0[k])))
             for k, m in masters.items()}
    assert all(v > 0 for v in moved.values()), moved
    for p, leaf in jax.tree_util.tree_flatten_with_path(st.params)[0]:
        k = path_str(p)
        if k in masters:
            np.testing.assert_array_equal(
                np.asarray(leaf),
                np.asarray(masters[k].astype(jnp.bfloat16)))


def test_inline_matches_optax_chain():
    """The two optimizer paths implement the same selective-master math."""
    a = Trainer(_cfg(opt_impl="inline"), 64, 48)
    b = Trainer(_cfg(opt_impl="optax"), 64, 48)
    sa, sb = a.init_state(), b.init_state()
    x, idx = _batch(48)
    for _ in range(3):
        sa, la = a._train_step(sa, x, idx)
        sb, lb = b._train_step(sb, x, idx)
    for (pa, la_), (pb, lb_) in zip(
            jax.tree_util.tree_flatten_with_path(sa.params)[0],
            jax.tree_util.tree_flatten_with_path(sb.params)[0]):
        np.testing.assert_allclose(
            np.asarray(la_, np.float32), np.asarray(lb_, np.float32),
            rtol=0, atol=2e-6, err_msg=path_str(pa))


def test_loss_decreases_and_tracks_f32():
    """Short-horizon convergence: the bf16-operand run's loss trajectory
    stays close to the all-f32 run (bf16 weight rounding is ~3 decimal
    digits; dynamics must not visibly fork at this horizon)."""
    losses = {}
    for name, cfg in (("bf16", _cfg()),
                      ("f32", _cfg(bf16_weights=()))):
        tr = Trainer(cfg, 64, 48)
        st = tr.init_state()
        x, idx = _batch(48)
        traj = []
        for _ in range(30):
            st, loss = tr._train_step(st, x, idx)
            traj.append(float(loss))
        losses[name] = traj
    assert losses["bf16"][-1] < losses["bf16"][0]
    np.testing.assert_allclose(losses["bf16"], losses["f32"], rtol=0.02)


def test_checkpoint_roundtrip_with_masters(tmp_path):
    from gdmcf_tpu.train.checkpoint import Checkpointer

    tr = Trainer(_cfg(opt_impl="inline"), 64, 48)
    st = tr.init_state()
    x, idx = _batch(48)
    st, _ = tr._train_step(st, x, idx)
    ck = Checkpointer(str(tmp_path))
    ck.save(st)
    restored = ck.restore(tr.init_state())
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume trains on: one more step on the restored state
    st2, loss = tr._train_step(restored, x, idx)
    assert np.isfinite(float(loss))


def test_bf16_weights_rejects_bf16_param_dtype():
    with pytest.raises(ValueError):
        _cfg(param_dtype="bfloat16")


def test_bare_string_normalizes_to_one_pattern():
    """A bare string must not be iterated per-character (which would match
    essentially every param path and silently bf16 the whole tree)."""
    cfg = _cfg(bf16_weights="embedding_item")
    assert cfg.bf16_weights == ("embedding_item",)
    tr = Trainer(cfg, 64, 48)
    dts = _dtypes(tr.init_state().params)
    assert dts["embedding_item"] == jnp.bfloat16
    assert all(dt == jnp.float32 for k, dt in dts.items()
               if k != "embedding_item"), dts
    with pytest.raises(ValueError):
        _cfg(bf16_weights=(1,))


def test_frozen_leaves_never_selected():
    """'frozen_*' constants (e.g. the lightGCN propagated link tables) must
    keep full precision and never get masters, even under a broad pattern —
    on BOTH optimizer paths (their opt_state structures must also agree)."""
    from gdmcf_tpu.train.state import bf16_weight_mask

    import scipy.sparse as sp
    tr_csr = sp.csr_matrix(
        (np.random.default_rng(0).random((64, 48)) < 0.2
         ).astype(np.float32))
    for opt_impl in ("inline", "optax"):
        cfg = _cfg(backbone="lightGCN", bf16_weights=("item",),
                   opt_impl=opt_impl)
        tr = Trainer(cfg, 64, 48, train_csr=tr_csr)
        st = tr.init_state()
        mask = bf16_weight_mask(st.params, cfg.bf16_weights)
        flat = {path_str(p): (leaf, m) for (p, leaf), (_, m) in zip(
            jax.tree_util.tree_flatten_with_path(st.params)[0],
            jax.tree_util.tree_flatten_with_path(mask)[0])}
        frozen = {k for k in flat if "frozen_" in k}
        assert frozen, "DNNlightGCN should carry frozen_ constants"
        for k in frozen:
            leaf, m = flat[k]
            assert not m and leaf.dtype != jnp.bfloat16, (k, leaf.dtype)
        masters = (st.opt_state.master if opt_impl == "inline"
                   else st.opt_state[1])
        assert not (set(masters) & frozen), masters.keys()
        # selection identical across paths: masters exist exactly for the
        # bf16-stored trainable leaves
        sel = {k for k, (leaf, m) in flat.items() if m}
        assert set(masters) == sel, (set(masters), sel)
