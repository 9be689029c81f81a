"""Distributed-sim tests on the 8-device virtual CPU mesh (SURVEY.md §4 #4).

Verifies: sharded params placement, dp+mp train step numerical equivalence
with the single-device step, and the full multichip dry run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gdmcf_tpu.config import Config
from gdmcf_tpu.diffusion.engine import Diffusion, LtState
from gdmcf_tpu.models.registry import build_model
from gdmcf_tpu.parallel.mesh import make_mesh
from gdmcf_tpu.parallel.sharding import param_specs, shard_params

cpu_devices = jax.devices("cpu")
pytestmark = pytest.mark.skipif(len(cpu_devices) < 8,
                                reason="needs 8 virtual cpu devices")

N_USER, N_ITEM, B = 32, 32, 16


def setup():
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=B)
    model = build_model(cfg, N_USER, N_ITEM)
    diff = Diffusion.create(cfg, index_in=True)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, diff, params


def test_param_specs_target_item_axis():
    cfg, model, diff, params = setup()
    specs = param_specs(params)
    assert specs["embedding_item"] == P("mp", None)
    assert specs["in_layers"][0]["w"] == P("mp", None)
    assert specs["in_layers2"][0]["w"] == P("mp", None)
    assert specs["embedding_user"] == P("mp", None)  # row-sharded EP analog
    assert specs["sumW"] == P()


def test_sharded_forward_matches_single_device():
    cfg, model, diff, params = setup()
    mesh = make_mesh(dp=4, mp=2, devices=cpu_devices)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, N_ITEM)) < 0.3
         ).astype(jnp.float32)
    x_U = jnp.stack([1.0 - x, x], axis=-1)
    t = jnp.zeros((B,), jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)

    ref_out, _ = model.apply(params, x, t, x_U, index=idx, graph=x_U,
                             train=False, rng=None)

    sp = shard_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "mp")))
    out, _ = jax.jit(
        lambda p, x, t, xu, i: model.apply(p, x, t, xu, index=i, graph=xu,
                                           train=False, rng=None)
    )(sp, xs, t, jnp.stack([1.0 - xs, xs], axis=-1), idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-5)


def test_dryrun_multichip():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_mesh_trainer_end_to_end():
    """Trainer with a (4,2) mesh on CPU devices: sharded fit + eval matches
    the single-device trainer's *behavior* (runs, finite, metrics in range)."""
    import numpy as np
    import scipy.sparse as sp
    from gdmcf_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n_user, n_item = 64, 64
    dense = (rng.random((n_user, n_item)) < 0.2).astype(np.float32)
    train = sp.csr_matrix(dense)
    valid = sp.csr_matrix((rng.random((n_user, n_item)) < 0.05).astype(np.float32))
    test = sp.csr_matrix((rng.random((n_user, n_item)) < 0.05).astype(np.float32))

    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=16, epochs=2,
                 eval_every=2, topN=[5, 10], lr=1e-3, debug=True,
                 sampling_steps=0, mesh_dp=4, mesh_mp=2)
    trainer = Trainer(cfg, n_user, n_item)
    assert trainer.mesh is not None
    logs = []
    state, best = trainer.fit(train, valid, test, log=logs.append)
    assert best is not None
    assert all(0.0 <= v <= 1.0 for v in best[1])
    # params actually live SHARDED on the mesh — device_set covers 8 devices
    # for replicated arrays too, so check the spec and the shard shape
    item_table = state.params["embedding_item"]
    assert item_table.sharding.spec[0] == "mp", item_table.sharding
    shard_rows = {s.data.shape[0] for s in item_table.addressable_shards}
    assert shard_rows == {item_table.shape[0] // 2}  # mp=2 row shards


def test_multihost_helpers_single_host():
    from gdmcf_tpu.parallel import multihost
    multihost.initialize()  # no coordinator -> no-op
    assert multihost.is_main_process()
    multihost.sync_hosts(devices=cpu_devices)  # psum barrier over 8 cpu devs
    if len(jax.devices()) >= 8:  # default devices (axon container: 1 TPU)
        mesh = multihost.global_mesh(dp=4, mp=2)
        assert dict(mesh.shape) == {"dp": 4, "mp": 2}
        # process-major order contract (single host: sorted by id)
        flat = list(mesh.devices.flat)
        assert flat == sorted(flat, key=lambda d: (d.process_index, d.id))


@pytest.mark.parametrize("n", [2, 4])
def test_dryrun_smaller_meshes(n):
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", os.path.join(os.path.dirname(__file__), "..",
                                     "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(n)


def test_sharded_user_lookup_matches_replicated():
    """Model built WITH the mesh (shard_map user-table lookup) must be
    numerically identical to the mesh-less replicated-gather model, forward
    AND backward (VERDICT round-1 item 3)."""
    cfg, model_plain, diff, params = setup()
    mesh = make_mesh(dp=4, mp=2, devices=cpu_devices)
    model_mesh = build_model(cfg, N_USER, N_ITEM, mesh=mesh)

    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, N_ITEM)) < 0.3
         ).astype(jnp.float32)
    x_U = jnp.stack([1.0 - x, x], axis=-1)
    t = jnp.zeros((B,), jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)

    ref_out, _ = model_plain.apply(params, x, t, x_U, index=idx, graph=x_U,
                                   train=False, rng=None)
    sp_params = shard_params(params, mesh)
    out, _ = jax.jit(
        lambda p, x, t, xu, i: model_mesh.apply(p, x, t, xu, index=i,
                                                graph=xu, train=False,
                                                rng=None)
    )(sp_params, x, t, x_U, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-5)

    # gradients: the shard_map lookup's backward (masked scatter + psum)
    # must equal the dense gather's backward on the user table
    def loss(model):
        def fn(p):
            o, _ = model.apply(p, x, t, x_U, index=idx, graph=x_U,
                               train=False, rng=None)
            return (o ** 2).sum()
        return fn

    g_plain = jax.grad(loss(model_plain))(params)["embedding_user"]
    g_mesh = jax.jit(jax.grad(loss(model_mesh)))(sp_params)["embedding_user"]
    np.testing.assert_allclose(np.asarray(g_mesh), np.asarray(g_plain),
                               rtol=5e-3, atol=5e-4)


def test_mesh_trainer_step_matches_single_device():
    """One optimizer step on the (4,2)-mesh Trainer == the single-device
    Trainer, same params and batch (dp x mp + sharded-lookup equivalence)."""
    from gdmcf_tpu.train.trainer import Trainer

    kw = dict(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
              steps=5, noise_scale=0.01, batch_size=B, lr=1e-3,
              sampling_steps=0, random_seed=0)
    t_plain = Trainer(Config(**kw), N_USER, N_ITEM)
    t_mesh = Trainer(Config(mesh_dp=4, mesh_mp=2, **kw), N_USER, N_ITEM)

    state_p = t_plain.init_state()
    state_m = t_mesh.init_state()
    rng = np.random.default_rng(0)
    x = (rng.random((B, N_ITEM)) < 0.3).astype(np.float32)
    idx = np.arange(B, dtype=np.int32)

    state_p, loss_p = t_plain._train_step(state_p, jnp.asarray(x),
                                          jnp.asarray(idx))
    xs, idxs = t_mesh._put_batch(jnp.asarray(x), jnp.asarray(idx))
    state_m, loss_m = t_mesh._train_step(state_m, xs, idxs)
    np.testing.assert_allclose(float(loss_m), float(loss_p),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state_m.params["embedding_user"]),
        np.asarray(state_p.params["embedding_user"]), rtol=5e-3, atol=1e-5)


def test_lightgcn_frozen_tables_shard_and_match():
    """DNNlightGCN's frozen propagated tables shard over mp rows (the rule
    once targeted a nonexistent 'lgn_embedding' name and silently
    replicated them); the sharded forward equals single-device."""
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    tr = sp.csr_matrix((rng.random((N_USER, N_ITEM)) < 0.3
                        ).astype(np.float32))
    cfg = Config(backbone="lightGCN", dims=[16], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=B)
    model = build_model(cfg, N_USER, N_ITEM, train_csr=tr)
    params = model.init(jax.random.PRNGKey(0))
    specs = param_specs(params)
    assert specs["frozen_lgn_user"] == P("mp", None)
    assert specs["frozen_lgn_item"] == P("mp", None)

    mesh = make_mesh(dp=4, mp=2, devices=cpu_devices)
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, N_ITEM)) < 0.3
         ).astype(jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)
    ref_out, _ = model.apply(params, x, t, None, index=idx,
                             train=False, rng=None)
    sharded = shard_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "mp")))
    out, _ = jax.jit(
        lambda p, x, t, i: model.apply(p, x, t, None, index=i,
                                       train=False, rng=None)
    )(sharded, xs, t, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-5, atol=1e-5)
