"""Worker process for the multi-host smoke test (launched by
tests/test_multihost.py, one process per simulated host).

Exercises the real multihost contract end-to-end on CPU:
  initialize() -> global_mesh() -> a sharded psum step over a global array
  assembled from per-process shards -> sync_hosts().
"""

import os
import sys

# must happen before jax import: 2 virtual devices per "host"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gdmcf_tpu.parallel import multihost  # noqa: E402


def main():
    multihost.initialize()  # COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == int(os.environ["NUM_PROCESSES"]), nproc

    mesh = multihost.global_mesh()  # dp = hosts, mp = local devices
    assert dict(mesh.shape) == {"dp": nproc, "mp": 2}, mesh.shape

    # global [4, 8] array, dp-sharded by host: each process contributes its
    # own rows — the real multi-host data path (no host sees the full array)
    global_shape = (2 * nproc, 8)
    sharding = NamedSharding(mesh, P("dp", None))
    local = np.full((2, 8), float(pid + 1), dtype=np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local, global_shape)

    @jax.jit
    def step(x):
        fn = jax.shard_map(
            lambda s: jax.lax.psum(s.sum(), ("dp", "mp")),
            mesh=mesh, in_specs=P("dp", None), out_specs=P(),
            check_vma=False)
        return fn(x)

    total = float(np.asarray(jax.device_get(step(arr))))
    # each host block sums to 2*8*(pid+1); P('dp', None) replicates a block
    # across the mp axis, so the full psum counts every block mp(=2) times
    expect = 2.0 * float(sum(16.0 * (i + 1) for i in range(nproc)))
    assert total == expect, (total, expect)

    multihost.sync_hosts()
    assert multihost.is_main_process() == (pid == 0)

    # -- real production train step over the multi-host mesh ---------------
    # each process feeds ONLY its local user shard; the Trainer assembles
    # the global dp-sharded batch (make_array_from_process_local_data)
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer

    n_user, n_item, local_b = 8 * nproc, 16, 4
    cfg = Config(backbone="DNN", dims=[8], emb_size=10, steps=5,
                 batch_size=local_b * nproc, sampling_steps=0,
                 mesh_dp=nproc, mesh_mp=2)
    trainer = Trainer(cfg, n_user, n_item)
    trainer.mesh = mesh  # the multi-host mesh, not the local-devices one
    state = trainer.init_state()

    rows = range(pid * local_b, (pid + 1) * local_b)
    assert list(multihost.local_row_range(local_b * nproc)) == list(rows)
    rng = np.random.default_rng(7)  # same stream; slice my shard
    all_x = (rng.random((local_b * nproc, n_item)) < 0.3).astype(np.float32)
    x_local = all_x[rows.start:rows.stop]
    idx_local = np.arange(rows.start, rows.stop, dtype=np.int32)

    gx, gidx = trainer._put_batch(x_local, idx_local)
    assert gx.shape[0] == local_b * nproc, gx.shape
    state, loss = trainer._train_step(state, gx, gidx)
    loss = float(np.asarray(jax.device_get(loss)))
    assert np.isfinite(loss), loss

    multihost.sync_hosts()

    # -- OneHotMatrix==1 over the f32 wire (full train_epoch path): the
    # block one-hot must assemble from the GLOBAL batch inside the program —
    # host-side assembly would concatenate per-process block matrices
    from gdmcf_tpu.data.loader import DiffusionDataset
    cfg_oh = Config(backbone="DNN", dims=[8], emb_size=10, steps=5,
                    batch_size=local_b * nproc, sampling_steps=0,
                    OneHotMatrix=1, wire_format="f32", lr=1e-3,
                    mesh_dp=nproc, mesh_mp=2)
    tr_oh = Trainer(cfg_oh, n_user, n_item)
    tr_oh.mesh = mesh
    s_oh = tr_oh.init_state()
    ds_oh = DiffusionDataset.from_rows(all_x)
    s_oh, oh_loss = tr_oh.train_epoch(s_oh, ds_oh, np.random.default_rng(5))
    assert np.isfinite(oh_loss), oh_loss

    # -- guard rails: misconfigurations fail loudly, not silently -----------
    try:  # empty per-host shards
        multihost.local_row_range(nproc - 1)
        raise AssertionError("local_row_range accepted empty shards")
    except ValueError:
        pass
    from jax.sharding import Mesh
    tr_oh.mesh = Mesh(np.asarray(jax.devices()).reshape(1, 2 * nproc),
                      ("dp", "mp"))  # dp=1 cannot host per-process shards
    try:
        tr_oh._put_batch(x_local, idx_local)
        raise AssertionError("_put_batch accepted dp=1 multi-host feed")
    except ValueError:
        pass

    multihost.sync_hosts()

    # -- full fit(): sharded train feed + replicated eval -------------------
    import scipy.sparse as sp
    rng2 = np.random.default_rng(3)
    tr = sp.csr_matrix((rng2.random((n_user, n_item)) < 0.3
                        ).astype(np.float32))
    va = sp.csr_matrix((rng2.random((n_user, n_item)) < 0.1
                        ).astype(np.float32))
    te = sp.csr_matrix((rng2.random((n_user, n_item)) < 0.1
                        ).astype(np.float32))
    cfg2 = Config(backbone="DNN", dims=[8], emb_size=10, steps=5,
                  batch_size=4 * nproc, sampling_steps=0, epochs=2,
                  eval_every=1, mesh_dp=nproc, mesh_mp=2, lr=1e-3,
                  topN=[5, 10])
    tr2 = Trainer(cfg2, n_user, n_item)
    tr2.mesh = mesh
    fit_state, best = tr2.fit(tr, va, te, log=lambda *a, **k: None)
    recall = [round(float(v), 6) for v in best[1]] if best else None

    # -- dp-sharded eval == replicated eval (bit-exact metric reduce) ------
    # tr2/fit_state eval with the default sharded path vs a trainer forced
    # onto the replicated fallback: identical metrics, 1/nproc the compute
    import dataclasses
    tr3 = Trainer(dataclasses.replace(cfg2, eval_replicated=True),
                  n_user, n_item)
    tr3.mesh = mesh
    dense_rows = np.asarray(tr.todense(), dtype=np.float32)
    gt_dense = np.asarray(va.todense(), dtype=np.float32)
    def close(a, b):
        # metric sums reduce per-batch in f32 (device) before the f64
        # combine, so sharded block sums vs replicated full-batch sums can
        # differ in the last rounded decimal near a .00005 boundary
        return np.allclose(np.asarray(a, np.float64),
                           np.asarray(b, np.float64), atol=1.01e-4)

    res_shard = tr2.evaluate(fit_state, dense_rows, gt_dense, dense_rows,
                             [5, 10])
    res_rep = tr3.evaluate(fit_state, dense_rows, gt_dense, dense_rows,
                           [5, 10])
    assert close(res_shard, res_rep), (res_shard, res_rep)

    from gdmcf_tpu.data.native import NativeCSR
    tcsr, vcsr = NativeCSR.from_scipy(tr), NativeCSR.from_scipy(va)
    res_stream = tr2.evaluate_streaming(fit_state, [tcsr], vcsr, [tcsr],
                                        [5, 10])
    res_stream_rep = tr3.evaluate_streaming(fit_state, [tcsr], vcsr, [tcsr],
                                            [5, 10])
    assert close(res_stream, res_stream_rep), (res_stream, res_stream_rep)
    assert close(res_stream, res_shard), (res_stream, res_shard)

    # -- non-process-contiguous dp blocks (real TPU slices can interleave
    # hosts in raw device order): the uids-based row mapping must still pair
    # predictions with the right ground-truth rows
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    nloc = len(devs) // nproc
    # round-robin the hosts: dp blocks owned h0,h1,...,h0,h1,... for ANY
    # nproc (a hardcoded 4-device order would break a wider smoke)
    inter = np.asarray([devs[h * nloc + j] for j in range(nloc)
                        for h in range(nproc)]).reshape(len(devs), 1)
    cfg_x = dataclasses.replace(cfg2, mesh_dp=len(devs), mesh_mp=1)
    tr4 = Trainer(cfg_x, n_user, n_item)
    tr4.mesh = Mesh(inter, ("dp", "mp"))  # blocks owned h0,h1,h0,h1
    tr5 = Trainer(dataclasses.replace(cfg_x, eval_replicated=True),
                  n_user, n_item)
    tr5.mesh = tr4.mesh
    s4, s5 = tr4.init_state(), tr5.init_state()  # same seed, same values
    r4 = tr4.evaluate(s4, dense_rows, gt_dense, dense_rows, [5, 10])
    r5 = tr5.evaluate(s5, dense_rows, gt_dense, dense_rows, [5, 10])
    assert close(r4, r5), (r4, r5)
    print(f"SHARD_EVAL_OK pid={pid} recall={res_shard[1]}", flush=True)

    # -- the scale combo: multi-host fit on the large-catalog host path
    # (CSR-backed RowSlice shards + streaming dp-sharded eval)
    cfg_lc = dataclasses.replace(cfg2, host_dense=False, epochs=1)
    tr_lc = Trainer(cfg_lc, n_user, n_item)
    tr_lc.mesh = mesh
    _, best_lc = tr_lc.fit(tr, va, te, log=lambda *a, **k: None)
    assert best_lc is not None
    lc_recall = [round(float(v), 6) for v in best_lc[1]]
    print(f"LC_FIT_OK pid={pid} recall={lc_recall}", flush=True)

    # -- distributed checkpoint: save sharded global state, restore it -----
    ckpt_dir = os.environ.get("CKPT_DIR")
    if ckpt_dir:
        from gdmcf_tpu.train.checkpoint import Checkpointer
        ck = Checkpointer(ckpt_dir)
        ck.save(fit_state, extra={"best_epoch": 1})
        template = tr2.init_state()
        restored = ck.restore(template)
        for a, b in zip(jax.tree_util.tree_leaves(fit_state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            da = np.asarray(jax.device_get(a))
            db = np.asarray(jax.device_get(b))
            assert np.array_equal(da, db)
        print(f"CKPT_OK pid={pid} step={int(restored.step)}", flush=True)

    multihost.sync_hosts()
    print(f"WORKER_OK pid={pid} total={total} loss={loss:.6f} "
          f"oh_loss={oh_loss:.6f} fit_recall={recall}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
