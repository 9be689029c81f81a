"""Worker for the multi-host fault-injection test (SURVEY §5 failure
detection; VERDICT r4 item 4). Launched by tests/test_multihost_fault.py,
one process per simulated host, in two phases:

  PHASE=fault  — both hosts train with a per-epoch distributed checkpoint;
                 host 1 SIGKILLs itself at the top of epoch 3 (after the
                 epoch-2 checkpoint committed on every host). The survivor
                 enters epoch 3's gradient collective with a dead peer and
                 must FAIL LOUDLY (nonzero exit within the heartbeat
                 timeout), never hang — that is the failure-detection
                 contract (the reference has nothing: its single process
                 just dies, main.py:316-319).
  PHASE=resume — both hosts restart, restore the epoch-2 distributed
                 checkpoint, verify the restored step, train epochs 3..4,
                 and print identical cross-host eval metrics.
"""

import os
import signal
import sys

# must happen before jax import: 2 virtual devices per "host"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from gdmcf_tpu.parallel import multihost  # noqa: E402

N_USER, N_ITEM = 16, 16
FAULT_EPOCH = 3
TOTAL_EPOCHS = 4


def build_trainer(nproc):
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer

    cfg = Config(backbone="DNN", dims=[8], emb_size=10, steps=5,
                 batch_size=4 * nproc, sampling_steps=0, lr=1e-3,
                 mesh_dp=nproc, mesh_mp=2, topN=[5, 10])
    trainer = Trainer(cfg, N_USER, N_ITEM)
    trainer.mesh = multihost.global_mesh()
    return trainer


def dataset():
    from gdmcf_tpu.data.loader import DiffusionDataset

    rng = np.random.default_rng(7)  # identical on every host
    rows = (rng.random((N_USER, N_ITEM)) < 0.3).astype(np.float32)
    return DiffusionDataset.from_rows(rows), rows


def main():
    # short heartbeat so the survivor's failure detection is test-speed
    multihost.initialize(heartbeat_timeout_s=10)
    pid = jax.process_index()
    nproc = jax.process_count()
    phase = os.environ["PHASE"]
    ckpt_dir = os.environ["CKPT_DIR"]

    trainer = build_trainer(nproc)
    ds, rows = dataset()

    from gdmcf_tpu.train.checkpoint import Checkpointer
    ck = Checkpointer(ckpt_dir)

    if phase == "fault":
        state = trainer.init_state()
        start_epoch = 1
    else:
        latest = ck.latest_step()
        extra = ck.load_extra() or {}
        assert latest == FAULT_EPOCH - 1, f"latest ckpt step {latest}"
        assert extra.get("epoch") == FAULT_EPOCH - 1, extra
        state = ck.restore(trainer.init_state())
        print(f"RESTORED pid={pid} step={latest} epoch={extra['epoch']}",
              flush=True)
        start_epoch = FAULT_EPOCH

    for epoch in range(start_epoch, TOTAL_EPOCHS + 1):
        if phase == "fault" and epoch == FAULT_EPOCH:
            if pid == 1:
                print(f"FAULT_SELF_KILL pid={pid} epoch={epoch}", flush=True)
                os.kill(os.getpid(), signal.SIGKILL)
            print(f"SURVIVOR_ENTERING epoch={epoch}", flush=True)
        # same shuffle stream on every host so shard rows stay paired
        state, loss = trainer.train_epoch(state, ds,
                                          np.random.default_rng(1000 + epoch))
        loss = float(loss)
        assert np.isfinite(loss), loss
        print(f"EPOCH_DONE pid={pid} epoch={epoch} loss={loss:.6f}",
              flush=True)
        ck.save(state, step=epoch, extra={"epoch": epoch})
        multihost.sync_hosts()

    gt = (np.random.default_rng(9).random((N_USER, N_ITEM)) < 0.2
          ).astype(np.float32)
    res = trainer.evaluate(state, rows, gt, rows, [5, 10])
    recall = [round(float(v), 6) for v in res[1]]
    print(f"WORKER_OK pid={pid} phase={phase} step={int(state.step)} "
          f"recall={recall}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
