"""Multi-host fault injection: kill one host mid-fit, assert the survivor
fails LOUDLY (bounded time, nonzero exit — never a silent hang), then
restart both processes from the distributed checkpoint and assert training
resumes with cross-host metric equality.

This is the SURVEY §5 failure-detection plan item ("kill a host mid-step
and resume") composed from the proven pieces: the 2-process
jax.distributed harness (test_multihost.py) + the distributed Orbax
checkpoint (multihost_worker CKPT_OK). The reference's only failure story
is a single process dying (main.py:316-319 has no detection, no resume).
"""

import os
import re
import socket
import subprocess
import sys
import time

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(nproc, phase, ckpt_dir):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_fault_worker.py")
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"  # never touch the axon TPU backend
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["NUM_PROCESSES"] = str(nproc)
        env["PROCESS_ID"] = str(pid)
        env["PHASE"] = phase
        env["CKPT_DIR"] = ckpt_dir
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    return procs


@pytest.mark.slow
def test_kill_one_host_then_resume(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    nproc = 2

    # ---- phase 1: host 1 SIGKILLs itself at the top of epoch 3 ----------
    procs = _launch(nproc, "fault", ckpt_dir)
    t0 = time.time()
    outs = []
    try:
        # generous budget for 2 jax startups + 2 epochs + detection; the
        # heartbeat timeout is 10 s, so a working detector finishes far
        # sooner — hitting this limit IS the "survivor hangs" failure
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        pytest.fail("survivor hung after peer SIGKILL — failure detection "
                    "did not fire within the time budget")
    elapsed = time.time() - t0

    out0, out1 = outs
    # the victim died by SIGKILL mid-fit, after committing epoch 2
    assert procs[1].returncode == -9, (procs[1].returncode, out1)
    assert "FAULT_SELF_KILL pid=1 epoch=3" in out1, out1
    assert "EPOCH_DONE pid=1 epoch=2" in out1, out1
    # the survivor entered the dead-peer collective and failed LOUDLY:
    # nonzero exit, no epoch-3 completion, no hang (bounded by the timeout)
    assert procs[0].returncode not in (0, None), (procs[0].returncode, out0)
    assert "SURVIVOR_ENTERING epoch=3" in out0, out0
    assert "EPOCH_DONE pid=0 epoch=3" not in out0, out0
    assert "WORKER_OK" not in out0, out0

    # ---- phase 2: restart both processes, resume from the checkpoint ----
    procs = _launch(nproc, "resume", ckpt_dir)
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        raise
    recalls = set()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume worker {pid} failed:\n{out}"
        assert f"RESTORED pid={pid} step=2 epoch=2" in out, out
        # training RESUMED: epochs 3 and 4 ran on the restored state
        assert f"EPOCH_DONE pid={pid} epoch=3" in out, out
        assert f"EPOCH_DONE pid={pid} epoch=4" in out, out
        m = re.search(rf"WORKER_OK pid={pid} phase=resume step=(\d+) "
                      rf"recall=(\[.*?\])", out)
        assert m, out
        recalls.add(m.group(2))
    # cross-host metric equality after resume
    assert len(recalls) == 1, recalls
    # sanity: loud failure beat the phase-1 time budget comfortably
    assert elapsed < 240, elapsed
