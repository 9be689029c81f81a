"""Multi-process jax.distributed smoke (VERDICT round-1 item 7 / weak #2).

Launches 2 real OS processes, each a simulated 2-device CPU host, and runs
tests/multihost_worker.py in both: initialize() over a local coordinator,
global (2,2) mesh, a psum step over a globally-sharded array, sync_hosts().
This pins the env/arg contract of parallel/multihost.py before real-slice
time.
"""

import os
import socket
import re
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc", [2])
def test_two_process_distributed_smoke(nproc, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        # tunnel-free CPU: never let a worker touch the axon TPU backend
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["CKPT_DIR"] = ckpt_dir
        env["NUM_PROCESSES"] = str(nproc)
        env["PROCESS_ID"] = str(pid)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    losses, recalls = [], []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid}" in out, out
        losses.append((re.search(r" loss=([-\d.einf]+)", out).group(1),
                       re.search(r"oh_loss=([-\d.einf]+)", out).group(1)))
        recalls.append(re.search(r"fit_recall=(\[.*?\]|None)", out).group(1))
    # every host must compute the SAME global loss from its own data shard
    # (plain and block-one-hot paths), and fit()'s replicated eval must
    # produce identical metrics everywhere
    assert len(set(losses)) == 1, losses
    assert len(set(recalls)) == 1 and recalls[0] != "None", recalls
    # distributed checkpoint save/restore and the sharded-eval==replicated
    # A/B ran on every host
    for pid, out in enumerate(outs):
        assert f"CKPT_OK pid={pid}" in out, out
        assert f"SHARD_EVAL_OK pid={pid}" in out, out
    shard_recalls = {re.search(r"SHARD_EVAL_OK pid=\d+ recall=(\[.*?\])",
                               out).group(1) for out in outs}
    assert len(shard_recalls) == 1, shard_recalls
    # multi-host fit over the CSR-backed large-catalog host path
    lc_recalls = {re.search(r"LC_FIT_OK pid=\d+ recall=(\[.*?\])",
                            out).group(1) for out in outs}
    assert len(lc_recalls) == 1, lc_recalls
