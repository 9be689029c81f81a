"""Fault injection: SIGKILL a training process mid-run, resume from its
checkpoint in a fresh process (SURVEY.md §5 failure-detection plan).

The child runs tunnel-free (JAX_PLATFORMS=cpu with the axon sitecustomize
stripped from PYTHONPATH) so the test is safe to run alongside TPU jobs.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CHILD = """
import sys
from gdmcf_tpu.config import Config
from gdmcf_tpu.data.loader import data_load
from gdmcf_tpu.train.trainer import Trainer

data_dir, ckpt_dir, epochs = sys.argv[1], sys.argv[2], int(sys.argv[3])
train, valid, test, n_user, n_item = data_load(
    data_dir + "/train_list.npy", data_dir + "/valid_list.npy",
    data_dir + "/test_list.npy")
cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[12], emb_size=10,
             steps=5, noise_scale=0.01, batch_size=16, epochs=epochs,
             eval_every=1, topN=[5], lr=1e-3, debug=True, sampling_steps=0,
             ckpt_dir=ckpt_dir, resume=True)
trainer = Trainer(cfg, n_user, n_item)
state, best = trainer.fit(train, valid, test)
print("CHILD_DONE step", int(state.step), flush=True)
"""


def child_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO  # drops /root/.axon_site -> tunnel-free
    return env


@pytest.mark.slow
def test_kill_mid_training_then_resume(tmp_path):
    from gdmcf_tpu.data.loader import generate_synthetic_dataset

    data_dir = str(tmp_path / "data")
    ckpt_dir = str(tmp_path / "ck")
    generate_synthetic_dataset(data_dir, n_user=48, n_item=32,
                               avg_degree=8, seed=13)

    # run a long training and kill it once a checkpoint exists
    p = subprocess.Popen([sys.executable, "-c", CHILD, data_dir, ckpt_dir,
                          "500"], env=child_env(),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            time.sleep(1.0)
            if any(d.isdigit() for d in os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) else False:
                break
        assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir), \
            "no checkpoint appeared before the kill"
        time.sleep(2.0)  # let at least one save land fully
    finally:
        p.send_signal(signal.SIGKILL)
        p.wait()

    # resume in a fresh process with a small epoch budget; it must restore
    out = subprocess.run([sys.executable, "-c", CHILD, data_dir, ckpt_dir,
                          "3"], env=child_env(), capture_output=True,
                         text=True, timeout=300)
    assert "resumed from checkpoint" in out.stdout, out.stdout[-2000:]
    assert "CHILD_DONE" in out.stdout, out.stdout[-2000:]
