"""Serving layer: checkpoint -> warm recommender -> padded-batch queries."""

import numpy as np

from gdmcf_tpu.config import Config
from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
from gdmcf_tpu.serve import Recommender
from gdmcf_tpu.train.checkpoint import Checkpointer
from gdmcf_tpu.train.trainer import Trainer


def setup(tmp_path):
    paths = generate_synthetic_dataset(str(tmp_path / "sv"), n_user=48,
                                       n_item=40, avg_degree=10, seed=31)
    train, valid, test, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[12], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=16, epochs=2,
                 eval_every=2, topN=[5], lr=1e-3, debug=True,
                 sampling_steps=0, ckpt_dir=str(tmp_path / "ck"))
    trainer = Trainer(cfg, n_user, n_item, train_csr=train)
    state, _ = trainer.fit(train, valid, test, log=lambda *_: None)
    return cfg, trainer, state, train, n_item


def test_recommend_excludes_history_and_handles_odd_sizes(tmp_path):
    cfg, trainer, state, train, n_item = setup(tmp_path)
    rec = Recommender.from_state(trainer, state, train, serve_batch=8)
    dense = np.asarray(train.todense())

    users = [0, 5, 7, 11, 13]  # odd request size vs serve_batch=8
    items, uids = rec.recommend(users, k=10)
    assert items.shape == (5, 10)
    for u, row in zip(users, items):
        assert len(set(row.tolist())) == 10
        assert not dense[u][row].any(), "history leaked into recommendations"

    # multi-chunk request (len > serve_batch)
    many = list(range(20))
    items2, _ = rec.recommend(many, k=5)
    assert items2.shape == (20, 5)
    # first chunk's results are consistent across calls modulo RNG: shapes only


def test_recommend_from_checkpoint_roundtrip(tmp_path):
    cfg, trainer, state, train, n_item = setup(tmp_path)
    # fit() saved a best checkpoint into cfg.ckpt_dir
    rec = Recommender.from_checkpoint(cfg, cfg.ckpt_dir, train, serve_batch=8)
    items, _ = rec.recommend([1, 2, 3], k=7)
    assert items.shape == (3, 7)
    assert (items >= 0).all() and (items < n_item).all()


def test_serve_cli_demo_mode(tmp_path):
    """python -m gdmcf_tpu.serve end-to-end in a tunnel-free subprocess."""
    import os
    import subprocess
    import sys

    from gdmcf_tpu.data.loader import generate_synthetic_dataset

    data_dir = str(tmp_path / "cli")
    generate_synthetic_dataset(data_dir, n_user=40, n_item=32, avg_degree=8,
                               seed=51)
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    out = subprocess.run(
        [sys.executable, "-m", "gdmcf_tpu.serve",
         f"--data_path={data_dir}/", "--dataset=sv", "--debug=true",
         "--dims=[12]", "--steps=5", "--sampling_steps=0",
         "--batch_size=16", "--users", "0,5", "--k", "4"],
        env=env, capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr[-1500:]
    assert "user 0: top-4" in out.stdout
    assert "latency:" in out.stdout
