"""Bisect the non-matmul 1.3 ms of the train step by monkeypatch ablation.

profile_train2.py showed: full fused step 2.10 ms vs a 0.78 ms fwd+bwd
matmul floor at identical shapes, with config toggles (gcn/dropout/rng/
noise_type) all within noise. This script patches out one non-matmul
subsystem at a time (SAME program shapes, math changed) and re-times with
the bench protocol; the deltas attribute the overhead.

Ablations (cumulative=False, one at a time):
  no_lt        update_lt -> identity (ring-buffer scatter chain)
  no_sample_ts sample_timesteps -> fixed uniform ts, pt=1 (lax.cond branch)
  no_corrupt   corrupt_discrete -> clean one-hot; q_sample -> x_start
  sgd          AdamW -> plain SGD (moment reads/writes)
  no_ntxent    nt_xent_loss -> h.sum()*0 (softmax fwd+bwd)
  raw_scores   cosine_scores -> unnormalized matmul (row-norm fwd+bwd)

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_train3.py
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from benchmarks.profile_train2 import fused_time, make_trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    import gdmcf_tpu.models.backbones as bb
    from gdmcf_tpu.diffusion.engine import Diffusion

    def time_variant(name, setup, teardown):
        if args.only and name not in args.only:
            return
        saved = setup()
        try:
            tr = make_trainer()
            ms = fused_time(tr, args.iters, args.k)
            print(f"{name:14s} {ms:6.3f} ms/step", flush=True)
        finally:
            teardown(saved)

    time_variant("full", lambda: None, lambda s: None)

    def _patch(obj, attr, fn):
        old = getattr(obj, attr)
        setattr(obj, attr, fn)
        return (obj, attr, old)

    def _restore(s):
        obj, attr, old = s
        setattr(obj, attr, old)

    time_variant(
        "no_lt",
        lambda: _patch(Diffusion, "update_lt", lambda self, lt, ts, l: lt),
        _restore)

    def fixed_ts(self, key, lt, batch_size):
        import jax
        t = jax.random.randint(key, (batch_size,), 0, self.steps,
                               dtype=jnp.int32)
        return t, jnp.ones((batch_size,), dtype=jnp.float32)

    time_variant(
        "no_sample_ts",
        lambda: _patch(Diffusion, "sample_timesteps", fixed_ts),
        _restore)

    def clean_corrupt(self, key, ts, x):
        return jnp.stack([1.0 - x, x], axis=-1)

    def clean_q(self, x_start, t, noise):
        # 1e-30 (not 0.0) keeps the normal draw alive — XLA would DCE a
        # 0*noise and conflate this ablation with RNG removal
        return x_start + 1e-30 * noise

    time_variant(
        "no_corrupt",
        lambda: [_patch(Diffusion, "corrupt_discrete", clean_corrupt),
                 _patch(Diffusion, "q_sample", clean_q)],
        lambda ss: [_restore(s) for s in ss])

    def sgd_optimizer(lr, wd, param_dtype, *_args):
        import optax
        return optax.sgd(lr)

    time_variant(
        "sgd",
        lambda: [_patch(sys.modules["gdmcf_tpu.train.trainer"],
                        "make_optimizer", sgd_optimizer),
                 _patch(sys.modules["gdmcf_tpu.train.state"],
                        "make_optimizer", sgd_optimizer)],
        lambda ss: [_restore(s) for s in ss])

    time_variant(
        "no_ntxent",
        lambda: _patch(bb, "nt_xent_loss",
                       lambda a, b, temperature=0.1: (a.sum() + b.sum()) * 0.0),
        _restore)

    def raw_scores(u, it, eps=0.0):
        return u @ it.T

    time_variant(
        "raw_scores",
        lambda: _patch(bb, "cosine_scores", raw_scores),
        _restore)


if __name__ == "__main__":
    main()
