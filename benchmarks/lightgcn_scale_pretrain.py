"""LightGCN pretrain at 1M users x 200k items ON the Pallas SpMM (VERDICT
round-1 item 2 done-criterion).

The dense normalized adjacency at this geometry is 1M x 200k x 4B = 800 GB —
impossible; the reference's answer is ``torch.sparse.mm``
(/root/reference/lightGCN.py:176-194). Here the graph is degree-sorted
(power-law clustering), packed block-CSR (br=8 thin row tiles for low-fill
graphs), and the full BPR pretrain loop runs with every propagation on the
pipelined Pallas kernel, forward and backward (spmm_op custom VJP).

    python benchmarks/lightgcn_scale_pretrain.py [--users 1000000]
        [--items 200000] [--batch 65536] [--epochs 1]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--avg-degree", type=int, default=10)
    ap.add_argument("--alpha", type=float, default=1.6)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--latent-dim", type=int, default=64)
    ap.add_argument("--n-layers", type=int, default=2)
    ap.add_argument("--br", type=int, default=8)
    ap.add_argument("--bc", type=int, default=128)
    ap.add_argument("--format", choices=["block", "hybrid"], default="block",
                    help="block = pure block-CSR tiles; hybrid = tiles + COO "
                         "remainder (3.3x less tile memory at this geometry)")
    args = ap.parse_args()

    from scale_smoke import synthetic_csr

    from gdmcf_tpu.models.lightgcn import pretrain
    from gdmcf_tpu.ops.spmm import degree_sort_permutation

    rng = np.random.default_rng(0)
    t0 = time.time()
    m = synthetic_csr(rng, args.users, args.items,
                      avg_degree=args.avg_degree, alpha=args.alpha)
    # relabel by degree so the power-law mass clusters into leading tiles
    # (embeddings learned on the relabeled graph are the original's, permuted)
    rp, cp = degree_sort_permutation(m)
    m = m.tocsr()[rp][:, cp].tocsr()
    print(f"graph {args.users} x {args.items}, nnz {m.nnz} "
          f"({time.time()-t0:.0f}s to build)", flush=True)

    t0 = time.time()
    epoch_done = [t0]

    def log(s):
        epoch_done.append(time.time())
        print(f"{s}  (epoch wall {epoch_done[-1]-epoch_done[-2]:.1f}s)",
              flush=True)

    # explicit user-based step budget: this is a per-step TIMING benchmark,
    # not a convergence run — the reference's interactions-based default
    # (pretrain steps_per_epoch=None) would be ~avg_degree x longer for the
    # same per-step numbers
    steps_per_epoch = max(args.users // args.batch, 1)
    result = pretrain(m, m, n_layers=args.n_layers,
                      latent_dim=args.latent_dim, epochs=args.epochs,
                      batch_size=args.batch, seed=0,
                      sparse="hybrid" if args.format == "hybrid" else True,
                      block_size=args.bc, block_rows=args.br,
                      evaluate=False, log=log,
                      steps_per_epoch=steps_per_epoch)
    dt = time.time() - t0
    steps = steps_per_epoch * args.epochs
    print(f"pretrain: {steps} BPR steps in {dt:.1f}s "
          f"({dt/steps:.2f}s/step incl. compile); "
          f"final embeddings {result.final_user.shape}/{result.final_item.shape}")
    if args.epochs >= 2:
        # epoch 0 pays the compile; later epochs are the steady state
        steady = (epoch_done[-1] - epoch_done[1]) / ((args.epochs - 1)
                                                     * steps_per_epoch)
        print(f"steady-state: {steady*1e3:.0f} ms/BPR step "
              f"(epochs 1..{args.epochs-1})", flush=True)
    assert np.isfinite(result.final_user).all()
    assert np.isfinite(result.final_item).all()
    print("OK", flush=True)


if __name__ == "__main__":
    main()
