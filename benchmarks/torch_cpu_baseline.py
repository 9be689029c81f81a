"""Torch-CPU baseline for bench.py's ``vs_baseline`` ratio.

A minimal, freshly-written torch mirror of the flagship training step
(DNNOneHotEmbeddingGCN under GaussianDiffusionDiscrete — same math as
gdmcf_tpu, written against the same spec). The reference itself cannot run
here (torch_geometric is not installed, and its snapshot has a dead training
loop, SURVEY.md caveat 1), so this stands in as the "repaired reference on
CPU" performance point. The GCN uses the *dense* formulation, which is
strictly faster on CPU than torch_geometric's scatter kernels — i.e. the
baseline is favored, making the reported speedup conservative.

Run:  python benchmarks/torch_cpu_baseline.py [--steps 20] [--batch 1024]
Prints one line: ``baseline_examples_per_s <value>``.
"""

from __future__ import annotations

import argparse
import math
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchFlagship(nn.Module):
    def __init__(self, n_user, n_item, d=1000, temb=10):
        super().__init__()
        self.temb = temb
        self.emb_layer = nn.Linear(temb, temb)
        self.tower1 = nn.Linear(n_item + temb, d)
        self.tower2 = nn.Linear(2 * n_item + temb, d)
        self.embedding_item = nn.Embedding(n_item, 3 * d)
        self.embedding_user = nn.Embedding(n_user, d)
        self.gcn1 = nn.Linear(3 * d, 512)
        self.gcn2 = nn.Linear(512, 3 * d)
        self.sumW = nn.Parameter(torch.tensor(1.0))
        self.drop = nn.Dropout(0.5)

    def timestep_embedding(self, t):
        half = self.temb // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
        args = t[:, None].float() * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t, x_U, index, g):
        emb = self.emb_layer(self.timestep_embedding(t))
        x = self.drop(x)
        x_U = self.drop(x_U.reshape(x.shape[0], -1))
        h = torch.tanh(self.tower1(torch.cat([x, emb], dim=-1)))
        h_U = torch.tanh(self.tower2(torch.cat([x_U, emb], dim=-1)))
        # NT-Xent
        sim = (h @ h_U.t()) / 0.1
        p = F.softmax(sim, dim=-1)
        diag = torch.diagonal(p)
        # denominator epsilon mirrors the saturation guard in
        # gdmcf_tpu/models/layers.py:nt_xent_loss
        closs = (-torch.log((diag + 1e-5) / (p.sum(1) - diag + 1e-5))).mean()

        user = self.embedding_user(index)
        item = self.embedding_item.weight
        hc = torch.cat([h, h_U, user], dim=1)
        # dense bipartite GCNConv x2 (directed, self-loops)
        deg_i = 1.0 + g.sum(0)
        xu, xi = self.gcn1(hc), self.gcn1(item)
        iu = xi / deg_i[:, None] + (g.t() @ xu) / deg_i.sqrt()[:, None]
        uu = xu
        uu = F.leaky_relu(F.relu(uu), 0.1)
        iu = F.leaky_relu(F.relu(iu), 0.1)
        xu2, xi2 = self.gcn2(uu), self.gcn2(iu)
        uu2 = xu2
        hc = hc * self.sumW + uu2 * (1 - self.sumW)
        # cosine scores
        scores = (hc @ item.t()) / (hc.norm(dim=1, keepdim=True)
                                    * item.norm(dim=1)[None, :])
        return scores, closs


def run(batch=1024, n_user=5949, n_item=2810, d=1000, steps=5, iters=20,
        warmup=3, threads=None):
    if threads:
        torch.set_num_threads(threads)
    torch.manual_seed(0)
    model = TorchFlagship(n_user, n_item, d)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-5, weight_decay=0.0)
    x0 = (torch.rand(batch, n_item) < 0.01).float()
    index = torch.arange(batch)

    betas = np.linspace(0.01 * 0.001, 0.01 * 0.01, steps)
    ab = np.cumprod(1 - betas)
    sqrt_ab = torch.tensor(np.sqrt(ab), dtype=torch.float32)
    sqrt_1mab = torch.tensor(np.sqrt(1 - ab), dtype=torch.float32)

    def step():
        opt.zero_grad()
        ts = torch.randint(0, steps, (batch,))
        # discrete channel
        a = ts.float() / batch
        p1 = torch.where(x0 > 0.5,
                         a[:, None] + (1 - a[:, None]) * (1 - 0.9995),
                         (1 - a[:, None]) * (1 - 0.9995))
        s = torch.bernoulli(p1)
        c1 = x0 * s
        c0 = (1 - x0) * (1 - s)
        x_U = torch.stack([c0, c1], dim=-1)
        # continuous channel
        noise = torch.randn_like(x0)
        x_t = sqrt_ab[ts][:, None] * x0 + sqrt_1mab[ts][:, None] * noise
        scores, closs = model(x_t, ts, x_U, index, c1)
        mse = ((x0 - scores) ** 2).mean(dim=1)
        loss = mse.mean() + 0.1 * closs
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return batch * iters / dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--threads", type=int, default=None)
    args = ap.parse_args()
    eps = run(batch=args.batch, iters=args.iters, threads=args.threads)
    print(f"baseline_examples_per_s {eps:.2f}")
