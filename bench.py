"""Benchmark: flagship training throughput on the default device.

Prints ONE JSON line:
  {"metric": "train_examples_per_s", "value": N, "unit": "examples/s",
   "vs_baseline": N / TORCH_CPU_BASELINE}

Geometry = the Yelp recipe (configs/yelpOneEmbGcn.yaml): 5949x2810 catalog,
batch 1024, dims [1000], 5 diffusion steps, DNNOneHotEmbeddingGCN backbone.
The baseline constant is the torch-CPU mirror's measured examples/s on this
machine (benchmarks/torch_cpu_baseline.py); re-measure with --measure-baseline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gdmcf_tpu.config import Config
from gdmcf_tpu.train.trainer import Trainer

sys.path.insert(0, str(Path(__file__).resolve().parent / "benchmarks"))

# benchmarks/torch_cpu_baseline.py on this 4-vCPU host (see that file's
# docstring for why this stands in for the reference's own number).
TORCH_CPU_BASELINE_EPS = 239.5

N_USER, N_ITEM = 5949, 2810


def measure(batch=1024, iters=200, warmup=5, seed=0, rng_impl="rbg",
            steps_per_call=100, param_dtype="float32",
            moment_dtype="bfloat16", dims=(1000,), bf16_weights=()):
    """Steady-state training throughput. Methodology for relayed/dev
    backends where async timing lies (block_until_ready is a no-op and
    repeated identical calls can be elided):

    - K optimizer steps are FUSED into one program (lax.scan — identical
      math to K sequential steps, tested), so each ~2.5 ms relay dispatch
      covers K steps instead of one;
    - a scalar VALUE fetch after every call forces the chain to execute;
    - the measured fetch round-trip is subtracted.
    """
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=list(dims),
                 emb_size=10,
                 steps=5, noise_scale=0.01, noise_min=0.001, noise_max=0.01,
                 batch_size=batch, lr=1e-5, rng_impl=rng_impl,
                 sampling_steps=0, train_steps_per_call=steps_per_call,
                 param_dtype=param_dtype, opt_moment_dtype=moment_dtype,
                 bf16_weights=tuple(bf16_weights))
    trainer = Trainer(cfg, n_user=N_USER, n_item=N_ITEM)
    state = trainer.init_state()
    rng = np.random.default_rng(seed)
    x = jnp.asarray((rng.random((batch, N_ITEM)) < 0.01).astype(np.float32))
    idx = jnp.asarray((rng.permutation(N_USER)[:batch] if batch <= N_USER
                   else rng.integers(0, N_USER, size=batch))
                  .astype(np.int32))
    k = max(steps_per_call, 1)
    xs = jnp.broadcast_to(x, (k,) + x.shape)
    iis = jnp.broadcast_to(idx, (k,) + idx.shape)

    for _ in range(max(warmup // k, 1)):
        state, losses = trainer._train_multi(state, xs, iis)
    assert np.isfinite(float(losses.sum())), "training diverged during warmup"

    # per-dispatch floor (dispatch + trivial execute + value fetch), measured
    # with FRESH dispatches: jax caches _npy_value after the first fetch, so
    # timing repeated float() on one materialized scalar measures ~0 (a bug
    # this bench shipped with — it under-reported throughput ~15%)
    from _timing import dispatch_floor
    floor = dispatch_floor()

    n_calls = max(iters // k, 1)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, losses = trainer._train_multi(state, xs, iis)
        lv = float(losses.sum())  # forces execution
    wall = time.perf_counter() - t0
    assert np.isfinite(lv), "training diverged during measurement"
    compute = max(wall - n_calls * floor, 1e-9)
    return batch * n_calls * k / compute


V5E_PEAK_BF16_FLOPS = 197e12  # one v5e chip, bf16 MXU peak


def measure_mfu(batch=1024, iters=1000, seed=0, rng_impl="rbg",
                steps_per_call=100, dims=(1000,)):
    """One defensible MFU number (VERDICT r2 weak item 2): XLA's own FLOP
    count for the compiled k-fused train program (cost_analysis, divided by
    k) over the measured amortized step time, against the v5e bf16 peak.

    cost_analysis counts every HLO flop in the program — forward, backward,
    optimizer, Lt ring — so this is the whole-step MFU, not a matmul-only
    figure."""
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=list(dims),
                 emb_size=10,
                 steps=5, noise_scale=0.01, noise_min=0.001, noise_max=0.01,
                 batch_size=batch, lr=1e-5, rng_impl=rng_impl,
                 sampling_steps=0, train_steps_per_call=steps_per_call)
    trainer = Trainer(cfg, n_user=N_USER, n_item=N_ITEM)
    state = trainer.init_state()
    rng = np.random.default_rng(seed)
    x = jnp.asarray((rng.random((batch, N_ITEM)) < 0.01).astype(np.float32))
    idx = jnp.asarray((rng.permutation(N_USER)[:batch] if batch <= N_USER
                   else rng.integers(0, N_USER, size=batch))
                  .astype(np.int32))
    k = max(steps_per_call, 1)
    xs = jnp.broadcast_to(x, (k,) + x.shape)
    iis = jnp.broadcast_to(idx, (k,) + idx.shape)

    compiled = jax.jit(trainer._train_multi_impl).lower(
        state, xs, iis).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    # XLA's HloCostAnalysis counts a while/scan BODY once (no trip-count
    # multiplication), so the k-fused program's reported flops ≈ one
    # optimizer step (validated: k=1 and k=100 programs report within 2%)
    flops_per_step = float(ca["flops"])

    eps = measure(batch=batch, iters=iters, seed=seed, rng_impl=rng_impl,
                  steps_per_call=steps_per_call, dims=dims)
    step_s = batch / eps
    eff = flops_per_step / step_s
    return {
        "flops_per_step": round(flops_per_step / 1e9, 2),  # GFLOP
        "onchip_step_ms": round(step_s * 1e3, 3),
        "examples_per_s": round(eps, 1),
        "eff_tflops": round(eff / 1e12, 1),
        "mfu_pct": round(100.0 * eff / V5E_PEAK_BF16_FLOPS, 1),
    }


def measure_infer(batch=1024, iters=20, warmup=3, seed=0, top_k=100):
    """Serving latency of one fused eval step: full reverse-diffusion scan +
    history masking + device top-k. Returns (p50_ms, onchip_ms):

    - p50_ms: raw per-call median including dispatch+fetch — on the dev
      tunnel this is RTT-bound (~25-30 ms), i.e. the latency a caller of
      THIS relayed endpoint sees;
    - onchip_ms: scan-amortized on-device step time (the figure that
      carries to real hardware; see benchmarks/_timing.py for why
      per-dispatch protocols cannot measure it).
    """
    from _timing import scan_timeit

    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=batch,
                 sampling_steps=0)
    trainer = Trainer(cfg, n_user=N_USER, n_item=N_ITEM)
    state = trainer.init_state()
    rng = np.random.default_rng(seed)
    x = jnp.asarray((rng.random((batch, N_ITEM)) < 0.01).astype(np.float32))
    idx = jnp.asarray((rng.permutation(N_USER)[:batch] if batch <= N_USER
                   else rng.integers(0, N_USER, size=batch))
                  .astype(np.int32))
    key = jax.random.PRNGKey(0)

    def run(sub):
        # fresh key per call (identical repeated calls can be elided by
        # relayed backends); np.asarray forces the value — block_until_ready
        # does not synchronize on this backend
        return np.asarray(trainer._eval_step(state.params, x, idx, x, sub,
                                             sampling_steps=0, top_k=top_k))

    for _ in range(warmup):
        key, sub = jax.random.split(key)
        out = run(sub)
    times = []
    for _ in range(iters):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        run(sub)
        times.append(time.perf_counter() - t0)
    # salt the INPUT, not just the key: at sampling_steps=0 the eval step is
    # key-independent, so a key-only salt leaves the scan body loop-invariant
    # and XLA hoists it (the dead-salt trap ab_eval_topk.py documents)
    onchip = scan_timeit(
        lambda p, x, i, m, s: trainer._eval_step_impl(
            p, x + s * 1e-12, i, m, jax.random.fold_in(key, s),
            sampling_steps=0, top_k=top_k),
        state.params, x, idx, x, k=50, calls=6)
    return float(np.median(times) * 1000.0), float(onchip)


def main():
    ap = argparse.ArgumentParser()
    # defaults = the measured-best round-2 config (docs/BENCH_NOTES.md sweep):
    # 100 fused steps/dispatch amortize the relay's ~2.5 ms launch floor, the
    # hardware RNG wins ~5% on the big per-step bernoulli/normal draws, and
    # f32 params beat bf16+master at this model size (34 MB of params).
    # 1000 iters = 10 timed dispatches at the default k=100 (200 gave only
    # 2 — too few for a stable round-record number; ~2 s extra wall)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--metric", choices=["train", "infer", "mfu"],
                    default="train")
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--rng", default="rbg",
                    choices=["threefry2x32", "rbg"])
    ap.add_argument("--steps-per-call", type=int, default=100)
    ap.add_argument("--param-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    # bf16 Adam moments: halves the optimizer's HBM traffic — the measured
    # bandwidth wall of the fused step (benchmarks/profile_train3.py)
    ap.add_argument("--moment-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    # selective bf16 storage for the named weights (substring match on the
    # param path, e.g. in_layers/ embedding_item) — VERDICT r4 weak 1 A/B
    ap.add_argument("--bf16-weights", nargs="*", default=[])
    args = ap.parse_args()

    if args.metric == "mfu":
        out = measure_mfu(batch=args.batch, iters=args.iters,
                          rng_impl=args.rng,
                          steps_per_call=args.steps_per_call)
        print(json.dumps({"metric": "train_mfu", "value": out["mfu_pct"],
                          "unit": "%", "vs_baseline": 0.0, **out}))
        return

    if args.metric == "infer":
        p50, onchip = measure_infer(batch=args.batch, iters=args.iters)
        print(json.dumps({
            "metric": "infer_onchip_batch_latency",
            "value": round(onchip, 2),
            "unit": "ms",
            "vs_baseline": 0.0,
            "p50_through_relay_ms": round(p50, 2),
        }))
        return

    baseline = TORCH_CPU_BASELINE_EPS
    if args.measure_baseline:
        from benchmarks.torch_cpu_baseline import run as run_baseline
        baseline = run_baseline(batch=args.batch, iters=10)

    eps = measure(batch=args.batch, iters=args.iters, rng_impl=args.rng,
                  steps_per_call=args.steps_per_call,
                  param_dtype=args.param_dtype,
                  moment_dtype=args.moment_dtype,
                  bf16_weights=args.bf16_weights)
    print(json.dumps({
        "metric": "train_examples_per_s",
        "value": round(eps, 2),
        "unit": "examples/s",
        "vs_baseline": round(eps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
