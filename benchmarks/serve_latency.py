"""Serving latency distribution under concurrency (VERDICT r2 item 8).

Stands up the production HTTP server (serve_http.make_server -> Coalescer)
over a fresh-init Recommender at Yelp geometry and measures per-request
wall latency at 1 / 8 / 64 concurrent closed-loop clients, plus the
coalescer's dispatch counters (how many chip programs N requests cost).

    python benchmarks/serve_latency.py [--serve-batch 256] [--reqs 300]

Numbers on this container include the axon relay's ~25 ms dispatch RTT;
on-chip cost per dispatch is the profile_eval amortized figure (~2.5 ms
at batch 1024). The reference has no serving surface to compare against.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, "/root/repo")


def _hit(base: str, user: int, k: int = 20) -> float:
    t0 = time.perf_counter()
    with urllib.request.urlopen(f"{base}/recommend?users={user}&k={k}",
                                timeout=60) as r:
        body = json.loads(r.read())
    assert len(body["items"][0]) == k
    return time.perf_counter() - t0


def _stats(base: str) -> dict:
    with urllib.request.urlopen(f"{base}/healthz", timeout=60) as r:
        return json.loads(r.read())["stats"]


def _proc_worker(base, users, k, out_q):
    """One closed-loop client in its own PROCESS (no GIL sharing with the
    other clients — the in-process thread harness showed a false p99 tail
    at 64 clients; see docs/OPERATIONS.md)."""
    lat = []
    for u in users:
        lat.append(_hit(base, int(u), k))
    out_q.put(lat)


def run_level_procs(base: str, n_user: int, concurrency: int,
                    reqs: int) -> dict:
    import multiprocessing as mp

    rng = np.random.default_rng(7)
    users = rng.integers(0, n_user, size=reqs)
    shares = np.array_split(users, concurrency)
    before = _stats(base)
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [ctx.Process(target=_proc_worker, args=(base, s, 20, q))
             for s in shares if s.size]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    lat = []
    for _ in procs:
        lat.extend(q.get())
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    after = _stats(base)
    ms = np.asarray(lat) * 1e3
    return {
        "clients": "processes",
        "concurrency": concurrency,
        "requests": reqs,
        "p50_ms": round(float(np.percentile(ms, 50)), 2),
        "p90_ms": round(float(np.percentile(ms, 90)), 2),
        "p99_ms": round(float(np.percentile(ms, 99)), 2),
        "mean_ms": round(float(ms.mean()), 2),
        "req_per_s": round(reqs / wall, 1),
        "dispatches": after["dispatches"] - before["dispatches"],
        "coalesced": after["coalesced"] - before["coalesced"],
    }


def run_level(base: str, n_user: int, concurrency: int, reqs: int) -> dict:
    lat: list = []
    lock = threading.Lock()
    rng = np.random.default_rng(7)
    users = rng.integers(0, n_user, size=reqs).tolist()
    cursor = iter(range(reqs))

    before = _stats(base)

    def worker():
        while True:
            with lock:
                i = next(cursor, None)
            if i is None:
                return
            dt = _hit(base, users[i])
            with lock:
                lat.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    after = _stats(base)
    ms = np.asarray(lat) * 1e3
    return {
        "concurrency": concurrency,
        "requests": reqs,
        "p50_ms": round(float(np.percentile(ms, 50)), 2),
        "p90_ms": round(float(np.percentile(ms, 90)), 2),
        "p99_ms": round(float(np.percentile(ms, 99)), 2),
        "mean_ms": round(float(ms.mean()), 2),
        "req_per_s": round(reqs / wall, 1),
        "dispatches": after["dispatches"] - before["dispatches"],
        "coalesced": after["coalesced"] - before["coalesced"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--serve-batch", type=int, default=256)
    ap.add_argument("--k-max", type=int, default=100)
    ap.add_argument("--reqs", type=int, default=300)
    ap.add_argument("--users", type=int, default=5949)
    ap.add_argument("--items", type=int, default=2810)
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 8, 64])
    ap.add_argument("--procs", action="store_true",
                    help="drive load from separate client PROCESSES "
                         "(honest tail latency at high concurrency)")
    ap.add_argument("--server-procs", type=int, default=1,
                    help=">1: stand up the pre-forked SO_REUSEPORT "
                         "multi-process front (serve_http --procs) instead "
                         "of the single-process server")
    opts = ap.parse_args()

    import os
    import tempfile

    from gdmcf_tpu.config import Config
    from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
    from gdmcf_tpu.serve import build_recommender
    from gdmcf_tpu.serve_http import make_server

    data_dir = os.path.join(tempfile.gettempdir(),
                            f"serve_bench_{opts.users}x{opts.items}")
    if not os.path.exists(os.path.join(data_dir, "train_list.npy")):
        generate_synthetic_dataset(data_dir, n_user=opts.users,
                                   n_item=opts.items, avg_degree=12, seed=0)
    train, _, _, n_user, n_item = data_load(
        os.path.join(data_dir, "train_list.npy"),
        os.path.join(data_dir, "valid_list.npy"),
        os.path.join(data_dir, "test_list.npy"))

    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
                 batch_size=1024, steps=5, noise_scale=0.01,
                 sampling_steps=0, debug=True)
    rec = build_recommender(cfg, None, train, n_user, n_item,
                            serve_batch=opts.serve_batch, k_max=opts.k_max)
    backend = fronts = srv = None
    if opts.server_procs > 1:
        import socket

        from gdmcf_tpu.serve_http import serve_multiproc

        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        backend, fronts = serve_multiproc(rec, "127.0.0.1", port,
                                          opts.server_procs)
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 30
        while True:
            try:
                _stats(base)
                break
            except OSError:
                if time.time() > deadline:
                    # fail HERE, not at the first timed request (e.g. the
                    # probed port was taken between probe.close() and the
                    # fronts' SO_REUSEPORT bind, or the fronts died on boot)
                    raise RuntimeError(
                        f"multiproc front never became ready on {base}; "
                        f"front rcs: {[p.poll() for p in fronts]}")
                time.sleep(0.2)
    else:
        srv = make_server(rec, "127.0.0.1", 0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"

    # warm the HTTP + dispatch path before timing
    for _ in range(8):
        _hit(base, 0)

    level = run_level_procs if opts.procs else run_level
    try:
        for c in opts.levels:
            out = level(base, n_user, c, opts.reqs)
            out["server_procs"] = opts.server_procs
            print(json.dumps(out), flush=True)
    finally:
        if srv is not None:
            srv.shutdown()
        if backend is not None:
            backend.close()
            for p in fronts:
                p.terminate()
            for p in fronts:  # reap — terminate() alone leaves zombies
                try:
                    p.wait(timeout=10)
                except Exception:
                    pass


if __name__ == "__main__":
    main()
