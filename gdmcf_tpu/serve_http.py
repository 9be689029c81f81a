"""Minimal production HTTP serving front-end over :class:`serve.Recommender`.

stdlib-only (no web framework in the image): a ``ThreadingHTTPServer`` whose
handlers submit to a request COALESCER — a single dispatcher thread that
drains everything queued while the previous dispatch was on the chip and
packs it into one padded fixed-shape program call (one TPU client, one
compiled executable; see docs/OPERATIONS.md). Requests with different ``k``
and ``exclude_history`` share a dispatch: the program always ranks ``k_max``
and the history mask is per-row. Under load N concurrent 1-user requests
cost ~1 dispatch instead of N; when idle nothing waits (no artificial
batching delay — the previous dispatch's duration IS the gather window).

Endpoints:
  GET  /healthz                          -> {"ok": true, "n_user": N, ...}
  GET  /recommend?users=1,2,3&k=20       -> {"users": [...], "items": [[...]]}
  POST /recommend  {"users": [...], "k": 20, "exclude_history": true}

Run:  python -m gdmcf_tpu.serve_http -c configs/yelpOneEmbGcn.yaml \
          --ckpt_dir_serve /ckpts/run1 --port 8080
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


class _Waiter:
    __slots__ = ("users", "exclude", "done", "result", "error")

    def __init__(self, users, exclude: bool):
        self.users = users
        self.exclude = exclude
        self.done = threading.Event()
        self.result = None
        self.error: Exception | None = None


class Coalescer:
    """Packs concurrent recommend() requests into shared padded dispatches.

    The reference has no serving story at all (training script only); this
    is the production request path. A single daemon thread owns the chip:
    it takes the FIFO prefix of queued waiters that fits ``serve_batch``
    rows, runs ONE :meth:`Recommender.recommend_batch`, and distributes row
    slices back. Oversized requests are split into serve_batch-sized
    waiters at submit time and reassembled.
    """

    def __init__(self, recommender):
        self.rec = recommender
        self._cv = threading.Condition()
        self._pending: list[_Waiter] = []
        # observability: served request/row/dispatch counters (/healthz)
        self.stats = {"requests": 0, "rows": 0, "dispatches": 0,
                      "coalesced": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="gdmcf-serve-dispatch")
        self._thread.start()

    def submit(self, users, k: int, exclude: bool):
        """Blocking: returns the [n, k] item matrix for this request."""
        users = np.asarray(users, dtype=np.int32)
        bs = self.rec.serve_batch
        waiters = [_Waiter(users[i:i + bs], exclude)
                   for i in range(0, users.size, bs)]
        with self._cv:
            self._pending.extend(waiters)
            self.stats["requests"] += 1
            self.stats["rows"] += int(users.size)
            self._cv.notify()
        parts = []
        for w in waiters:
            w.done.wait()
            if w.error is not None:
                raise w.error
            parts.append(w.result[:, :k])
        return np.concatenate(parts, axis=0)

    def _take_batch(self) -> list[_Waiter]:
        with self._cv:
            while not self._pending:
                self._cv.wait()
            batch, room = [], self.rec.serve_batch
            while self._pending and self._pending[0].users.size <= room:
                w = self._pending.pop(0)
                batch.append(w)
                room -= w.users.size
            return batch

    def _loop(self):
        while True:
            batch = self._take_batch()
            users = np.concatenate([w.users for w in batch])
            excl = np.concatenate([np.full(w.users.size, w.exclude, bool)
                                   for w in batch])
            with self._cv:
                self.stats["dispatches"] += 1
                self.stats["coalesced"] += len(batch) - 1
            try:
                ranked = self.rec.recommend_batch(users, excl)
            except Exception as e:  # surface to every caller in this batch
                for w in batch:
                    w.error = e
                    w.done.set()
                continue
            off = 0
            for w in batch:
                w.result = ranked[off:off + w.users.size]
                off += w.users.size
                w.done.set()


def make_server(recommender, host: str = "127.0.0.1", port: int = 8080
                ) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``.serve_forever()`` to run."""
    coalescer = Coalescer(recommender)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _recommend(self, users, k: int, exclude: bool) -> None:
            if not users:
                self._reply(400, {"error": "users must be non-empty"})
                return
            if not 1 <= k <= recommender.k_max:
                self._reply(400, {"error": f"k must be in [1, "
                                           f"{recommender.k_max}] (k_max)"})
                return
            n_user = recommender.history.n_user
            bad = [u for u in users if not 0 <= u < n_user]
            if bad:
                self._reply(400, {"error": f"user ids out of range: {bad[:5]}"})
                return
            try:
                items = coalescer.submit(users, k, exclude)
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._reply(200, {"users": [int(u) for u in users],
                              "items": [[int(i) for i in row]
                                        for row in items]})

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                self._reply(200, {"ok": True,
                                  "n_user": recommender.history.n_user,
                                  "n_item": recommender.history.n_item,
                                  "serve_batch": recommender.serve_batch,
                                  "k_max": recommender.k_max,
                                  "stats": dict(coalescer.stats)})
                return
            if url.path == "/recommend":
                q = parse_qs(url.query)
                try:
                    users = [int(u) for u in q.get("users", [""])[0].split(",")
                             if u != ""]
                    k = int(q.get("k", ["20"])[0])
                    # same truthy convention as the config bool flags (the
                    # old `!= "false"` made "False"/"0" silently truthy)
                    exclude = (q.get("exclude_history", ["true"])[0]
                               .strip().lower() in ("1", "true", "yes", "y"))
                except ValueError:
                    self._reply(400, {"error": "malformed query"})
                    return
                self._recommend(users, k, exclude)
                return
            self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/recommend":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                users = [int(u) for u in req["users"]]
                k = int(req.get("k", 20))
                exclude = bool(req.get("exclude_history", True))
            except (KeyError, TypeError, ValueError, json.JSONDecodeError):
                self._reply(400, {"error": "body must be JSON with 'users'"})
                return
            self._recommend(users, k, exclude)

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.coalescer = coalescer  # type: ignore[attr-defined]  (introspection)
    return srv


def main(argv=None):
    import argparse
    import os
    import sys

    from gdmcf_tpu.config import parse_args
    from gdmcf_tpu.data.loader import data_load_dir
    from gdmcf_tpu.serve import build_recommender

    args = argv if argv is not None else sys.argv[1:]
    http_flags = argparse.ArgumentParser(add_help=False)
    http_flags.add_argument("--ckpt_dir_serve", default=None)
    http_flags.add_argument("--host", default="127.0.0.1")
    http_flags.add_argument("--port", type=int, default=8080)
    http_flags.add_argument("--serve_batch", type=int, default=256)
    http_flags.add_argument("--k_max", type=int, default=100)
    ns, rest = http_flags.parse_known_args(args)
    cfg = parse_args(rest)

    train, _, _, n_user, n_item = data_load_dir(cfg.data_path)

    rec = build_recommender(cfg, ns.ckpt_dir_serve or cfg.ckpt_dir, train,
                            n_user, n_item, serve_batch=ns.serve_batch,
                            k_max=ns.k_max)
    srv = make_server(rec, ns.host, ns.port)
    print(f"serving on http://{ns.host}:{srv.server_address[1]}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
