"""Minimal production HTTP serving front-end over :class:`serve.Recommender`.

stdlib-only (no web framework in the image): a ``ThreadingHTTPServer`` whose
handlers serialize into the single compiled recommend program under a lock
(one TPU client; concurrent requests queue, each served at the fixed
``serve_batch`` shape — see docs/OPERATIONS.md).

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


def make_server(recommender, host: str = "127.0.0.1", port: int = 8080
                ) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``.serve_forever()`` to run."""
    lock = threading.Lock()

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
            with lock:  # one compiled program, one chip: serialize
                items, uids = recommender.recommend(
                    users, k=k, exclude_history=exclude)
            self._reply(200, {"users": [int(u) for u in uids],
                              "items": [[int(i) for i in row]
                                        for row in items]})

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                self._reply(200, {"ok": True,
                                  "n_user": recommender.history.n_user,
                                  "n_item": recommender.history.n_item,
                                  "serve_batch": recommender.serve_batch,
                                  "k_max": recommender.k_max})
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

    return ThreadingHTTPServer((host, port), Handler)


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
