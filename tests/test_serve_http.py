"""HTTP serving front-end (serve_http.py) against an in-process server."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from gdmcf_tpu.config import Config
from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
from gdmcf_tpu.serve import Recommender
from gdmcf_tpu.serve_http import make_server
from gdmcf_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("http")
    paths = generate_synthetic_dataset(str(tmp), n_user=40, n_item=32,
                                       avg_degree=6, seed=9)
    train, _, _, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                 steps=5, batch_size=8, sampling_steps=0)
    trainer = Trainer(cfg, n_user, n_item)
    rec = Recommender.from_state(trainer, trainer.init_state(), train,
                                 serve_batch=8)
    srv = make_server(rec, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield rec, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    _, base = server
    code, body = _get(base + "/healthz")
    assert code == 200
    assert body["ok"] and body["n_user"] == 40 and body["n_item"] == 32


def test_get_recommend_matches_library(server):
    rec, base = server
    code, body = _get(base + "/recommend?users=0,3,7&k=5")
    assert code == 200
    direct, _ = rec.recommend([0, 3, 7], k=5)
    np.testing.assert_array_equal(np.asarray(body["items"]), direct)
    assert body["users"] == [0, 3, 7]


def test_post_recommend(server):
    _, base = server
    req = urllib.request.Request(
        base + "/recommend",
        data=json.dumps({"users": [1, 2], "k": 4}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        body = json.loads(r.read())
    assert len(body["items"]) == 2 and len(body["items"][0]) == 4


def test_errors(server):
    _, base = server
    import urllib.error
    for path in ("/recommend?users=&k=5",      # empty users
                 "/recommend?users=999&k=5",   # out of range
                 "/recommend?users=x&k=5",     # malformed
                 "/recommend?users=1&k=0",     # k out of range
                 "/recommend?users=1&k=99999", # k > k_max
                 "/nope"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base + path)
        assert e.value.code in (400, 404)


def test_post_bad_bodies_return_400(server):
    """Non-dict JSON / non-list users must 400, not kill the handler."""
    import urllib.error
    _, base = server
    for body in (b"[1,2]", b'{"users": 5}', b"not json", b""):
        req = urllib.request.Request(
            base + "/recommend", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400


def test_k_prefix_of_kmax_ranking_is_exact(server):
    """The single k_max-compiled program sliced to k must equal a program
    compiled directly at k."""
    rec, _ = server
    items_sliced, _ = rec.recommend([0, 5, 9], k=4)
    direct = Recommender(rec.trainer, rec.params, rec.history,
                         serve_batch=rec.serve_batch, k_max=4)
    items_direct, _ = direct.recommend([0, 5, 9], k=4)
    np.testing.assert_array_equal(items_sliced, items_direct)


def test_concurrent_requests(server):
    """Concurrent requests coalesce into shared dispatches and all succeed."""
    rec, base = server
    results = []

    def hit(u):
        results.append(_get(base + f"/recommend?users={u}&k=3")[0])

    threads = [threading.Thread(target=hit, args=(u,)) for u in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 6


def test_coalescer_mixed_k_and_exclude(server):
    """Requests with different k and exclude_history share dispatches yet
    each gets its own correct slice (per-row mask, per-request k cut)."""
    rec, base = server
    out = {}

    def hit(name, qs):
        out[name] = _get(base + "/recommend?" + qs)[1]

    threads = [
        threading.Thread(target=hit, args=("a", "users=0,1&k=3")),
        threading.Thread(target=hit,
                         args=("b", "users=2&k=5&exclude_history=false")),
        threading.Thread(target=hit, args=("c", "users=3,4,5&k=2")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert [len(r) for r in out["a"]["items"]] == [3, 3]
    assert [len(r) for r in out["b"]["items"]] == [5]
    assert [len(r) for r in out["c"]["items"]] == [2, 2, 2]
    assert out["a"]["users"] == [0, 1]
    assert out["c"]["users"] == [3, 4, 5]
    # excluded-history rows may never rank a seen item
    seen = set(np.flatnonzero(rec.history.gather(np.array([0], np.int32))[0])
               .tolist())
    assert not seen.intersection(out["a"]["items"][0])


def test_coalescer_stats_and_oversized_split(server):
    """A request wider than serve_batch (8) splits into multiple dispatches
    and reassembles in order; /healthz exposes the counters."""
    rec, base = server
    before = _get(base + "/healthz")[1]["stats"]
    code, body = _get(base + "/recommend?users=" +
                      ",".join(str(u % 40) for u in range(20)) + "&k=3")
    assert code == 200
    assert len(body["items"]) == 20 and len(body["items"][0]) == 3
    after = _get(base + "/healthz")[1]["stats"]
    assert after["requests"] == before["requests"] + 1
    assert after["rows"] == before["rows"] + 20
    # 20 rows at serve_batch=8 -> at least ceil(20/8)=3 dispatches
    assert after["dispatches"] >= before["dispatches"] + 3


def test_get_exclude_history_false_variants(server):
    """GET exclude_history accepts the config truthy convention: 'False' and
    '0' must disable history masking (the old parse treated any string
    other than exact lowercase 'false' as true)."""
    rec, base = server
    with_hist, _ = rec.recommend([0], k=5, exclude_history=False)
    for v in ("false", "False", "0", "no"):
        code, body = _get(base + f"/recommend?users=0&k=5&exclude_history={v}")
        assert code == 200
        np.testing.assert_array_equal(np.asarray(body["items"]), with_hist)
    masked, _ = rec.recommend([0], k=5, exclude_history=True)
    code, body = _get(base + "/recommend?users=0&k=5&exclude_history=true")
    np.testing.assert_array_equal(np.asarray(body["items"]), masked)


def test_multiproc_front_end_to_end(server):
    """The pre-forked SO_REUSEPORT front (serve_http --procs N): two front
    PROCESSES forward over the unix-socket RPC to the chip-owning backend;
    results must be identical to the in-process server's, errors must come
    back as 400s, and /healthz must ride the RPC."""
    import socket
    import time
    import urllib.error

    from gdmcf_tpu.serve_http import serve_multiproc

    rec, _ = server
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    backend, fronts = serve_multiproc(rec, "127.0.0.1", port, 2)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 60
        body = None
        while time.time() < deadline:
            try:
                code, body = _get(base + "/healthz")
                break
            except OSError:
                time.sleep(0.2)
        assert body is not None and body["ok"] and body["n_user"] == 40

        code, body = _get(base + "/recommend?users=0,3,7&k=5")
        assert code == 200
        direct, _ = rec.recommend([0, 3, 7], k=5)
        np.testing.assert_array_equal(np.asarray(body["items"]), direct)

        # errors validate in the front, never reach the backend
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base + "/recommend?users=999&k=5")
        assert e.value.code == 400

        # both fronts are alive and answering (hammer the shared port; the
        # kernel balances accepts across the SO_REUSEPORT group)
        for u in range(8):
            code, _ = _get(base + f"/recommend?users={u}&k=3")
            assert code == 200
        assert all(p.poll() is None for p in fronts)
    finally:
        backend.close()
        for p in fronts:
            p.terminate()
        for p in fronts:
            p.wait(timeout=10)


def test_multiproc_supervisor_respawns_dead_front(server):
    """supervise_fronts: killing a front must get it respawned (capacity
    restored, requests keep succeeding) and exhausting the restart budget
    must raise instead of spinning."""
    import socket
    import threading
    import time

    from gdmcf_tpu.serve_http import serve_multiproc, supervise_fronts

    rec, _ = server
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    backend, fronts = serve_multiproc(rec, "127.0.0.1", port, 2)
    base = f"http://127.0.0.1:{port}"
    stop = threading.Event()
    sup_err = []

    def run_supervisor():
        try:
            supervise_fronts(backend, fronts, "127.0.0.1", port,
                             max_restarts=1, poll_s=0.1, stop_event=stop)
        except RuntimeError as e:
            sup_err.append(e)

    t = threading.Thread(target=run_supervisor, daemon=True)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                _get(base + "/healthz")
                break
            except OSError:
                time.sleep(0.2)
        t.start()

        victim = fronts[0]
        victim.kill()
        victim.wait(timeout=10)
        deadline = time.time() + 20
        while fronts[0] is victim and time.time() < deadline:
            time.sleep(0.1)
        assert fronts[0] is not victim, "supervisor never respawned"
        # the respawned front comes up and the group still serves
        deadline = time.time() + 30
        ok = 0
        while time.time() < deadline and ok < 6:
            try:
                code, _b = _get(base + f"/recommend?users={ok}&k=3")
                assert code == 200
                ok += 1
            except OSError:
                time.sleep(0.2)
        assert ok == 6
        assert all(p.poll() is None for p in fronts)

        # budget (1) is spent: a second death must end the supervisor loudly
        fronts[1].kill()
        deadline = time.time() + 20
        while not sup_err and time.time() < deadline:
            time.sleep(0.1)
        assert sup_err and "crash loop" in str(sup_err[0])
    finally:
        stop.set()
        t.join(timeout=10) if t.ident else None
        backend.close()
        for p in fronts:
            p.terminate()
        for p in fronts:
            try:
                p.wait(timeout=10)
            except Exception:
                pass


def test_daemon_sigterm_tears_down_fronts(tmp_path):
    """`kill <daemon>` must unwind (SIGTERM -> SystemExit -> finally) and
    take the front processes down with it — the default handler would die
    without cleanup, orphaning fronts that hold the port."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time

    import psutil

    generate_synthetic_dataset(str(tmp_path) + "/", n_user=40, n_item=32,
                               avg_degree=6, seed=9)
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p and "axon_site" not in p])
    daemon = subprocess.Popen(
        [sys.executable, "-m", "gdmcf_tpu.serve_http",
         "--host", "127.0.0.1", "--port", str(port), "--procs", "2",
         "--serve_batch", "8", "--k_max", "5",
         f"--data_path={tmp_path}/", "--dataset=wdtest", "--dims=[16]",
         "--steps=5", "--sampling_steps=0"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 120
        up = False
        while time.time() < deadline:
            assert daemon.poll() is None, (
                "daemon died during startup:\n" + daemon.stdout.read())
            try:
                code, _b = _get(base + "/healthz")
                up = code == 200
                break
            except OSError:
                time.sleep(0.3)
        assert up, "daemon never became ready"

        fronts = psutil.Process(daemon.pid).children(recursive=True)
        assert len(fronts) >= 2, f"expected 2 front children, saw {fronts}"

        daemon.send_signal(signal.SIGTERM)
        daemon.wait(timeout=30)
        deadline = time.time() + 20
        while time.time() < deadline and any(
                p.is_running() and p.status() != psutil.STATUS_ZOMBIE
                for p in fronts):
            time.sleep(0.2)
        leftover = [p for p in fronts
                    if p.is_running() and p.status() != psutil.STATUS_ZOMBIE]
        assert not leftover, f"orphaned fronts after SIGTERM: {leftover}"
    finally:
        try:
            stragglers = psutil.Process(daemon.pid).children(recursive=True)
        except psutil.NoSuchProcess:
            stragglers = []
        if daemon.poll() is None:
            daemon.kill()
            daemon.wait(timeout=10)
        for p in stragglers:
            try:
                p.kill()
            except psutil.NoSuchProcess:
                pass


def test_front_watchdog_exits_on_backend_death(server):
    """A front whose backend dies must exit (rc 3) instead of holding the
    port and 500ing every request forever; Backend.close() must look DEAD
    to fronts (it severs live connections, not just new ones)."""
    import os
    import socket
    import tempfile
    import time
    import uuid

    from gdmcf_tpu.serve_front import Backend, spawn_fronts
    from gdmcf_tpu.serve_http import Coalescer

    rec, _ = server
    sock_path = os.path.join(tempfile.gettempdir(),
                             f"gdmcf_wd_{uuid.uuid4().hex[:8]}.sock")
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    backend = Backend(Coalescer(rec), rec, sock_path)
    fronts = spawn_fronts(1, sock_path, "127.0.0.1", port,
                          watchdog_interval=0.2, watchdog_failures=3)
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                code, _b = _get(base + "/healthz")
                assert code == 200
                break
            except OSError:
                time.sleep(0.2)

        backend.close()
        deadline = time.time() + 30
        while fronts[0].poll() is None and time.time() < deadline:
            time.sleep(0.2)
        assert fronts[0].poll() == 3, (
            f"front still alive (or wrong rc {fronts[0].poll()}) 30 s "
            f"after backend death")
    finally:
        backend.close()
        for p in fronts:
            p.terminate()
        for p in fronts:
            try:
                p.wait(timeout=10)
            except Exception:
                pass


def test_coalescer_error_propagates_and_recovers(server):
    """A dispatch failure must surface to every waiter in that batch as a
    500 (never a hang), and the dispatcher thread must survive to serve
    subsequent traffic."""
    rec, base = server
    import gdmcf_tpu.serve as serve_mod

    orig = rec.recommend_batch
    calls = {"n": 0}

    def boom(users, exclude_rows):
        calls["n"] += 1
        raise RuntimeError("injected dispatch failure")

    rec.recommend_batch = boom
    try:
        req = urllib.request.Request(base + "/recommend?users=0,1&k=3")
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
            body = json.loads(e.read())
            assert "injected dispatch failure" in body["error"]
        assert code == 500 and calls["n"] == 1
    finally:
        rec.recommend_batch = orig
    # the dispatcher thread is still alive and serving
    code, body = _get(base + "/recommend?users=2&k=3")
    assert code == 200 and len(body["items"][0]) == 3


def test_hot_reload_swaps_params_without_downtime(server, tmp_path):
    """POST /reload swaps params from a same-shape checkpoint with zero
    recompiles, zero failed requests, and an atomic cutover (round-4 verdict
    item 6): scores change, /healthz's params_version bumps, and traffic
    issued during the swap all 200s."""
    import jax

    from gdmcf_tpu.train.checkpoint import Checkpointer

    rec, base = server
    orig_params = rec.params
    # a DIFFERENT same-shape state: perturb every float leaf, bump the step
    state = rec.trainer.init_state()
    perturbed = jax.tree_util.tree_map(
        lambda a: a + 0.01 if np.issubdtype(np.asarray(a).dtype, np.floating)
        else a, state.params)
    state = state._replace(params=perturbed, step=state.step + 123)
    ckpt_dir = str(tmp_path / "hot")
    ck = Checkpointer(ckpt_dir)
    ck.save(state)
    ck.close()

    before = _get(base + "/healthz")[1]["stats"]["params_version"]
    codes = []

    def traffic():
        for u in range(5):
            codes.append(_get(base + f"/recommend?users={u}&k=3")[0])

    t = threading.Thread(target=traffic)
    t.start()
    req = urllib.request.Request(
        base + "/reload", data=json.dumps({"ckpt_dir": ckpt_dir}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    t.join()
    try:
        assert body["reloaded"] and body["step"] == 123
        assert codes == [200] * 5  # zero 5xx during the swap
        after = _get(base + "/healthz")[1]["stats"]["params_version"]
        assert after == before + 1
        # the live tree IS the checkpointed one, bit-exactly
        for live, saved in zip(jax.tree_util.tree_leaves(rec.params),
                               jax.tree_util.tree_leaves(perturbed)):
            np.testing.assert_array_equal(np.asarray(live),
                                          np.asarray(saved))
        # and rankings actually come from the new params
        new_items, _ = rec.recommend([0, 1, 2], k=5)
        rec.params = orig_params
        old_items, _ = rec.recommend([0, 1, 2], k=5)
        assert not np.array_equal(new_items, old_items)
    finally:
        rec.params = orig_params
        rec.ckpt_dir = None  # restore demo mode for later tests


def test_hot_reload_failure_leaves_old_params_live(server, tmp_path):
    """A refused reload (no ckpt configured / dir missing) 409s and the old
    params keep serving — the swap is all-or-nothing."""
    import urllib.error

    rec, base = server
    orig_params = rec.params
    for payload in (b"{}",  # demo-mode rec has no ckpt_dir configured
                    json.dumps({"ckpt_dir": str(tmp_path / "nope")}).encode()):
        req = urllib.request.Request(
            base + "/reload", data=payload,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=120)
        assert e.value.code == 409
    assert rec.params is orig_params
    assert _get(base + "/recommend?users=0&k=3")[0] == 200


def test_hot_reload_rejects_mismatched_shapes(server, tmp_path):
    """A checkpoint from a different geometry/config must be refused (the
    compiled program is only valid for the trained shapes)."""
    from gdmcf_tpu.train.checkpoint import Checkpointer

    rec, _ = server
    other_cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[8],
                       emb_size=10, steps=5, batch_size=8, sampling_steps=0)
    other = Trainer(other_cfg, 40, 32)
    ckpt_dir = str(tmp_path / "mismatch")
    ck = Checkpointer(ckpt_dir)
    ck.save(other.init_state())
    ck.close()
    orig = rec.params
    with pytest.raises(Exception):
        rec.reload_params(ckpt_dir)
    assert rec.params is orig


def test_multiproc_front_forwards_reload(server, tmp_path):
    """POST /reload on any pre-forked front rides the unix-socket RPC to the
    chip-owning backend and swaps its params."""
    import socket
    import time

    from gdmcf_tpu.serve_http import serve_multiproc
    from gdmcf_tpu.train.checkpoint import Checkpointer

    rec, _ = server
    orig_params = rec.params
    state = rec.trainer.init_state()
    state = state._replace(step=state.step + 7)
    ckpt_dir = str(tmp_path / "mp_reload")
    ck = Checkpointer(ckpt_dir)
    ck.save(state)
    ck.close()

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    backend, fronts = serve_multiproc(rec, "127.0.0.1", port, 1)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                _get(base + "/healthz")
                break
            except OSError:
                time.sleep(0.2)
        before = _get(base + "/healthz")[1]["stats"]["params_version"]
        req = urllib.request.Request(
            base + "/reload",
            data=json.dumps({"ckpt_dir": ckpt_dir}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert body["reloaded"] and body["step"] == 7
        after = _get(base + "/healthz")[1]["stats"]["params_version"]
        assert after == before + 1
        assert _get(base + "/recommend?users=0&k=3")[0] == 200
    finally:
        backend.close()
        for p in fronts:
            p.terminate()
        for p in fronts:
            try:
                p.wait(timeout=10)
            except Exception:
                pass
        rec.params = orig_params
        rec.ckpt_dir = None


def test_front_reload_with_dead_backend_is_502(server):
    """/reload when the front->backend RPC transport is dead must be 502
    (backend unreachable — params state unknown, traffic failing), NOT the
    409 'refused, old params keep serving' — that claim would be false and
    delays incident response (round-5 review finding)."""
    import os
    import socket
    import tempfile
    import time
    import uuid

    from gdmcf_tpu.serve_front import Backend, spawn_fronts
    from gdmcf_tpu.serve_http import Coalescer

    rec, _ = server
    sock_path = os.path.join(tempfile.gettempdir(),
                             f"gdmcf_502_{uuid.uuid4().hex[:8]}.sock")
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    backend = Backend(Coalescer(rec), rec, sock_path)
    # long watchdog budget: the front must still be alive when we POST
    fronts = spawn_fronts(1, sock_path, "127.0.0.1", port,
                          watchdog_interval=5.0, watchdog_failures=10)
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                assert _get(base + "/healthz")[0] == 200
                break
            except OSError:
                time.sleep(0.2)
        backend.close()  # sever the RPC transport
        req = urllib.request.Request(base + "/reload", data=b"{}",
                                     headers={"Content-Type":
                                              "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 502, e.value.code
        assert "unreachable" in json.loads(e.value.read())["error"]
    finally:
        backend.close()
        for p in fronts:
            p.terminate()
        for p in fronts:
            try:
                p.wait(timeout=10)
            except Exception:
                pass
