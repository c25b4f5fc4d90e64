"""Decode daemon: request/response protocol over a Unix socket."""

import os
import threading

import numpy as np
import pytest

import jax

from sais_tpu.cli.serve import DecodeService, request, serve
from sais_tpu.models.full_model import full_model_init, prototypes_init
from sais_tpu.models.vit import vit_init
from tests.test_pipeline_e2e import synth_video, tiny_cfg

pytestmark = pytest.mark.slow


def test_serve_roundtrip(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "videos"))
    synth_video(os.path.join(root, "videos", "vid.mp4"))

    cfg = tiny_cfg()
    vit_params = vit_init(jax.random.key(0), cfg.vit)
    folds = [(full_model_init(jax.random.key(1), cfg.model),
              prototypes_init(jax.random.key(2), 2)[1])]
    svc = DecodeService(root, cfg, vit_params, folds, batch_size=32)

    sock = str(tmp_path / "sais.sock")
    t = threading.Thread(target=serve, args=(svc, sock),
                         kwargs={"log": lambda s: None}, daemon=True)
    t.start()
    import time
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)

    assert request(sock, {"cmd": "ping"})["pong"]
    resp = request(sock, {"video": "vid"})
    assert resp["ok"] and resp["frames"] == 90
    assert os.path.exists(resp["csv"])
    # error isolation: bad video keeps the daemon alive
    bad = request(sock, {"video": "nope"})
    assert not bad["ok"] and "FileNotFoundError" in bad["error"]
    # path traversal is rejected before any filesystem access
    evil = request(sock, {"video": "../videos/vid"})
    assert not evil["ok"] and "ValueError" in evil["error"]
    evil = request(sock, {"video": "/etc/passwd"})
    assert not evil["ok"] and "ValueError" in evil["error"]
    assert request(sock, {"cmd": "ping"})["pong"]
    assert request(sock, {"cmd": "shutdown"})["bye"]
    t.join(timeout=10)
    assert not t.is_alive()


def test_warmup_compiles_decode_path(tmp_path):
    """warmup() must drive BOTH the extractor and the temporal/prototypes
    decode path (a refactor once orphaned the decode block into another
    method, so first requests paid tens of seconds of XLA compiles)."""
    cfg = tiny_cfg()
    svc = DecodeService(str(tmp_path), cfg,
                        vit_init(jax.random.key(0), cfg.vit),
                        [(full_model_init(jax.random.key(1), cfg.model),
                          prototypes_init(jax.random.key(2), 2)[1])],
                        batch_size=8)
    called = {}
    orig = svc.decoder.window_probs
    svc.decoder.window_probs = lambda *a, **k: called.setdefault(
        "probs", True) or orig(*a, **k)
    svc.warmup()
    assert called.get("probs"), "warmup() skipped the decode path"
    # warmup_flow is a no-op without raft params (and must not crash)
    svc.warmup_flow(32, 40)


def test_ping_answers_while_decode_in_flight(tmp_path):
    """Connections are handled on worker threads: a slow decode must not
    block ping/stats from other clients (VERDICT r2 weakness 6)."""
    import time

    cfg = tiny_cfg()
    vit_params = vit_init(jax.random.key(0), cfg.vit)
    folds = [(full_model_init(jax.random.key(1), cfg.model),
              prototypes_init(jax.random.key(2), 2)[1])]
    svc = DecodeService(str(tmp_path), cfg, vit_params, folds, batch_size=32)

    started = threading.Event()

    def slow_decode(video, use_flow=False):
        started.set()
        time.sleep(3.0)
        return {"ok": True, "csv": "", "intervals": 0, "frames": 0,
                "seconds": 3.0}

    svc.decode_video = slow_decode   # instance attr shadows the method
    sock = str(tmp_path / "s3.sock")
    t = threading.Thread(target=serve, args=(svc, sock),
                         kwargs={"log": lambda s: None}, daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)

    result = {}
    dt = threading.Thread(
        target=lambda: result.update(request(sock, {"video": "vid"})))
    dt.start()
    assert started.wait(10)
    t0 = time.time()
    assert request(sock, {"cmd": "ping"})["pong"]
    assert time.time() - t0 < 1.5          # answered during the decode
    stats = request(sock, {"cmd": "stats"})
    assert stats["ok"] and stats["busy"]
    dt.join(timeout=15)
    assert result.get("ok")
    assert request(sock, {"cmd": "shutdown"})["bye"]
    t.join(timeout=10)
    assert not t.is_alive()


def test_shutdown_drains_inflight_decode(tmp_path):
    """shutdown must let a running decode finish and flush its response
    before serve() returns (process exit would kill the daemon worker)."""
    import time

    cfg = tiny_cfg()
    svc = DecodeService(str(tmp_path), cfg,
                        vit_init(jax.random.key(0), cfg.vit),
                        [(full_model_init(jax.random.key(1), cfg.model),
                          prototypes_init(jax.random.key(2), 2)[1])],
                        batch_size=32)
    started = threading.Event()

    def slow_decode(video, use_flow=False):
        started.set()
        time.sleep(2.0)
        return {"ok": True, "csv": "", "intervals": 0, "frames": 0,
                "seconds": 2.0}

    svc.decode_video = slow_decode
    sock = str(tmp_path / "s4.sock")
    t = threading.Thread(target=serve, args=(svc, sock),
                         kwargs={"log": lambda s: None}, daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)

    result = {}
    dt = threading.Thread(
        target=lambda: result.update(request(sock, {"video": "vid"})))
    dt.start()
    assert started.wait(10)
    assert request(sock, {"cmd": "shutdown"})["bye"]
    t.join(timeout=20)          # serve() waits for the decode to drain
    assert not t.is_alive()
    dt.join(timeout=5)
    assert result.get("ok"), result   # the in-flight client got its answer


def test_serve_survives_client_disconnect(tmp_path):
    """A vanished client (BrokenPipe on the response write) must not kill
    the long-lived daemon or leave a stale socket claim."""
    import socket as socketlib
    import time

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "videos"))
    synth_video(os.path.join(root, "videos", "vid.mp4"))
    cfg = tiny_cfg()
    vit_params = vit_init(jax.random.key(0), cfg.vit)
    folds = [(full_model_init(jax.random.key(1), cfg.model),
              prototypes_init(jax.random.key(2), 2)[1])]
    svc = DecodeService(root, cfg, vit_params, folds, batch_size=32)
    sock = str(tmp_path / "s2.sock")
    t = threading.Thread(target=serve, args=(svc, sock),
                         kwargs={"log": lambda s: None}, daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)

    # client sends a request then slams the connection shut before the
    # server writes its response (an error response here — no compile —
    # exercises the same write-after-disconnect path)
    c = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    c.connect(sock)
    c.sendall(b'{"video": "missing"}\n')
    c.close()
    time.sleep(0.5)

    # the daemon must still answer
    assert request(sock, {"cmd": "ping"})["pong"]
    stats = request(sock, {"cmd": "stats"})
    assert stats["ok"]
    assert request(sock, {"cmd": "shutdown"})["bye"]
    t.join(timeout=10)


def test_queued_request_prefetches_host_decode(tmp_path):
    """While request A holds the decode lock, request B's HOST decode must
    start (serve hands decode_video a pre-opened stream), and the
    prefetched decode must return the same result as a cold one
    (VERDICT r3 next #7: overlap host decode with device compute)."""
    import time

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "videos"))
    synth_video(os.path.join(root, "videos", "vid_a.mp4"))
    synth_video(os.path.join(root, "videos", "vid_b.mp4"))

    cfg = tiny_cfg()
    svc = DecodeService(root, cfg, vit_init(jax.random.key(0), cfg.vit),
                        [(full_model_init(jax.random.key(1), cfg.model),
                          prototypes_init(jax.random.key(2), 2)[1])],
                        batch_size=32)
    events = []
    a_started = threading.Event()
    orig_decode = svc.decode_video

    def traced_decode(video, use_flow=False, rgb_stream=None):
        events.append(("decode", video, rgb_stream is not None))
        if video == "vid_a":
            a_started.set()
            time.sleep(2.0)      # hold the device window open for B
        return orig_decode(video, use_flow, rgb_stream=rgb_stream)

    orig_prefetch = svc.start_prefetch

    def traced_prefetch(video):
        events.append(("prefetch", video, a_started.is_set()))
        return orig_prefetch(video)

    svc.decode_video = traced_decode
    svc.start_prefetch = traced_prefetch

    sock = str(tmp_path / "s5.sock")
    t = threading.Thread(target=serve, args=(svc, sock),
                         kwargs={"log": lambda s: None}, daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)

    res_a, res_b = {}, {}
    ta = threading.Thread(
        target=lambda: res_a.update(request(sock, {"video": "vid_a"})))
    ta.start()
    assert a_started.wait(30)
    tb = threading.Thread(
        target=lambda: res_b.update(request(sock, {"video": "vid_b"})))
    tb.start()
    ta.join(timeout=60)
    tb.join(timeout=60)
    assert res_a.get("ok") and res_b.get("ok")
    assert res_b["frames"] == 90     # prefetched stream = full video

    # B's host decode started while A was inside the lock, and B's
    # device pass consumed the pre-opened stream
    assert ("prefetch", "vid_b", True) in events
    assert ("decode", "vid_b", True) in events
    assert request(sock, {"cmd": "shutdown"})["bye"]
    t.join(timeout=10)


def test_extract_video_consumes_preopened_stream(tmp_path):
    """FeatureExtractor.extract_video(stream=open_stream(...)) must equal
    the cold path bit for bit (same frames through the same device fn)."""
    from sais_tpu.infer.pipeline import FeatureExtractor

    path = str(tmp_path / "v.mp4")
    synth_video(path)
    cfg = tiny_cfg()
    ex = FeatureExtractor(vit_init(jax.random.key(0), cfg.vit), cfg,
                          batch_size=32)
    cold = ex.extract_video(path)
    warm = ex.extract_video(path, stream=ex.open_stream(path))
    np.testing.assert_array_equal(cold, warm)


def test_serve_under_concurrent_load(tmp_path):
    """Four clients fire decodes simultaneously (VERDICT r4 #8): every
    client gets ITS OWN video's result (responses ride the request's
    connection), host-decode prefetch stays bounded to the one-slot
    semaphore (memory cap), and the daemon logs per-request latency with
    running p50/p95; stats reports the same percentiles."""
    import re
    import time

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "videos"))
    nframes = {"vid_a": 60, "vid_b": 90, "vid_c": 120, "vid_d": 75}
    for name, n in nframes.items():
        synth_video(os.path.join(root, "videos", f"{name}.mp4"), nframes=n)

    cfg = tiny_cfg()
    svc = DecodeService(root, cfg, vit_init(jax.random.key(0), cfg.vit),
                        [(full_model_init(jax.random.key(1), cfg.model),
                          prototypes_init(jax.random.key(2), 2)[1])],
                        batch_size=32)

    open_streams = [0]
    max_open = [0]
    sl = threading.Lock()
    orig_prefetch = svc.start_prefetch

    def traced_prefetch(video):
        s = orig_prefetch(video)
        if s is None:
            return None
        with sl:
            open_streams[0] += 1
            max_open[0] = max(max_open[0], open_streams[0])
        orig_close = s.close

        def close():
            with sl:
                open_streams[0] -= 1
            orig_close()

        s.close = close
        return s

    svc.start_prefetch = traced_prefetch
    logs = []
    sock = str(tmp_path / "load.sock")
    t = threading.Thread(target=serve, args=(svc, sock),
                         kwargs={"log": logs.append}, daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)

    results = {}

    def client(name):
        results[name] = request(sock, {"video": name}, timeout=300)

    threads = [threading.Thread(target=client, args=(n,)) for n in nframes]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    for name, n in nframes.items():
        assert results[name].get("ok"), results[name]
        assert results[name]["frames"] == n, (name, results[name])
        assert os.path.exists(results[name]["csv"])
    # at most ONE prefetch stream was ever open (the semaphore's memory
    # bound held under contention)
    assert max_open[0] <= 1 and open_streams[0] == 0

    lat_lines = [ln for ln in logs if re.search(r"p50=\d", ln)]
    assert len(lat_lines) == 4, logs
    assert re.search(r"decode vid_\w: \d+\.\d+s \(n=4 p50=\d+\.\d+s "
                     r"p95=\d+\.\d+s\)", lat_lines[-1]), lat_lines[-1]
    stats = request(sock, {"cmd": "stats"})
    assert stats["requests"] == 4
    assert 0 < stats["p50_s"] <= stats["p95_s"]
    assert request(sock, {"cmd": "shutdown"})["bye"]
    t.join(timeout=10)
