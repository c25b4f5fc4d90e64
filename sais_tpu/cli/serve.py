"""Long-lived decode service.

Keeps weights and compiled XLA programs resident so per-video latency is
pure compute (the CLI pays tens of seconds of compile per invocation; the
daemon pays it once).  Protocol: JSON lines over a Unix domain socket —

  request:  {"video": "<name>"}            # under <root>/videos/<name>.mp4
            {"video": "...", "flow": true} # dual-stream
            {"cmd": "ping"} | {"cmd": "shutdown"}
  response: {"ok": true, "csv": ..., "intervals": N, "seconds": t}
            {"ok": false, "error": "..."}
"""

from __future__ import annotations

import json
import os
import socket
import time
from typing import Optional


class DecodeService:
    def __init__(self, root: str, cfg, vit_params, folds,
                 raft_params=None, batch_size: int = 256,
                 exact_preprocess: bool = False, pair_batch=None,
                 flow_iters=None, mesh=None):
        from sais_tpu.infer.pipeline import (FeatureExtractor, FlowExtractor,
                                             GestureDecoder)
        self.root = root
        self.cfg = cfg
        self.extractor = FeatureExtractor(vit_params, cfg,
                                          batch_size=batch_size,
                                          exact_preprocess=exact_preprocess,
                                          mesh=mesh)
        self.flow = (FlowExtractor(raft_params, vit_params, cfg,
                                   pair_batch=pair_batch, iters=flow_iters,
                                   mesh=mesh)
                     if raft_params is not None else None)
        self.decoder = GestureDecoder(folds, cfg, device_batch=512)

    def warmup(self) -> None:
        """Compile ALL hot programs against dummy data — extractor AND the
        decode path (temporal + prototypes per TTA bucket), so the first
        real request pays pure compute, not XLA compiles."""
        import numpy as np
        frames = np.zeros((self.extractor.batch_size,
                           self.cfg.preprocess.resize,
                           self.cfg.preprocess.resize, 3), np.uint8)
        if self.extractor.use_native_decode:
            # pump path: preprocessed uint8 at the resize shape
            self.extractor._fn_pre(self.extractor._params, frames)
        if self.extractor.exact_preprocess:
            # exact mode: _fn = host-PIL resample -> _fn_float at the
            # preprocess size; this call warms _fn_float's real shape
            self.extractor._fn(self.extractor._params, frames)
        # default mode: _fn (device crop+resize) only runs on the python
        # decode FALLBACK, at the incoming video's NATIVE resolution —
        # unknowable here, so a preprocess-size compile of it would never
        # be reused (the pump path above is the one real requests take)
        # decode path: one window batch per TTA offset (F = 15/12/9 under
        # the default geometry) at the decoder's device_batch shape AND at
        # every tail bucket (short videos / final partial chunks pad to
        # these smaller shapes; each must be compiled before first use)
        d = self.cfg.model.rep_dim
        use_flow = "Flow" in self.cfg.model.modalities
        for wb in (self.decoder.device_batch, *self.decoder.TAIL_BUCKETS):
            reps = np.zeros((self.cfg.window.duration_frames
                             + (wb - 1) * self.cfg.window.hop_frames, d),
                            np.float32)
            flow = (np.zeros((max(len(reps)
                                  // self.cfg.window.flow_jump_factor, 1),
                              d), np.float32) if use_flow else None)
            self.decoder.window_probs("warmup", reps, flow)

    def warmup_flow(self, height: int, width: int) -> None:
        """Optionally pre-compile the fused dual-stream program (RAFT ->
        device viz -> ViT) for a known video resolution, so the first flow
        request pays no compile.  Not part of warmup(): flow shapes follow
        the incoming video and a speculative compile costs minutes."""
        if self.flow is None:
            return
        import jax.numpy as jnp
        # the exact batch the streaming path will dispatch at this
        # resolution (HBM-capped, mesh-aware) — a guessed batch would
        # compile a program extract_video never runs (or OOM at 1080p)
        pb = self.flow.auto_pair_batch(height, width)
        z = jnp.zeros((pb, height, width, 3), jnp.float32)
        self.flow._fused_fn(self.flow._raft_params, self.extractor._params,
                            z, z)

    def _video_path(self, video: str) -> str:
        # the name comes off the socket; reject anything that could escape
        # <root>/videos or <root>/results via path separators / '..'
        if os.path.basename(video) != video or video in ("", ".", ".."):
            raise ValueError(f"invalid video name: {video!r}")
        return os.path.join(self.root, "videos", video + ".mp4")

    def start_prefetch(self, video: str):
        """Begin HOST decode for a queued request while another request
        still owns the device: the producer thread fills its bounded
        buffer during the in-flight decode's device compute, so the
        queued request's device pass starts against hot frames.  Returns
        None instead of raising — a bad name/path surfaces its real error
        from decode_video, which this merely front-runs."""
        try:
            return self.extractor.open_stream(self._video_path(video))
        except Exception:
            return None

    def decode_video(self, video: str, use_flow: bool = False,
                     rgb_stream=None) -> dict:
        t0 = time.time()
        try:
            path = self._video_path(video)
        except Exception:
            if rgb_stream is not None:   # don't leak the producer thread
                rgb_stream.close()
            raise
        rgb = self.extractor.extract_video(path, stream=rgb_stream)
        flow_reps = None
        if use_flow and self.flow is not None:
            flow_reps = self.flow.extract_video(path)  # streaming, O(batch)
        df = self.decoder.decode(video, rgb, flow_reps)
        out = os.path.join(self.root, "results")
        os.makedirs(out, exist_ok=True)
        dest = os.path.join(out, f"{video}_gestures.csv")
        df.to_csv(dest)
        return {"ok": True, "csv": dest, "intervals": len(df),
                "frames": int(rgb.shape[0]),
                "seconds": round(time.time() - t0, 2)}


def _percentile(values, q: float) -> float:
    if not values:
        return 0.0
    s = sorted(values)
    i = min(int(q * (len(s) - 1) + 0.5), len(s) - 1)
    return s[i]


def serve(service: DecodeService, socket_path: str,
          log=print) -> None:
    """Accept loop with one worker thread per connection.

    Decode requests serialize behind a lock (one video pipeline on the
    chip at a time — concurrent decodes would interleave device batches
    without making anything faster), but `ping`/`stats`/`shutdown` answer
    immediately from any connection even while a decode is in flight,
    and ONE queued decode request pre-runs its HOST decode while waiting
    (bounded buffer), so back-to-back requests overlap B's CPU decode
    with A's device compute instead of paying the decodes serially.
    """
    import threading
    if os.path.exists(socket_path):
        os.unlink(socket_path)
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(socket_path)
    srv.listen(16)
    log(f"sais serve: listening on {socket_path}")
    stop = threading.Event()
    decode_lock = threading.Lock()
    # ONE queued request may pre-decode frames while the in-flight decode
    # owns the device (host decode ∥ device compute across requests);
    # bounding the slots caps the buffered-frame memory at one pump queue
    prefetch_slot = threading.Semaphore(1)
    # in-flight request accounting: shutdown must let a running decode
    # finish AND flush its response before the process exits (daemon
    # worker threads die with the process otherwise)
    active = [0]
    active_cv = threading.Condition()
    from collections import deque
    latencies: "deque" = deque(maxlen=10000)  # bounded: long-lived daemon
    lat_lock = threading.Lock()

    def handle(conn):
        try:
            with conn, conn.makefile("rw") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    with active_cv:
                        active[0] += 1
                    try:
                        req = json.loads(line)
                        if req.get("cmd") == "shutdown":
                            resp = {"ok": True, "bye": True}
                            stop.set()
                        elif req.get("cmd") == "ping":
                            resp = {"ok": True, "pong": True}
                        elif req.get("cmd") == "stats":
                            with lat_lock:
                                lat = sorted(latencies)
                            resp = {
                                "ok": True, "requests": len(lat),
                                "p50_s": round(_percentile(lat, 0.5), 3),
                                "p95_s": round(_percentile(lat, 0.95), 3),
                                "busy": decode_lock.locked()}
                        else:
                            # another decode in flight? start THIS
                            # request's host decode now — it buffers
                            # frames while the device is busy
                            stream = None
                            if (decode_lock.locked()
                                    and prefetch_slot.acquire(
                                        blocking=False)):
                                stream = service.start_prefetch(
                                    str(req.get("video", "")))
                                if stream is None:
                                    prefetch_slot.release()
                            kw = ({"rgb_stream": stream}
                                  if stream is not None else {})
                            try:
                                with decode_lock:
                                    resp = service.decode_video(
                                        req["video"],
                                        bool(req.get("flow", False)), **kw)
                            finally:
                                if stream is not None:
                                    prefetch_slot.release()
                            with lat_lock:
                                latencies.append(resp["seconds"])
                                lat = list(latencies)
                            # per-request latency line with running
                            # percentiles — the daemon's own SLO record
                            log(f"decode {req.get('video')}: "
                                f"{resp['seconds']:.2f}s (n={len(lat)} "
                                f"p50={_percentile(lat, 0.5):.2f}s "
                                f"p95={_percentile(lat, 0.95):.2f}s)")
                    except Exception as e:  # report, keep serving
                        resp = {"ok": False,
                                "error": f"{type(e).__name__}: {e}"}
                    try:
                        f.write(json.dumps(resp) + "\n")
                        f.flush()
                    finally:
                        with active_cv:
                            active[0] -= 1
                            active_cv.notify_all()
                    if stop.is_set():
                        break
        except OSError as e:
            # client vanished mid-request (timeout, Ctrl-C): the
            # long-lived daemon must survive BrokenPipe/ConnectionReset
            log(f"client connection error ({e}); still serving")

    srv.settimeout(0.25)   # poll the stop flag between accepts
    try:
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            threading.Thread(target=handle, args=(conn,),
                             daemon=True).start()
    finally:
        srv.close()
        # drain in-flight requests (a decode can run minutes) before the
        # process exit kills the daemon workers; idle connections blocked
        # on readline are NOT waited for — they hold no request
        with active_cv:
            active_cv.wait_for(lambda: active[0] == 0, timeout=900)
            if active[0]:
                log(f"shutdown with {active[0]} request(s) still in flight")
        if os.path.exists(socket_path):
            os.unlink(socket_path)


def request(socket_path: str, payload: dict, timeout: float = 600.0) -> dict:
    """One-shot client: send a request line, read the response line."""
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.settimeout(timeout)
    c.connect(socket_path)
    with c, c.makefile("rw") as f:
        f.write(json.dumps(payload) + "\n")
        f.flush()
        return json.loads(f.readline())
