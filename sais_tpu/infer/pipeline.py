"""End-to-end gesture decoding pipeline (the reference main.sh path).

Stage layout mirrors SAIS/main.sh but pipelined on one process instead of six
OS processes communicating through the filesystem:

  decode (host, OpenCV thread) ==> preprocess+ViT (TPU) ==> feature store
  windows (host index math)    ==> temporal+prototypes (TPU, 3 TTA variants)
  ==> TTA/fold ensembling ==> post-processing ==> gestures CSV

Device work is double-buffered against host decode: batches are enqueued
from a producer thread while the previous batch computes (XLA's async
dispatch keeps the TPU busy).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from sais_tpu.config import PipelineConfig
from sais_tpu.data.windows import (TTABatch, build_tta_batches,
                                   build_window_manifest)
from sais_tpu.infer.postprocess import decode_gesture_intervals, ensemble_probs
from sais_tpu.io.video import VideoReader
from sais_tpu.models.full_model import prototypes_forward
from sais_tpu.models.heads import prototype_probs
from sais_tpu.models.vit import vit_features
from sais_tpu.ops.preprocess import preprocess_batch


def fetch_all(arrs: Sequence[jax.Array]) -> List[np.ndarray]:
    """Fetch a list of device arrays with the host copies started
    concurrently before any blocking read.

    A sequential `np.asarray` per array pays one full device->host
    transfer round trip each (~33 ms through a remote tunnel, and even
    locally one PCIe queue drain per array); `copy_to_host_async` first
    overlaps all transfers so the total cost is ~one round trip plus
    bandwidth."""
    for a in arrs:
        try:
            a.copy_to_host_async()
        except AttributeError:     # plain numpy (CPU jax) — already host
            pass
    return [np.asarray(a) for a in arrs]


def _reap_producer(t: threading.Thread, q: "queue.Queue",
                   stop: Optional[threading.Event] = None) -> None:
    """Join a bounded-queue producer even when the consumer aborted
    mid-stream (device OOM, dispatch failure): a producer blocked in
    q.put on the full queue would otherwise leak the thread AND its open
    decoder handle for the life of the process — fatal for the serve
    daemon, which survives per-request failures and would accumulate one
    stuck thread + capture FD per failing request.  `stop` tells the
    producer to abandon the remaining video (without it the reap would
    sit here discarding a full decode of a multi-hour case before the
    caller can report its error); draining unblocks any in-flight put,
    and the producer's own finally enqueues its sentinel."""
    if stop is not None:
        stop.set()
    while t.is_alive():
        try:
            q.get(timeout=0.1)
        except queue.Empty:
            pass
    t.join()


def _put_stoppable(q: "queue.Queue", item,
                   stop: threading.Event) -> bool:
    """Bounded put that gives up when the consumer stopped; returns
    False on abandonment so the producer can exit its decode loop."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            continue
    return False


class _HostStream:
    """A RUNNING host decode of one video: the producer (C++ pump or
    python OpenCV thread) is already filling its bounded buffer.

    Decouples starting the host decode from running the device pass so
    the serve daemon can overlap request B's decode with request A's
    device compute (the reference's DataLoader worker prefetch analogue,
    generate_datasets.py-era CPU pipeline; SURVEY §2.2 PP row).  Always
    close(): it reaps the producer thread and its decoder handle."""

    def __init__(self, batches, fn, close, error: Optional[List] = None):
        self.batches = batches        # iterator of uint8 frame batches
        self.fn = fn                  # device fn matching the layout
        self._close = close
        self._error = error           # producer exception, surfaced late

    def close(self) -> None:
        self._close()

    def raise_if_failed(self) -> None:
        if self._error:
            raise self._error[0]


class FeatureExtractor:
    """Batched DINO feature extraction on device — the reference's hot loop
    (extract_representations.py:351-378) redesigned for TPU throughput."""

    def __init__(self, vit_params, cfg: PipelineConfig, batch_size: int = 256,
                 use_native_decode: bool = True,
                 exact_preprocess: bool = False,
                 mesh: Optional["jax.sharding.Mesh"] = None):
        """exact_preprocess: preprocess on the host through PIL, then run
        the ViT on device over the normalized floats.  Since round 3 the
        DEFAULT device path resamples bit-identically to PIL
        (ops/preprocess.resize_pil_exact), so this mode only differs in
        the float normalize rounding (f64 numpy vs f32 on device,
        ulp-level); it remains for oracle-style validation.

        mesh: optional device mesh — frame batches are sharded over every
        mesh device (data parallelism for the pipeline's dominant FLOPs,
        SURVEY §2.2: the reference's dead DDP scaffolding made real).  Each
        device runs the full per-shard forward (fused Pallas path included)
        via shard_map; no collectives are needed."""
        from sais_tpu.ops.preprocess import normalize_batch
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            ndev = mesh.devices.size
            batch_size = max(ndev, batch_size - batch_size % ndev)
        self.batch_size = batch_size
        self.use_native_decode = use_native_decode and not exact_preprocess
        self.exact_preprocess = exact_preprocess
        compute = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        def _fn_device(params, frames_u8):
            x = preprocess_batch(frames_u8, cfg.preprocess, dtype=compute)
            return vit_features(params, x, cfg.vit, compute_dtype=compute,
                                allow_fused=True)

        def _fn_pre(params, frames_u8):
            x = normalize_batch(frames_u8, cfg.preprocess, dtype=compute)
            return vit_features(params, x, cfg.vit, compute_dtype=compute,
                                allow_fused=True)

        def _fn_float(params, frames_f32):
            return vit_features(params, frames_f32.astype(compute), cfg.vit,
                                compute_dtype=compute, allow_fused=True)

        def _jit(fn):
            if mesh is None:
                return jax.jit(fn)
            from jax.sharding import PartitionSpec as P
            # batch dim sharded over EVERY mesh axis jointly (a tuple in
            # one PartitionSpec slot = joint sharding of that dim)
            spec = P(tuple(mesh.axis_names))
            return jax.jit(jax.shard_map(fn, mesh=mesh,
                                         in_specs=(P(), spec),
                                         out_specs=spec, check_vma=False))

        self._fn_device = _jit(_fn_device)
        self._fn_pre = _jit(_fn_pre)
        self._fn_float = _jit(_fn_float)
        if exact_preprocess:
            from sais_tpu.ops.preprocess import preprocess_reference_host

            def _fn(params, frames_u8):
                host = preprocess_reference_host(np.asarray(frames_u8),
                                                 cfg.preprocess)
                return self._fn_float(params, jnp.asarray(host))

            self._fn = _fn
        else:
            self._fn = self._fn_device
        self._params = vit_params

    def extract_array(self, frames_u8: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8 -> (N, D) float32 CLS features."""
        n = frames_u8.shape[0]
        out: List[Tuple[jax.Array, int]] = []
        for i in range(0, n, self.batch_size):
            chunk = frames_u8[i:i + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            # dispatch only — a blocking fetch here would stall both the
            # dispatch pipeline and the device between batches
            out.append((self._fn(self._params, chunk),
                        self.batch_size - pad))
        if not out:
            return np.zeros((0, self.cfg.vit.embed_dim), np.float32)
        hosts = fetch_all([f for f, _ in out])
        return np.concatenate([h[:k] for h, (_, k) in zip(hosts, out)])

    def open_stream(self, video_path: str, prefetch: int = 4):
        """Start host decode NOW and return the running stream.

        The producer (C++ pump thread or python OpenCV thread) begins
        filling its bounded buffer immediately, so a caller that cannot
        use the device yet — e.g. the serve daemon holding request B
        while request A owns the decode lock — still makes host-side
        progress; when the device frees up, extract_video(stream=...)
        consumes the already-buffered frames.  Memory stays bounded by
        the pump's queue_cap / the python queue's `prefetch` batches.
        """
        import os
        if not os.path.exists(video_path):
            raise FileNotFoundError(video_path)
        if self.use_native_decode:
            # only pump CONSTRUCTION falls back (native lib unavailable /
            # container unopenable); a mid-stream decode failure must
            # propagate like the python path's producer_error — silently
            # re-decoding a corrupt video with OpenCV could return
            # truncated features and quietly shorter gesture CSVs
            try:
                from sais_tpu.io.native_loader import NativeFramePump
                pump = NativeFramePump(
                    video_path, out_size=self.cfg.preprocess.resize,
                    crop_h_frac=self.cfg.preprocess.crop_height_frac,
                    crop_w_frac=self.cfg.preprocess.crop_width_frac,
                    queue_cap=4 * self.batch_size)
            except RuntimeError:
                pump = None  # python decode path below
            if pump is not None:
                return _HostStream(pump.batches(self.batch_size),
                                   self._fn_pre, pump.close)

        q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize=prefetch)
        producer_error: List[BaseException] = []
        stop = threading.Event()

        def producer():
            try:
                with VideoReader(video_path) as r:
                    for batch in r.batches(self.batch_size):
                        if not _put_stoppable(q, batch, stop):
                            return   # consumer aborted; skip the rest
            except BaseException as e:  # surface decode failures to the
                producer_error.append(e)  # consumer instead of fake EOF
            finally:
                _put_stoppable(q, None, stop)   # EOF sentinel (skipped
                # when the reaper already stopped us — it drains instead)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        def gen():
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch

        return _HostStream(gen(), self._fn,
                           lambda: _reap_producer(t, q, stop),
                           producer_error)

    def extract_video(self, video_path: str, prefetch: int = 4,
                      stream=None) -> np.ndarray:
        """Stream a video file: decode on a producer thread, compute on
        device, overlap via a bounded queue.

        Prefers the native frame_pump loader (C++ decode + crop/resize on a
        background thread, 224x224 uint8 over PCIe); falls back to python
        OpenCV decode with on-device crop/resize.  `stream`: a handle from
        open_stream(video_path) whose host decode is already running; the
        stream is consumed and closed either way.
        """
        if stream is None:
            stream = self.open_stream(video_path, prefetch)
        try:
            out = self._drain(stream.batches, stream.fn)
        finally:
            stream.close()
        stream.raise_if_failed()
        return out

    def _drain(self, batches, fn) -> np.ndarray:
        outs: List[Tuple[jax.Array, int]] = []
        for batch in batches:
            n = batch.shape[0]
            if n < self.batch_size:
                batch = np.concatenate(
                    [batch,
                     np.zeros((self.batch_size - n,) + batch.shape[1:],
                              batch.dtype)])
            # async dispatch: don't block; keep the decode queue draining
            outs.append((fn(self._params, batch), n))
        if not outs:
            return np.zeros((0, self.cfg.vit.embed_dim), np.float32)
        hosts = fetch_all([f for f, _ in outs])
        return np.concatenate([h[:n] for h, (_, n) in zip(hosts, outs)])


class FlowExtractor:
    """Motion-stream features: RAFT flow over frame pairs -> flow RGB ->
    DINO reps (reference stages 3+5b: extract_representations.py
    --optical_flow then --optical_flow_to_reps, collapsed into one pass
    with no JPEG round-trip)."""

    def __init__(self, raft_params, vit_params, cfg: PipelineConfig,
                 pair_batch: Optional[int] = None,
                 iters: Optional[int] = None,
                 flow_resize: Optional[Tuple[int, int]] = None,
                 mesh: Optional["jax.sharding.Mesh"] = None):
        """flow_resize: optional (H, W) to resize frames before RAFT — the
        reference's CinVivo policy for oversized inputs (216x384,
        extract_representations.py:122-123).

        mesh: optional device mesh — pair batches shard over all devices
        (each chip runs its own RAFT shard; the per-chip sweet spot of 8
        pairs scales to 8*ndev per dispatch)."""
        from sais_tpu.models.raft import (pad_to_multiple_of_8, raft_forward,
                                          unpad)
        self.cfg = cfg
        self.mesh = mesh
        self._ndev = 1 if mesh is None else mesh.devices.size
        self.pair_batch = pair_batch  # None -> sized per resolution below
        if pair_batch is not None and mesh is not None:
            self.pair_batch = max(self._ndev,
                                  pair_batch - pair_batch % self._ndev)
        self.flow_resize = flow_resize
        self._unpad = unpad
        self._pad = pad_to_multiple_of_8
        iters = cfg.raft.iters if iters is None else iters
        raft_cfg = cfg.raft
        # bf16 feature/context encoders when the pipeline computes in bf16
        # (halves encoder HBM traffic: 4.04 -> 3.71 ms/pair measured on
        # v5e at 240x320 b8); parity/float32 configs keep f32 throughout
        raft_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                      else jnp.float32)

        def _flow(params, i1, i2):
            return raft_forward(params, i1, i2, raft_cfg, iters=iters,
                                compute_dtype=raft_dtype)

        if mesh is None:
            self._flow_fn = jax.jit(_flow)
        else:
            from jax.sharding import PartitionSpec as P
            spec = P(tuple(mesh.axis_names))
            self._flow_fn = jax.jit(jax.shard_map(
                _flow, mesh=mesh, in_specs=(P(), spec, spec),
                out_specs=spec, check_vma=False))
        self._raft_params = raft_params
        self._features = FeatureExtractor(vit_params, cfg, batch_size=64,
                                          mesh=mesh)

        # Fully fused dual-stream step: RAFT -> device flow->RGB rendering
        # -> PIL-exact preprocess -> ViT in ONE program.  The staged path
        # fetches every flow field to host, renders with numpy, and
        # re-uploads the RGB (a ~7 MB round trip per 8-pair chunk that
        # costs ~0.5 s through a remote tunnel); this keeps the whole
        # chunk on device.  Used by extract_video unless the caller needs
        # the rendered JPEGs (save_flow_dir).
        from sais_tpu.ops.flow_viz import flow_to_rgb_device
        from sais_tpu.models.vit import vit_features
        from sais_tpu.ops.preprocess import preprocess_batch
        compute = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                   else jnp.float32)
        vit_cfg = cfg.vit
        pre_cfg = cfg.preprocess

        def _fused(rparams, vparams, i1, i2):
            p1, pads = pad_to_multiple_of_8(i1.astype(jnp.float32))
            p2, _ = pad_to_multiple_of_8(i2.astype(jnp.float32))
            flow = raft_forward(rparams, p1, p2, raft_cfg, iters=iters,
                                compute_dtype=raft_dtype)
            rgb = flow_to_rgb_device(unpad(flow, pads))
            x = preprocess_batch(rgb, pre_cfg, dtype=compute)
            return vit_features(vparams, x, vit_cfg, compute_dtype=compute,
                                allow_fused=True)

        if mesh is None:
            self._fused_fn = jax.jit(_fused)
        else:
            from jax.sharding import PartitionSpec as P
            spec = P(tuple(mesh.axis_names))
            self._fused_fn = jax.jit(jax.shard_map(
                _fused, mesh=mesh, in_specs=(P(), P(), spec, spec),
                out_specs=spec, check_vma=False))

    def auto_pair_batch(self, height: int, width: int) -> int:
        """Resolution/mesh-aware RAFT pair batch (the caller's explicit
        pair_batch wins).  All-pairs correlation is O((HW/64)^2) per pair;
        the batch is sized so the f32 level-0 volume stays under ~2 GB of
        HBM, capped at 8 PER CHIP: measured ms/pair on v5e at 240x320 is
        8.6/6.7/4.96/8.1/7.4 for b=2/4/8/12/16 — per-pair cost cliffs
        above 8 (XLA tiling of the lookup spills) and never amortizes
        further."""
        if self.pair_batch is not None:
            return self.pair_batch
        hw8 = (height // 8) * (width // 8)
        return max(1, min(8, int(2e9 / max(hw8 * hw8 * 4, 1)))) * self._ndev

    def flow_fields(self, frames: np.ndarray) -> np.ndarray:
        """frames: (N, H, W, 3) uint8 -> (P, H, W, 2) flow for pairs
        (i, i+jump) at stride jump (generate_paths.py:43-54 pairing)."""
        jump = self.cfg.window.flow_jump_factor
        n = frames.shape[0]
        if self.flow_resize is not None:
            import cv2
            h, w = self.flow_resize
            frames = np.stack([cv2.resize(f, (w, h)) for f in frames])
        starts = np.arange(0, n - jump, jump)
        pair_batch = self.auto_pair_batch(frames.shape[1], frames.shape[2])
        flows: List[np.ndarray] = []
        # keep a few chunks in flight: per-chunk blocking fetches would
        # idle the device one transfer round trip per batch, but deferring
        # every fetch would hold all (P, H, W, 2) fields in HBM
        inflight: List[Tuple[jax.Array, int]] = []

        def drain(target: int) -> None:
            while len(inflight) > target:
                f, k = inflight.pop(0)
                flows.append(np.asarray(f)[:k])

        for i in range(0, len(starts), pair_batch):
            chunk = starts[i:i + pair_batch]
            n = len(chunk)
            if n < pair_batch:
                # pad the tail chunk to the full batch on single chip too:
                # a fresh tail shape costs one extra XLA compile (20-180 s
                # through a remote-compile tunnel) for a few pairs of work
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pair_batch - n)])
            i1 = frames[chunk]
            i2 = frames[chunk + jump]
            p1, pads = self._pad(jnp.asarray(i1, jnp.float32))
            p2, _ = self._pad(jnp.asarray(i2, jnp.float32))
            flow = self._unpad(self._flow_fn(self._raft_params, p1, p2),
                               pads)
            try:
                flow.copy_to_host_async()
            except AttributeError:
                pass
            inflight.append((flow, n))
            drain(4)
        drain(0)
        return (np.concatenate(flows) if flows
                else np.zeros((0,) + frames.shape[1:3] + (2,), np.float32))

    def extract(self, frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(N, H, W, 3) uint8 video frames -> (flow_reps (P, D), flow RGB
        uint8 (P, H, W, 3))."""
        from sais_tpu.ops.flow_viz import flow_to_rgb_uint8
        fields = self.flow_fields(frames)
        rgb = np.stack([flow_to_rgb_uint8(f) for f in fields]) if len(fields) \
            else np.zeros((0,) + frames.shape[1:3] + (3,), np.uint8)
        reps = self._features.extract_array(rgb)
        return reps, rgb

    def extract_video(self, video_path: str, prefetch: int = 8,
                      frame_source=None,
                      save_flow_dir: Optional[str] = None) -> np.ndarray:
        """Streaming dual-stream extraction: decode -> RAFT -> flow RGB ->
        DINO reps without ever materializing the video in host RAM.

        The reference streams frame pairs through a dataloader
        (extract_representations.py:145-176); a multi-hour 1080p case would
        otherwise need ~TBs of host RAM.  Here a producer thread decodes
        sequentially and keeps only every jump-th frame (the reference's
        generate_paths.py:43-62 pairing (i, i+jump) at stride jump means
        consecutive sampled frames form exactly the pair list); pairs flow
        through a bounded queue, so peak residency is
        O(prefetch + pair_batch) frames regardless of video length.

        frame_source: optional iterator of (H, W, 3) uint8 frames (tests /
        alternate decoders); defaults to VideoReader(video_path).
        """
        from sais_tpu.ops.flow_viz import flow_to_rgb_uint8

        import os
        if frame_source is None and not os.path.exists(video_path):
            raise FileNotFoundError(video_path)
        jump = self.cfg.window.flow_jump_factor
        q: "queue.Queue[Optional[Tuple[np.ndarray, np.ndarray]]]" = \
            queue.Queue(maxsize=prefetch)
        producer_error: List[BaseException] = []
        stop = threading.Event()

        def producer():
            prev = None
            try:
                if frame_source is not None:
                    frames_iter = iter(frame_source)
                    ctx = None
                else:
                    ctx = VideoReader(video_path)
                    frames_iter = ctx.frames()
                try:
                    for i, frame in enumerate(frames_iter):
                        if i % jump:
                            continue
                        if self.flow_resize is not None:
                            import cv2
                            h, w = self.flow_resize
                            frame = cv2.resize(frame, (w, h))
                        if prev is not None:
                            if not _put_stoppable(q, (prev, frame), stop):
                                return   # consumer aborted; skip the rest
                        prev = frame
                finally:
                    if ctx is not None:
                        ctx.close()
            except BaseException as e:  # re-raised in the consumer: a decode
                producer_error.append(e)  # failure must not look like EOF
            finally:
                _put_stoppable(q, None, stop)   # EOF sentinel

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        reps_out: List[np.ndarray] = []
        fused_out: List[Tuple[jax.Array, int]] = []
        n_saved = 0
        self.peak_buffered_pairs = 0
        pair_batch = self.pair_batch
        done = False
        buf1: List[np.ndarray] = []
        buf2: List[np.ndarray] = []
        try:
            while not done:
                item = q.get()
                if item is None:
                    done = True
                else:
                    buf1.append(item[0])
                    buf2.append(item[1])
                if buf1 and (done or len(buf1) == (pair_batch
                                                   or 8 * self._ndev)):
                    i1 = np.stack(buf1)
                    i2 = np.stack(buf2)
                    self.peak_buffered_pairs = max(self.peak_buffered_pairs,
                                                   len(buf1))
                    buf1, buf2 = [], []
                    if pair_batch is None:
                        pair_batch = self.auto_pair_batch(i1.shape[1],
                                                          i1.shape[2])
                    for s in range(0, len(i1), pair_batch):
                        a_np = i1[s:s + pair_batch]
                        b_np = i2[s:s + pair_batch]
                        n = a_np.shape[0]
                        if n < pair_batch:
                            # tail padded on single chip too — one compiled
                            # RAFT shape per resolution regardless of length
                            npad = pair_batch - n
                            a_np = np.concatenate(
                                [a_np, np.repeat(a_np[-1:], npad, axis=0)])
                            b_np = np.concatenate(
                                [b_np, np.repeat(b_np[-1:], npad, axis=0)])
                        a = jnp.asarray(a_np, jnp.float32)
                        b = jnp.asarray(b_np, jnp.float32)
                        if save_flow_dir is None:
                            # fused on-device RAFT -> render -> preprocess ->
                            # ViT (no flow-field round trip to host); fetch is
                            # deferred so the dispatch pipeline never stalls on
                            # a per-chunk transfer round trip (reps are tiny)
                            reps = self._fused_fn(self._raft_params,
                                                  self._features._params, a, b)
                            try:
                                reps.copy_to_host_async()
                            except AttributeError:
                                pass
                            fused_out.append((reps, n))
                            continue
                        p1, pads = self._pad(a)
                        p2, _ = self._pad(b)
                        flow = np.asarray(self._unpad(
                            self._flow_fn(self._raft_params, p1, p2), pads))[:n]
                        rgb = np.stack([flow_to_rgb_uint8(f) for f in flow])
                        if save_flow_dir is not None:
                            # reference saveFlows layout: flows_%08d.jpg
                            # numbered by pair index = frame // jump
                            # (extract_representations.py:254-262,
                            # generate_paths.py:64-69); PIL writer for
                            # byte-comparable JPEGs
                            from PIL import Image
                            import os as _os
                            _os.makedirs(save_flow_dir, exist_ok=True)
                            for im in rgb:
                                Image.fromarray(im).save(_os.path.join(
                                    save_flow_dir,
                                    f"flows_{n_saved:08d}.jpg"))
                                n_saved += 1
                        reps_out.append(self._features.extract_array(rgb))
        finally:
            _reap_producer(t, q, stop)
        if producer_error:
            raise producer_error[0]
        if fused_out:
            hosts = fetch_all([r for r, _ in fused_out])
            reps_out.extend(h[:n] for h, (_, n) in zip(hosts, fused_out))
        if not reps_out:
            return np.zeros((0, self.cfg.vit.embed_dim), np.float32)
        return np.concatenate(reps_out)


class GestureDecoder:
    """Sliding-window gesture inference with TTA + fold ensembling +
    post-processing (reference stages 5-6: run_experiments.py --inference
    then process_inference_results.py)."""

    # partial final chunks pad up to the next of these window counts
    # instead of the full device_batch: a 120-window minute-long video
    # uploads and computes 128 padded windows, not 512.  Each bucket is
    # one extra compiled temporal shape, reused across videos — so on
    # videos LONGER than device_batch a bucket is only used once its
    # shape is warm (see _chunk_batch); serve's warmup pre-compiles all
    # of them, one-shot CLI decodes never pay a tail-only compile.
    TAIL_BUCKETS = (32, 64, 128, 256)

    def __init__(self, fold_params: Sequence[Tuple[dict, jnp.ndarray]],
                 cfg: PipelineConfig, device_batch: int = 512,
                 seq_mesh=None):
        """fold_params: per fold, (full_model param pytree, (P, 256)
        prototype matrix).

        seq_mesh: optional mesh with a 'seq' axis — the temporal encoder
        then runs SEQUENCE-PARALLEL ring attention (parallel/sequence.py),
        sharding each window's time axis across the mesh for step windows
        too long for one chip's attention (SURVEY §5.7).  The attention
        artifact becomes the CLS row, same as the flash path.
        """
        self.cfg = cfg
        self.folds = list(fold_params)
        self.device_batch = device_batch

        mcfg = cfg.model
        if seq_mesh is not None:
            if mcfg.temporal.use_flash is False:
                # --flash off promises the reference's FULL (L, L)
                # attention-artifact layout (cli/main.py --flash help);
                # sequence parallelism exists precisely to never
                # materialize that matrix, so honor the contract loudly
                raise ValueError(
                    "seq_mesh with use_flash=False (--flash off): "
                    "sequence parallelism only exports the CLS-row "
                    "attention artifact, which --flash off promises not "
                    "to do; drop --flash off or --seq-parallel")
            from sais_tpu.parallel.sequence import \
                seq_parallel_prototypes_forward

            def _fwd(params, rgb, rgb_mask, flow, flow_mask):
                return seq_parallel_prototypes_forward(
                    params, mcfg, rgb, rgb_mask, flow, flow_mask,
                    mesh=seq_mesh)
        else:
            def _fwd(params, rgb, rgb_mask, flow, flow_mask):
                return prototypes_forward(params, mcfg, rgb, rgb_mask,
                                          flow, flow_mask)

        def _fn(params, protos, rgb, rgb_mask, flow, flow_mask):
            out = _fwd(params, rgb, rgb_mask, flow, flow_mask)
            return prototype_probs(out.video_rep, protos), out.attn

        def _artifact_fn(params, protos, rgb, rgb_mask, flow, flow_mask):
            out = _fwd(params, rgb, rgb_mask, flow, flow_mask)
            return (out.video_rep, prototype_probs(out.video_rep, protos),
                    out.attn)

        self._fn = jax.jit(_fn)
        self._artifact_fn = jax.jit(_artifact_fn)
        # (padded_windows, frames_per_window) shapes already dispatched at
        # least once (= compiled); filled by real dispatches, so serve's
        # warmup marks every bucket x TTA combination warm
        self._warm_buckets: set = set()

    def _chunk_batch(self, n: int, total: int, fpw) -> int:
        """Padded size for a chunk of n windows (total = windows in the
        variant, fpw = (program tag, frames-per-window) shape key — the
        probs and artifact paths compile separate programs, so warmth is
        tracked per program).  A tail bucket only pays when
        its compile is already warm: on a video longer than device_batch
        the full-batch shape is compiled by the preceding chunks anyway,
        so a cold tail bucket would ADD one XLA compile (tens of seconds
        through a remote-compile tunnel) to save milliseconds of padded
        compute.  Short videos (total <= bucket) compile exactly one
        shape either way, and the bucket is the cheaper one."""
        b = self.device_batch
        for cand in self.TAIL_BUCKETS:
            if n <= cand < self.device_batch:
                b = cand
                break
        if (b != self.device_batch and total > self.device_batch
                and (b, fpw) not in self._warm_buckets):
            return self.device_batch
        return b

    def _run_batch(self, params, protos, tta: TTABatch) -> np.ndarray:
        """Chunked, padded execution of one TTA variant -> (W, P) probs."""
        w = tta.rgb.shape[0]
        # compile-shape key: frames-per-window of BOTH streams (shape[1]
        # is the snippet dim, always 1)
        fpw = (tta.rgb.shape[2], tta.flow.shape[2])
        bs = self.device_batch
        pending: List[Tuple[jax.Array, int]] = []
        for i in range(0, w, bs):
            sl = slice(i, min(i + bs, w))
            n = sl.stop - sl.start
            psize = self._chunk_batch(n, w, ("p", fpw))
            pad = psize - n
            if psize < bs:
                self._warm_buckets.add((psize, ("p", fpw)))

            def padded(a):
                if pad == 0:
                    return a[sl]
                reps = np.concatenate(
                    [a[sl], np.repeat(a[sl][-1:], pad, axis=0)])
                return reps

            probs, _ = self._fn(params, protos,
                                jnp.asarray(padded(tta.rgb)),
                                jnp.asarray(padded(tta.rgb_mask)),
                                jnp.asarray(padded(tta.flow)),
                                jnp.asarray(padded(tta.flow_mask)))
            pending.append((probs, n))
        hosts = fetch_all([p for p, _ in pending])
        return np.concatenate([h[:n].astype(np.float64)
                               for h, (_, n) in zip(hosts, pending)])

    def _check_flow(self, rgb_reps: np.ndarray,
                    flow_reps: Optional[np.ndarray]) -> np.ndarray:
        """Refuse to fabricate a zero flow stream when the model config says
        Flow contributes: a zero-rep flow branch still adds CLS/pos-embedding
        features to the summed representation and silently skews probs."""
        if flow_reps is None:
            if "Flow" in self.cfg.model.modalities:
                raise ValueError(
                    f"model modalities={self.cfg.model.modalities!r} require "
                    "flow representations but none were supplied (flow store "
                    "missing?); run flow extraction or decode with -mod RGB")
            return np.zeros((1, rgb_reps.shape[1]), np.float32)
        return flow_reps

    def decode(self, video: str, rgb_reps: np.ndarray,
               flow_reps: Optional[np.ndarray]) -> pd.DataFrame:
        """Per-video window decode -> merged gesture interval table."""
        manifest = build_window_manifest(video, len(rgb_reps), self.cfg.window)
        if len(manifest) == 0:
            return pd.DataFrame()
        flow_reps = self._check_flow(rgb_reps, flow_reps)
        tta_batches = build_tta_batches(rgb_reps, flow_reps, manifest,
                                        self.cfg.window)
        fold_tta: List[List[np.ndarray]] = []
        for params, protos in self.folds:
            fold_tta.append([self._run_batch(params, protos, t)
                             for t in tta_batches])
        probs = ensemble_probs(fold_tta)
        return decode_gesture_intervals(probs, manifest.start_frames,
                                        manifest.end_frames, video,
                                        self.cfg.postprocess)

    def window_probs(self, video: str, rgb_reps: np.ndarray,
                     flow_reps: Optional[np.ndarray]) -> np.ndarray:
        """Ensembled per-window probabilities (pre post-processing)."""
        manifest = build_window_manifest(video, len(rgb_reps), self.cfg.window)
        if len(manifest) == 0:   # video shorter than one window
            return np.zeros((0, self.cfg.model.nclasses), np.float64)
        flow_reps = self._check_flow(rgb_reps, flow_reps)
        tta_batches = build_tta_batches(rgb_reps, flow_reps, manifest,
                                        self.cfg.window)
        fold_tta = [[self._run_batch(p, pr, t) for t in tta_batches]
                    for p, pr in self.folds]
        return ensemble_probs(fold_tta)

    def inference_artifacts(self, video: str, rgb_reps: np.ndarray,
                            flow_reps: Optional[np.ndarray],
                            fold: int = 0) -> Dict[str, object]:
        """Per-window reps/probs for all TTA augments plus the first
        augment's attention maps — the artifacts the reference persists per
        inference phase (train.py:113-119: reps_and_labels_<ph> with reps
        keyed by augment, attention_<ph>).

        Attention layout follows the encoder path: the dense encoder
        yields the reference's full (W, L, L) matrices; the flash path
        (TemporalConfig.use_flash, auto-on for long TPU sequences) yields
        the (W, L) CLS-query rows — the only rows SAIS consumes
        (prepare_model.py:221).  Force --flash off for full matrices."""
        manifest = build_window_manifest(video, len(rgb_reps), self.cfg.window)
        if len(manifest) == 0:   # video shorter than one window
            return {"reps": {}, "probs": {}, "attention": None,
                    "start_frames": manifest.start_frames,
                    "end_frames": manifest.end_frames, "videonames": []}
        flow_reps = self._check_flow(rgb_reps, flow_reps)
        tta_batches = build_tta_batches(rgb_reps, flow_reps, manifest,
                                        self.cfg.window)
        params, protos = self.folds[fold]
        reps: Dict[int, np.ndarray] = {}
        probs: Dict[int, np.ndarray] = {}
        attention = None
        for ti, tta in enumerate(tta_batches):
            w = tta.rgb.shape[0]
            fpw = (tta.rgb.shape[2], tta.flow.shape[2])
            bs = self.device_batch
            out_reps, out_probs, out_attn = [], [], []
            for i in range(0, w, bs):
                sl = slice(i, min(i + bs, w))
                n = sl.stop - sl.start
                psize = self._chunk_batch(n, w, ("a", fpw))
                pad = psize - n
                if psize < bs:
                    self._warm_buckets.add((psize, ("a", fpw)))

                def padded(a):
                    if pad == 0:
                        return a[sl]
                    return np.concatenate(
                        [a[sl], np.repeat(a[sl][-1:], pad, axis=0)])

                rep, p, attn = self._artifact_fn(
                    params, protos, jnp.asarray(padded(tta.rgb)),
                    jnp.asarray(padded(tta.rgb_mask)),
                    jnp.asarray(padded(tta.flow)),
                    jnp.asarray(padded(tta.flow_mask)))
                out_reps.append((rep, n))
                out_probs.append((p, n))
                if ti == 0:  # attention from the first augment only
                    out_attn.append((attn, n))
            fetched = fetch_all([a for a, _ in out_reps + out_probs
                                 + out_attn])
            hr = fetched[:len(out_reps)]
            hp = fetched[len(out_reps):len(out_reps) + len(out_probs)]
            ha = fetched[len(out_reps) + len(out_probs):]
            reps[ti] = (np.concatenate(
                [h[:n] for h, (_, n) in zip(hr, out_reps)])
                if out_reps else np.zeros((0,)))
            probs[ti] = (np.concatenate(
                [h[:n] for h, (_, n) in zip(hp, out_probs)])
                if out_probs else np.zeros((0,)))
            if ti == 0 and out_attn:
                attention = np.concatenate(
                    [h[:n] for h, (_, n) in zip(ha, out_attn)])
        return {"reps": reps, "probs": probs, "attention": attention,
                "start_frames": manifest.start_frames,
                "end_frames": manifest.end_frames, "videonames":
                [video] * len(manifest)}
