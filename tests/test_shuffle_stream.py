"""FrameShuffleStream: the reference DataLoader's shuffle=True /
num_workers semantics (dino-main/main_dino.py:351-359) over sequential
video decode sources."""

import threading
import time

import numpy as np
import pytest

from sais_tpu.io.shuffle_stream import FrameShuffleStream


def _const_source(tag, n, h=8, w=8):
    def it():
        for i in range(n):
            f = np.zeros((h, w, 3), np.uint8)
            f[0, 0, 0] = tag
            f[0, 0, 1] = i % 256
            f[0, 1, 0] = i // 256
            yield f
    return it


def _ids(batch):
    return {(int(f[0, 0, 0]), int(f[0, 1, 0]) * 256 + int(f[0, 0, 1]))
            for f in batch}


def test_each_frame_exactly_once_per_epoch():
    sources = [_const_source(t, 37) for t in range(1, 6)]   # 185 frames
    stream = FrameShuffleStream(sources, batch_size=16, buffer_frames=64,
                                workers=3, seed=0)
    seen = []
    for batch in stream.batches(drop_last=False):
        assert batch.shape[1:] == (8, 8, 3)
        seen.extend(_ids(batch))
    assert len(seen) == 185
    assert len(set(seen)) == 185          # no dupes, nothing dropped


def test_drop_last_drops_only_global_tail():
    sources = [_const_source(t, 37) for t in range(1, 6)]   # 185 = 11*16+9
    stream = FrameShuffleStream(sources, batch_size=16, buffer_frames=512,
                                workers=2, seed=1)
    batches = list(stream.batches(drop_last=True))
    assert all(b.shape[0] == 16 for b in batches)
    assert len(batches) == 185 // 16      # per-VIDEO drop would lose 5x5


def test_batches_mix_sources():
    """Consecutive same-video frames must not dominate a batch — the
    whole point vs the old sequential per-video loop."""
    sources = [_const_source(t, 64) for t in (1, 2)]
    stream = FrameShuffleStream(sources, batch_size=16, buffer_frames=128,
                                workers=2, seed=0)
    batches = list(stream.batches())
    mixed = sum(1 for b in batches
                if len({tag for tag, _ in _ids(b)}) > 1)
    assert mixed >= len(batches) // 2, (mixed, len(batches))


def test_mixed_resolutions_never_batch_together():
    sources = [_const_source(1, 40, 8, 8), _const_source(2, 40, 8, 12)]
    stream = FrameShuffleStream(sources, batch_size=8, buffer_frames=16,
                                workers=2, seed=0)
    for batch in stream.batches(drop_last=False):
        assert len({f.shape for f in batch}) == 1
        tags = {tag for tag, _ in _ids(batch)}
        assert len(tags) == 1             # resolution == source here


def test_no_partial_batches_mid_stream():
    """With many sub-batch resolution groups the reservoir grows past the
    soft cap instead of emitting partial batches (a varying batch dim
    would recompile the jitted step per size and break dp sharding)."""
    sources = [_const_source(t, 12, 8, 8 + t) for t in range(1, 6)]
    stream = FrameShuffleStream(sources, batch_size=16, buffer_frames=16,
                                workers=2, seed=0)
    full = list(stream.batches(drop_last=True))
    assert full == []                     # every group < 16 frames
    sources = [_const_source(t, 12, 8, 8 + t) for t in range(1, 6)]
    stream = FrameShuffleStream(sources, batch_size=16, buffer_frames=16,
                                workers=2, seed=0)
    tails = list(stream.batches(drop_last=False))
    assert len(tails) == 5                # one tail per resolution, at END
    assert {b.shape[0] for b in tails} == {12}


def test_worker_error_surfaces_promptly():
    """A dead worker aborts the epoch within one queue round trip — not
    after the remaining workers drain every other source."""
    def bad():
        raise RuntimeError("decoder died")
        yield  # pragma: no cover

    def slow(tag, n):
        def it():
            for i in range(n):
                time.sleep(0.01)           # ~100 s per source if drained
                f = np.zeros((8, 8, 3), np.uint8)
                f[0, 0, 0] = tag
                yield f
        return it

    stream = FrameShuffleStream([bad, slow(1, 10_000), slow(2, 10_000)],
                                batch_size=8, buffer_frames=1 << 20,
                                workers=3, seed=0)
    t0 = time.time()
    with pytest.raises(RuntimeError, match="decoder died"):
        for _ in stream.batches(drop_last=False):
            pass
    assert time.time() - t0 < 20


def test_worker_error_propagates():
    def bad():
        yield np.zeros((8, 8, 3), np.uint8)
        raise RuntimeError("decoder died")

    stream = FrameShuffleStream([bad], batch_size=4, buffer_frames=8,
                                workers=1, seed=0)
    with pytest.raises(RuntimeError, match="decoder died"):
        list(stream.batches(drop_last=False))


def test_early_exit_reaps_workers():
    sources = [_const_source(t, 500) for t in range(1, 5)]
    before = threading.active_count()
    stream = FrameShuffleStream(sources, batch_size=8, buffer_frames=32,
                                workers=4, seed=0)
    for batch in stream.batches():
        break                              # consumer walks away mid-epoch
    stream.close()
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_transform_applied_on_worker():
    stream = FrameShuffleStream([_const_source(1, 20)], batch_size=5,
                                buffer_frames=8, workers=1, seed=0,
                                transform=lambda f: f[:4, :4])
    for batch in stream.batches(drop_last=False):
        assert batch.shape[1:] == (4, 4, 3)


def test_single_pass_guard():
    stream = FrameShuffleStream([_const_source(1, 8)], batch_size=4,
                                buffer_frames=8, workers=1, seed=0)
    list(stream.batches(drop_last=False))
    with pytest.raises(RuntimeError, match="single-pass"):
        next(stream.batches())
