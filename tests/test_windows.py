"""Window-sampling parity vs literal reference semantics
(prepare_dataset.py:1705-1728 manifest, :2642-2669 index math)."""

import numpy as np

from sais_tpu.config import WindowConfig
from sais_tpu.data.windows import (build_tta_batches, build_window_manifest,
                                   flow_indices_for, gather_reps,
                                   window_frame_indices)

CFG = WindowConfig()


def reference_window_rows(total_frames):
    """Literal transcription of the reference manifest construction."""
    duration_frames, hop_frames = 15, 15
    nsamples = (total_frames - duration_frames) // hop_frames + 1
    start = [n * hop_frames for n in range(nsamples)]
    end = [s + duration_frames for s in start]
    return start, end


def reference_indices(start_frame, end_frame, offset):
    startIdx, endIdx = start_frame - 1, end_frame - 1
    jump = (endIdx - startIdx) // 10
    return list(np.arange(startIdx + offset, endIdx, jump))


def test_manifest_matches_reference():
    for n in (15, 100, 1000, 37):
        m = build_window_manifest("v", n, CFG)
        s, e = reference_window_rows(n)
        assert m.start_frames.tolist() == s
        assert m.end_frames.tolist() == e


def test_frame_indices_match_reference_all_ttas():
    m = build_window_manifest("v", 120, CFG)
    for off in (0, 3, 6):
        ours = window_frame_indices(m, CFG, off)
        for w in range(len(m)):
            ref = reference_indices(m.start_frames[w], m.end_frames[w], off)
            assert ours[w].tolist() == ref, (off, w)
    # static lengths per TTA: 15 / 12 / 9
    assert window_frame_indices(m, CFG, 0).shape[1] == 15
    assert window_frame_indices(m, CFG, 3).shape[1] == 12
    assert window_frame_indices(m, CFG, 6).shape[1] == 9


def test_first_window_negative_index_wraps():
    m = build_window_manifest("v", 60, CFG)
    fi = window_frame_indices(m, CFG, 0)
    assert fi[0, 0] == -1
    reps = np.arange(60, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
    g = gather_reps(reps, fi)
    # -1 wraps to the last frame, exactly like reference video_reps[indices]
    assert g[0, 0, 0] == 59.0


def test_flow_indices_match_reference():
    m = build_window_manifest("v", 300, CFG)
    fi = window_frame_indices(m, CFG, 0)
    nflows = 19
    idx, valid = flow_indices_for(fi, nflows, CFG)
    for w in range(len(m)):
        ref = np.unique(fi[w] // 15)
        ref = [i for i in ref if i < nflows]
        got = idx[w][valid[w]].tolist()
        assert got == ref, w
    # window 0 includes the wrapped -1 flow index
    assert idx[0][valid[0]].tolist() == [-1, 0]


def test_tta_batches_layout_and_masks():
    rng = np.random.default_rng(0)
    rgb = rng.normal(size=(90, 8)).astype(np.float32)
    flow = rng.normal(size=(5, 8)).astype(np.float32)
    m = build_window_manifest("v", 90, CFG)
    batches = build_tta_batches(rgb, flow, m, CFG)
    assert len(batches) == 3
    b0 = batches[0]
    w = len(m)
    assert b0.rgb.shape == (w, 1, 15, 8)
    assert b0.rgb_mask.shape == (w, 1, 16)
    assert not b0.rgb_mask.any()  # all 15 frames valid in every window
    # flow content equals direct reference gather
    fi = window_frame_indices(m, CFG, 0)
    for i in range(w):
        ref_idx = np.unique(fi[i] // 15)
        ref_idx = ref_idx[ref_idx < len(flow)]
        valid = ~b0.flow_mask[i, 0, 1:]
        got = b0.flow[i, 0][valid]
        np.testing.assert_array_equal(got, flow[ref_idx])
    # masked flow slots are zeroed
    assert (b0.flow[~np.broadcast_to(
        (~b0.flow_mask[:, :, 1:, None]), b0.flow.shape)] == 0).all()


def test_window_and_flow_index_fuzz():
    """Random video lengths / flow-store sizes through the whole window
    index math vs the literal reference formulas (manifest rows, per-TTA
    stride sampling with the -1 wrap, unique//jump flow rows clipped to
    the store)."""
    rng = np.random.default_rng(5)
    for _ in range(200):
        n = int(rng.integers(15, 4000))
        m = build_window_manifest("v", n, CFG)
        s, e = reference_window_rows(n)
        assert m.start_frames.tolist() == s
        assert m.end_frames.tolist() == e
        off = int(rng.choice([0, 3, 6]))
        ours = window_frame_indices(m, CFG, off)
        for w in rng.choice(len(m), size=min(8, len(m)), replace=False):
            ref = reference_indices(m.start_frames[w], m.end_frames[w], off)
            assert ours[w].tolist() == ref, (n, off, w)
        nflows = int(rng.integers(1, max(n // 15, 2)))
        fi = window_frame_indices(m, CFG, 0)
        idx, valid = flow_indices_for(fi, nflows, CFG)
        for w in rng.choice(len(m), size=min(8, len(m)), replace=False):
            ref = [i for i in np.unique(fi[w] // 15) if i < nflows]
            assert idx[w][valid[w]].tolist() == ref, (n, nflows, w)
