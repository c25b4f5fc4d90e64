"""Post-processing parity vs literal reference semantics
(process_inference_results.py:130-197, 230-258)."""

import numpy as np
import pandas as pd

from sais_tpu.config import PostprocessConfig
from sais_tpu.infer.postprocess import (decode_gesture_intervals,
                                        ensemble_probs, frames_to_time,
                                        prediction_entropy, split_intervals,
                                        threshold_preds)

CFG = PostprocessConfig()


def reference_group_intervals(index_list, seconds):
    """Literal transcription of groupPredictionIntervals
    (process_inference_results.py:139-169) over a plain index list."""
    curr_index = list(index_list)
    cumCount = 0
    startIndices, endIndices = [], []
    if len(curr_index) == 1:
        return [curr_index[0]], [curr_index[0]]
    startIdx = curr_index[0]
    prevIdx = startIdx
    for index in curr_index[1:]:
        if index - prevIdx > seconds:
            startIndices.append(startIdx)
            endIndices.append(prevIdx)
            startIdx = index
            cumCount = 0
        if index == curr_index[-1]:
            if cumCount == 0:
                startIndices.append(index)
                endIndices.append(index)
            else:
                startIndices.append(startIdx)
                endIndices.append(index)
        cumCount += 1
        prevIdx = index
    return startIndices, endIndices


def test_split_intervals_matches_reference():
    cases = [
        [0], [0, 1, 2, 3], [0, 5], [0, 1, 9], [0, 1, 2, 10, 11, 12],
        [0, 4, 8, 12], [3], [0, 1, 2, 3, 20], [5, 6, 7, 8, 9, 10],
        [0, 2, 4, 6, 8, 16], [1, 10, 11], [0, 10],
    ]
    for c in cases:
        s, e = reference_group_intervals(c, 3)
        ours = split_intervals(np.asarray(c), 3)
        assert ours == list(zip(s, e)), c


def test_threshold_preds_semantics():
    probs = np.array([[0.6, 0.4], [0.49, 0.51], [0.48, 0.52]])
    # threshold 0.515: last-class prob must EXCEED it
    preds = threshold_preds(probs, 0.515, ["in-view", "out-of-view"])
    assert preds.tolist() == ["in-view", "in-view", "out-of-view"]
    # argmax path when threshold is None
    preds = threshold_preds(probs, None, ["a", "b"])
    assert preds.tolist() == ["a", "b", "b"]


def test_entropy_matches_reference_formula():
    p = np.array([[0.5, 0.5], [0.9, 0.1]])
    ref = [-np.sum(row * np.log(row)) for row in p]
    np.testing.assert_allclose(prediction_entropy(p), ref)


def test_frames_to_time():
    # frame -> second//60 handling incl. hour wrap (reference mod-60 cols)
    assert frames_to_time(np.array([0, 30, 1800, 108000 + 30 * 61]), 30) == \
        ["00:00:00", "00:00:01", "00:01:00", "01:01:01"]


def test_ensemble_means_tta_then_folds():
    w = 4
    f0 = [np.full((w, 2), 0.2), np.full((w, 2), 0.4), np.full((w, 2), 0.6)]
    f1 = [np.full((w, 2), 1.0), np.full((w, 2), 1.0), np.full((w, 2), 1.0)]
    out = ensemble_probs([f0, f1])
    np.testing.assert_allclose(out, np.full((w, 2), (0.4 + 1.0) / 2))


def test_decode_gesture_intervals_end_to_end():
    # windows: 0..5; windows 0-2 confidently in-view, 3 uncertain, 4-5
    # confidently out-of-view
    probs = np.array([
        [0.9, 0.1], [0.88, 0.12], [0.91, 0.09],
        [0.5, 0.5],
        [0.2, 0.8], [0.15, 0.85],
    ])
    starts = np.arange(6) * 15
    ends = starts + 15
    df = decode_gesture_intervals(probs, starts, ends, "vid", CFG)
    assert set(df["Gesture"]) == {"in-view", "out-of-view"}
    iv = df[df["Gesture"] == "in-view"].iloc[0]
    assert iv["StartFrame"] == 0 and iv["EndFrame"] == 45
    ov = df[df["Gesture"] == "out-of-view"].iloc[0]
    # reference quirk: for a 2-element group the cumCount==0 edge case emits
    # only a singleton for the final row (process_inference_results.py:159-162)
    assert ov["StartFrame"] == 75 and ov["EndFrame"] == 90
    # uncertain window 3 (entropy ln2 > 0.66) was dropped from both groups
    assert len(df) == 2
    assert iv["StartTime"] == "00:00:00"
    assert iv["Path"] == "images/vid"
    # interval probs are the mean over member windows
    np.testing.assert_allclose(iv[0], np.mean([0.9, 0.88, 0.91]))


def test_interval_pred_uses_argmax_not_threshold():
    """getGestures re-predicts with getPreds(threshold=None) => argmax over
    ALL classes (process_inference_results.py:130-137, default threshold at
    :182), while window-level getPreds thresholds only the LAST class into
    index 0/1.  With >=2 classes these diverge; verify the argmax path."""
    cfg = PostprocessConfig(class_names=("a", "b", "c"))
    # last-class prob 0.10 <= 0.515 -> window pred index 0 ('a');
    # entropy 0.52 <= 0.66 -> kept; argmax over the interval mean -> 'b'
    probs = np.array([[0.05, 0.85, 0.10], [0.06, 0.84, 0.10]])
    starts = np.array([0, 15])
    ends = starts + 15
    df = decode_gesture_intervals(probs, starts, ends, "vid", cfg)
    grp = df[df["Gesture"] == "a"]
    assert len(grp) == 1
    assert grp.iloc[0]["pred"] == "b"  # threshold rule would have said 'a'


def _reference_full_decode(probs, starts, ends, cfg):
    """Literal pandas transcription of the reference __main__ flow
    (process_inference_results.py:230-255): getPreds(threshold=0.515) ->
    per-gesture entropy filter -> groupPredictionIntervals ->
    getGestures (label-sliced member mean + argmax re-pred)."""
    class_cols = list(range(probs.shape[1]))
    names = list(cfg.class_names)
    df = pd.DataFrame(probs)
    df["StartFrame"] = starts
    df["EndFrame"] = ends
    df["Entropy"] = df[class_cols].apply(
        lambda p: -np.sum(p * np.log(p)), axis=1)
    df["pred"] = df[class_cols[-1]].apply(
        lambda p: int(p > cfg.decision_threshold)).map(dict(enumerate(names)))
    rows = []
    for gesture in names:
        curr = df[df["pred"] == gesture]
        curr = curr[curr["Entropy"] <= cfg.entropy_threshold]
        if not len(curr):
            continue
        s_idx, e_idx = reference_group_intervals(list(curr.index),
                                                 cfg.merge_gap_s)
        for si, ei in zip(s_idx, e_idx):
            mean = curr.loc[si:ei, class_cols].mean()   # filtered members
            rows.append((
                gesture,
                int(curr.loc[si, "StartFrame"]),
                int(curr.loc[ei, "EndFrame"]),
                tuple(np.round(mean.to_numpy(), 9)),
                names[int(np.argmax(mean.to_numpy()))],
                round(float(-np.sum(mean.to_numpy()
                                    * np.log(mean.to_numpy()))), 9),
            ))
    return rows


def test_decode_gesture_intervals_fuzz_vs_reference():
    """Full-path fuzz: random window prob tables through
    decode_gesture_intervals must reproduce the literal reference flow —
    grouping quirks, filtered-member means, argmax re-pred, entropy."""
    from sais_tpu.infer.postprocess import decode_gesture_intervals

    rng = np.random.default_rng(11)
    for case in range(300):
        n = int(rng.integers(1, 40))
        # mix confident and near-uniform rows so the entropy filter and
        # both pred classes all trigger; keep probs away from exact 0
        alpha = rng.choice([0.3, 1.0, 5.0])
        probs = rng.dirichlet((alpha, alpha), size=n)
        probs = np.clip(probs, 1e-6, None)
        probs /= probs.sum(1, keepdims=True)
        starts = np.arange(n) * 15
        ends = starts + 15
        df = decode_gesture_intervals(probs, starts, ends, "v", CFG)
        got = sorted(
            (r["Gesture"], int(r["StartFrame"]), int(r["EndFrame"]),
             tuple(np.round([r[c] for c in range(2)], 9)), r["pred"],
             round(float(r["Entropy"]), 9))
            for _, r in df.iterrows())
        ref = sorted(_reference_full_decode(probs, starts, ends, CFG))
        assert got == ref, f"case {case} (n={n})"
