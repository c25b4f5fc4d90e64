"""Gesture-prediction post-processing -> results CSV.

Host-side logic replicating process_inference_results.py:201-258 exactly:

1. mean probabilities over the 3 TTA augments (:218);
2. mean over folds (:224-228);
3. entropy -sum(p log p) and threshold pred: class1 prob > 0.515 (:130-137,230);
4. per (video, predicted gesture): drop rows with entropy > 0.66 (:244),
   split into intervals where the window-index gap exceeds `merge_gap_s`
   (:139-169 — the gap is measured in window INDEX units, not seconds; the
   reference passes seconds=3 against 0.5 s window indices and we preserve
   that), average probs per interval, re-threshold (:171-183);
5. frames -> HH-MM-SS wall time at 30 fps (:185-197);
6. write results/Custom_inference_gestures.csv (:258).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from sais_tpu.config import PostprocessConfig


def ensemble_probs(fold_tta_probs: Sequence[Sequence[np.ndarray]]) -> np.ndarray:
    """[(fold)][(tta)] (W, P) prob arrays -> (W, P) TTA-then-fold mean."""
    per_fold = [np.mean(np.stack(tta, 0), 0) for tta in fold_tta_probs]
    return np.mean(np.stack(per_fold, 0), 0)


def prediction_entropy(probs: np.ndarray) -> np.ndarray:
    return -np.sum(probs * np.log(probs), axis=-1)


def threshold_preds(probs: np.ndarray, threshold: Optional[float],
                    class_names: Sequence[str]) -> np.ndarray:
    """getPreds (process_inference_results.py:130-137): with a threshold the
    LAST class wins iff its prob exceeds it; otherwise argmax."""
    if threshold is None:
        idx = np.argmax(probs, axis=-1)
    else:
        idx = (probs[:, -1] > threshold).astype(np.int64)
    return np.asarray(class_names)[idx]


def split_intervals(indices: np.ndarray, gap: int) -> List[Tuple[int, int]]:
    """groupPredictionIntervals (process_inference_results.py:139-169).

    `indices` are the surviving window indices (sorted).  Returns inclusive
    (start, end) index pairs.  Preserves the reference's edge behavior: a
    gap landing exactly on the final row emits BOTH the closed interval and
    a singleton for the final row.
    """
    if len(indices) == 0:
        return []
    if len(indices) == 1:
        return [(int(indices[0]), int(indices[0]))]
    out: List[Tuple[int, int]] = []
    start = int(indices[0])
    prev = start
    cum = 0
    for pos in range(1, len(indices)):
        idx = int(indices[pos])
        if idx - prev > gap:
            out.append((start, prev))
            start = idx
            cum = 0
        if pos == len(indices) - 1:
            if cum == 0:
                out.append((idx, idx))
            else:
                out.append((start, idx))
        cum += 1
        prev = idx
    return out


def frames_to_time(frames: np.ndarray, fps: int) -> List[str]:
    """FramesToTime (process_inference_results.py:185-197) -> 'HH:MM:SS'."""
    out = []
    for fr in frames:
        sec = int(fr) // fps
        mn = sec // 60
        hr = (mn // 60) % 60
        out.append(f"{hr:02d}:{mn % 60:02d}:{sec % 60:02d}")
    return out


def decode_gesture_intervals(probs: np.ndarray, start_frames: np.ndarray,
                             end_frames: np.ndarray, video: str,
                             cfg: PostprocessConfig) -> pd.DataFrame:
    """Ensembled window probs -> merged gesture-interval table.

    probs: (W, P) fold/TTA-averaged probabilities aligned with the window
    manifest.  Returns the Custom_inference_gestures.csv schema.
    """
    class_names = list(cfg.class_names)
    ncls = probs.shape[1]
    entropy = prediction_entropy(probs)
    preds = threshold_preds(probs, cfg.decision_threshold, class_names)

    rows = []
    for gesture in class_names:
        keep = (preds == gesture) & (entropy <= cfg.entropy_threshold)
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            continue
        for s_i, e_i in split_intervals(idx, cfg.merge_gap_s):
            sel = np.arange(s_i, e_i + 1)
            sel = sel[keep[sel]]  # .loc[start:end] over the filtered frame
            # reference getGestures averages over the filtered rows between
            # the interval endpoints (process_inference_results.py:177)
            mean_probs = probs[sel].mean(axis=0)
            row = {c: mean_probs[c] for c in range(ncls)}
            row["StartFrame"] = int(start_frames[s_i])
            row["EndFrame"] = int(end_frames[e_i])
            row["Entropy"] = float(-np.sum(mean_probs * np.log(mean_probs)))
            # interval-level re-prediction uses argmax, NOT the decision
            # threshold: getGestures calls getPreds with threshold=None
            # (process_inference_results.py:182, default at :130)
            row["pred"] = threshold_preds(mean_probs[None], None,
                                          class_names)[0]
            row["Gesture"] = gesture
            row["Video"] = video
            rows.append(row)
    df = pd.DataFrame(rows)
    if len(df):
        df["StartTime"] = frames_to_time(df["StartFrame"].to_numpy(), cfg.fps)
        df["EndTime"] = frames_to_time(df["EndFrame"].to_numpy(), cfg.fps)
        df["Path"] = "images/" + df["Video"]
        # reference column order (process_inference_results.py:247-255)
        order = ([c for c in range(ncls)] +
                 ["StartFrame", "EndFrame", "Entropy", "pred", "StartTime",
                  "EndTime", "Gesture", "Video", "Path"])
        df = df[order]
    return df.reset_index(drop=True)
