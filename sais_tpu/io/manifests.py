"""Path-manifest generation — reference-compatible CSVs.

Replicates generate_paths.py: Custom_Paths.csv (path/category/label per
frame, :21-38) and Custom_FlowPaths.csv (frame pairs jump_frames=15 apart
with derived flowpath column, :40-69).  These files are only needed for
interop with reference tooling; the native pipeline passes arrays in memory.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd


def _frame_files(casepath: str) -> List[str]:
    """Sorted frame image files only — stray entries (.DS_Store, partial
    .tmp writes) would otherwise corrupt the manifests or crash the
    frame-number parse."""
    return sorted(f for f in os.listdir(casepath)
                  if f.lower().endswith((".jpg", ".jpeg", ".png")))


def frame_paths_manifest(root: str, videos: List[str],
                         images_dir: str = "images") -> pd.DataFrame:
    rows = []
    for case in videos:
        casepath = os.path.join(root, images_dir, case)
        for f in _frame_files(casepath):
            rows.append({"path": os.path.join(images_dir, case, f),
                         "category": case, "label": case})
    return pd.DataFrame(rows)


def flow_paths_manifest(root: str, videos: List[str], jump_frames: int = 15,
                        images_dir: str = "images") -> pd.DataFrame:
    """Frame pairs (path1, path2) jump_frames apart + derived flowpath.

    Pair starts are range(0, nframes - jump, jump) over the SORTED file list
    and path2 is synthesized from the frame number embedded in the name
    (generate_paths.py:47-54), flowpath = flows_<frame//jump>.jpg (:64-69).
    """
    rows = []
    for case in videos:
        casepath = os.path.join(root, images_dir, case)
        files = _frame_files(casepath)
        indices = np.arange(0, len(files) - jump_frames, jump_frames)
        for i in indices:
            f1 = files[i]
            stem, ext = os.path.splitext(f1)
            frame = int(stem.split("_")[-1])
            nxt = frame + jump_frames
            f2 = f"frames_{nxt:08d}{ext}"
            nflow = frame // jump_frames
            rows.append({
                "path1": os.path.join(images_dir, case, f1),
                "path2": os.path.join(images_dir, case, f2),
                "category": case, "label": case,
                "flowpath": os.path.join("flows", case,
                                         f"flows_{nflow:08d}.jpg"),
            })
    return pd.DataFrame(rows)


def write_manifests(root: str, videos: List[str],
                    dataset: str = "Custom") -> None:
    """Write <dataset>_Paths.csv and <dataset>_FlowPaths.csv under paths/."""
    out = os.path.join(root, "paths")
    os.makedirs(out, exist_ok=True)
    frame_paths_manifest(root, videos).to_csv(
        os.path.join(out, f"{dataset}_Paths.csv"))
    flow_paths_manifest(root, videos).to_csv(
        os.path.join(out, f"{dataset}_FlowPaths.csv"))
