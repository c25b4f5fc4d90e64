"""Raw-video training path: frame JPEGs -> normalized snippet batches.

Replicates the reference's data_type='raw' branch for the VUA_EASE stitch
datasets (prepare_dataset.py:1795-1990):

- 16-frame snippets per annotated segment: Needle Withdrawal samples the
  +/-40-frame window around the withdrawal start; Handling/Driving drop the
  final 20% of frames; jump = span // 16, truncated to exactly 16 indices
  (:1870-1915).  Frame numbers are used directly — NO -1 (the raw path's
  off-by-one differs from the reps path, :1822);
- TTA offsets +3/+6 at val/test shift the start (:1875-1878, :1906-1908);
- JPEG loading from Images/<video>/frames_%08d.jpg numbered from 1
  (loadImages, :1923-1934);
- preprocessing: ToTensor (/255), center-crop 0.8H x 0.8W, resize to the
  model width, normalize with the encoder's statistics — R3D Kinetics
  stats or ImageNet for I3D/ViT (:1916-1947);
- flow snippets use jump = fps // 2 per video with NO unique() (removed to
  keep samples stackable, :1973-1976).

The encoder (R3D-18 / ViT) is frozen during classification training
(run_experiments.py '-fe', prepare_model.py:112-124), so batches are
encoded once on device and the trainable path sees static-shaped feature
arrays.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from sais_tpu.config import VUA_FPS_TABLE
from sais_tpu.data.skill import RACE_FRAME_COLUMNS, encode_skill_label

RAW_SNIPPET_LEN = 16  # 'MODIFIED to take only 16 frames' (:1890)

# encoder normalization stats (prepare_dataset.py:1916-1922)
R3D_MEAN = (0.43216, 0.394666, 0.37645)
R3D_STD = (0.22803, 0.22145, 0.216989)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def raw_segment_indices(row, tta_offset: int = 0) -> np.ndarray:
    """16-frame sampling grid for one stitch segment, raw path
    (prepare_dataset.py:1870-1915).  Frame-number space (no -1)."""
    race = row["RACE"]
    cols = RACE_FRAME_COLUMNS[race]
    start_f, end_f = int(row[cols[0]]), int(row[cols[1]])
    if race == "Needle Withdrawal":
        start, end = start_f - 40, start_f + 40
    else:
        diff = end_f - start_f
        start, end = start_f, end_f - int(diff * 0.20)
    jump = max((end - start) // RAW_SNIPPET_LEN, 1)
    if tta_offset:
        # TTA variants sample from the RAW annotation span, NOT the
        # race-adjusted base window: indices2 = arange(startIdx+3,
        # endIdx+3, jump_size)[:16] (prepare_dataset.py:1884-1886) — for
        # Needle Withdrawal that window starts ~40 frames after the base
        # one, and for NH/ND it ignores the 20%-tail drop.
        idx = np.arange(start_f + tta_offset, end_f + tta_offset, jump)
    else:
        idx = np.arange(start, end, jump)
    return idx[:RAW_SNIPPET_LEN]


def jpeg_frame_source(root: str, dataset: str = "VUA"
                      ) -> Callable[[str, np.ndarray, str], np.ndarray]:
    """loadImages (prepare_dataset.py:1923-1934): read
    <root>/<dataset>/{Images|Flows}/<video>/{frames|flows}_%08d.jpg at
    frame numbers indices+1."""
    from PIL import Image

    def load(video: str, indices: np.ndarray, modality: str = "RGB"
             ) -> np.ndarray:
        folder = "Images" if modality == "RGB" else "Flows"
        stem = "frames" if modality == "RGB" else "flows"
        frames = []
        for idx in indices:
            n = int(idx) + 1
            path = os.path.join(root, dataset, folder, video,
                                f"{stem}_{n:08d}.jpg")
            frames.append(np.asarray(Image.open(path)))
        return np.stack(frames)

    return load


def process_snippet(frames_u8: np.ndarray, width: int,
                    mean: Sequence[float], std: Sequence[float]
                    ) -> np.ndarray:
    """processImages (prepare_dataset.py:1936-1947): /255, center-crop
    0.8H x 0.8W, bilinear resize to (width, width), normalize.
    (T, H, W, 3) uint8 -> (T, width, width, 3) float32, channels-last.

    Matches torchvision's tensor path: crop origin int(round((H-ch)/2))
    (F.center_crop) and a NON-antialiased bilinear resize of the float
    tensor (F.resize on tensors) — cv2.INTER_LINEAR on float32 uses the
    same half-pixel convention."""
    import cv2

    out = []
    for frame in frames_u8:
        h, w = frame.shape[:2]
        ch, cw = int(0.8 * h), int(0.8 * w)
        top = int(round((h - ch) / 2.0))
        left = int(round((w - cw) / 2.0))
        crop = frame[top:top + ch, left:left + cw].astype(np.float32) / 255.0
        x = cv2.resize(crop, (width, width),
                       interpolation=cv2.INTER_LINEAR)
        out.append((x - np.asarray(mean, np.float32))
                   / np.asarray(std, np.float32))
    return np.stack(out)


def collate_raw(rows: pd.DataFrame, frame_source, classes: Sequence[int],
                domain: str, phase: str, width: int = 112,
                encoder_type: str = "R3D", use_flow: bool = False,
                tta_offset: int = 0,
                fps_table: Mapping[str, float] = VUA_FPS_TABLE
                ) -> Dict[str, np.ndarray]:
    """One raw training batch: {'raw': (B, 1, T, W, W, 3) float32,
    'labels': (B,)} (+ 'raw_flow' when use_flow)."""
    mean, std = ((R3D_MEAN, R3D_STD) if encoder_type == "R3D"
                 else (IMAGENET_MEAN, IMAGENET_STD))
    snippets, flows, labels = [], [], []
    for _, row in rows.iterrows():
        idx = raw_segment_indices(row, tta_offset)
        frames = frame_source(str(row["Video"]), idx, "RGB")
        snippets.append(process_snippet(frames, width, mean, std))
        if use_flow:
            if str(row["Video"]) not in fps_table:
                # the reference's fps_dict['VUA'][videoname] raises for
                # unknown videos too — a silent 30 fps default would load
                # flows from the wrong timestamps with no error
                raise KeyError(
                    f"video {row['Video']!r} not in the VUA fps table "
                    "(config.VUA_FPS_TABLE); pass fps_table or extend it")
            jump = int(fps_table[str(row["Video"])] // 2)
            fidx = idx // jump  # no unique() in the raw path (:1975)
            flows.append(process_snippet(
                frame_source(str(row["Video"]), fidx, "Flow"), width, mean,
                std))
        labels.append(encode_skill_label(int(row["maj"]),
                                         row.get("Domain", domain), domain,
                                         classes))
    batch = {"raw": np.stack(snippets)[:, None],
             "labels": np.asarray(labels, np.int32)}
    if flows:
        batch["raw_flow"] = np.stack(flows)[:, None]
    return batch


def raw_batches(phase_rows: pd.DataFrame, frame_source,
                classes: Sequence[int], domain: str, phase: str,
                batch_size: int, shuffle: bool, width: int = 112,
                encoder_type: str = "R3D", use_flow: bool = False,
                seed: int = 0, tta: bool = False):
    """Yield raw snippet batches; tta=True attaches the 3 variants."""
    from sais_tpu.data.datasets import batched_indices

    offsets = (0, 3, 6) if tta else (0,)
    for idx in batched_indices(len(phase_rows), batch_size, shuffle, seed):
        rows = phase_rows.iloc[idx]
        variants = [collate_raw(rows, frame_source, classes, domain, phase,
                                width, encoder_type, use_flow, off)
                    for off in offsets]
        out = dict(variants[0])
        if tta:
            out["tta"] = variants
        yield out
