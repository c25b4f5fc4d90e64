"""Batch collation: ragged labeled segments -> static-shaped padded arrays.

The reference pad_collate (prepare_dataset.py:2808-2935) pads each batch to
its max frame count, which on TPU would trigger one XLA compile per distinct
length.  Here frame counts are rounded up to a small set of BUCKET lengths
(SURVEY.md section 7 'ragged windows vs XLA static shapes') so every batch
reuses one of a handful of compiled programs.  Mask semantics are identical:
mask[i, :, len_i+1:] = True with slot 0 the always-valid CLS
(createPaddingMask, prepare_dataset.py:2798-2806).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from sais_tpu.config import WindowConfig
from sais_tpu.data.windows import flow_indices_for, segment_frame_indices


def bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds largest bucket {buckets[-1]}")


def collate_segments(rows: pd.DataFrame, rgb_store, flow_store,
                     label_to_col: Dict[str, int], wcfg: WindowConfig,
                     buckets: Sequence[int] = (16, 32, 64, 128),
                     tta_offset: int = 0,
                     use_flow: bool = True,
                     fixed_stride=None, cap=None,
                     label_fn=None) -> Dict[str, np.ndarray]:
    """Build one training batch from segment rows.

    rows: DataFrame with Video/StartFrame/EndFrame/Gesture columns;
    rgb_store/flow_store: objects with read_video(name) -> (N, D).
    Returns the batch dict consumed by PrototypeTrainer.
    """
    rgb_list: List[np.ndarray] = []
    rgb_lens: List[int] = []
    flow_list: List[np.ndarray] = []
    flow_valid: List[np.ndarray] = []
    cols: List[int] = []
    for _, row in rows.iterrows():
        reps = rgb_store.read_video(row["Video"])
        idx = segment_frame_indices(int(row["StartFrame"]),
                                    int(row["EndFrame"]), wcfg, tta_offset,
                                    fixed_stride=fixed_stride, cap=cap)
        rgb_list.append(reps[idx])
        rgb_lens.append(len(idx))
        if use_flow and flow_store is not None:
            freps = flow_store.read_video(row["Video"])
            fidx, fvalid = flow_indices_for(idx[None], len(freps), wcfg)
            flow_list.append(freps[fidx[0]] * fvalid[0][:, None])
            flow_valid.append(fvalid[0])
        cols.append(label_fn(row) if label_fn is not None
                    else label_to_col[row["Gesture"]])

    b = len(rgb_list)
    d = rgb_list[0].shape[1]
    fb = bucket_for(max(rgb_lens), buckets)
    rgb = np.zeros((b, 1, fb, d), np.float32)
    rgb_mask = np.zeros((b, 1, fb + 1), bool)
    for i, (arr, ln) in enumerate(zip(rgb_list, rgb_lens)):
        rgb[i, 0, :ln] = arr
        rgb_mask[i, 0, ln + 1:] = True

    batch = {
        "rgb": rgb, "rgb_mask": rgb_mask,
        "label_cols": np.asarray(cols, np.int32),
        "labels": np.asarray(cols, np.int32),
    }
    if flow_list:
        fmax = bucket_for(max(f.shape[0] for f in flow_list),
                          [2, 4, 8, 16, *buckets])
        flow = np.zeros((b, 1, fmax, d), np.float32)
        flow_mask = np.zeros((b, 1, fmax + 1), bool)
        for i, (arr, valid) in enumerate(zip(flow_list, flow_valid)):
            n = arr.shape[0]
            flow[i, 0, :n] = arr
            flow_mask[i, 0, 1:n + 1] = ~valid
            flow_mask[i, 0, n + 1:] = True
        batch["flow"] = flow
        batch["flow_mask"] = flow_mask
    return batch


def segment_batches(dataset_rows: pd.DataFrame, rgb_store, flow_store,
                    classes: Sequence[str], wcfg: WindowConfig,
                    batch_size: int, shuffle: bool, seed: int = 0,
                    use_flow: bool = True, tta: bool = False,
                    fixed_stride=None, cap=None, label_fn=None,
                    buckets: Sequence[int] = (16, 32, 64, 128)):
    """Yield collated batches over a phase's segment table.

    tta=True (val/test phases) attaches the reference's 3-way TTA variants
    (offsets +0/+3/+6, prepare_dataset.py:2645-2656) under a 'tta' key —
    the dict-of-3 semantics of pad_collate (:2808-2935); the trainers mean
    losses and probs/logits over them (perform_training.py:126-149).
    """
    from sais_tpu.data.datasets import CachingStore, batched_indices
    label_to_col = {c: i for i, c in enumerate(classes)}
    offsets = tuple(wcfg.tta_offsets) if tta else (0,)
    for idx in batched_indices(len(dataset_rows), batch_size, shuffle, seed):
        # one read per distinct video per batch, shared by all TTA variants
        rgb_c = CachingStore(rgb_store)
        flow_c = CachingStore(flow_store) if flow_store is not None else None
        variants = [
            collate_segments(dataset_rows.iloc[idx], rgb_c, flow_c,
                             label_to_col, wcfg, tta_offset=off,
                             use_flow=use_flow, fixed_stride=fixed_stride,
                             cap=cap, label_fn=label_fn, buckets=buckets)
            for off in offsets
        ]
        out = dict(variants[0])
        if tta:
            out["tta"] = variants
        yield out
