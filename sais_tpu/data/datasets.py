"""Labeled-segment datasets: splits, class balancing, fold semantics.

Replicates the reference VideoDataset policies (prepare_dataset.py):

- fold-seeded video-level splits: random.seed(fold);
  train = random.sample(cases, int(0.7 n)); val = random.sample(train,
  int(0.2 |train|)); train -= val; test = rest (:1647-1658) — python's
  random module, reproduced bit-for-bit by using the same calls;
- class balancing: per-class downsample to the minority count with
  DataFrame.sample(n, replace=False, random_state=0) (:1627-1635);
  balance=False still balances val/test (:1664-1666);
- label encoding: sklearn LabelEncoder over sorted class names (:2639).

A segment row is (Video, StartFrame, EndFrame, label).  Frame/flow index
math is shared with inference (sais_tpu.data.windows).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


def fold_video_split(cases: Sequence[str], fold: int
                     ) -> Tuple[List[str], List[str], List[str]]:
    """Reference fold split (prepare_dataset.py:1647-1658)."""
    cases = list(cases)
    ncases = len(cases)
    rng = random.Random(fold)
    train = rng.sample(cases, int(0.7 * ncases))
    val = rng.sample(train, int(0.2 * len(train)))
    train = list(set(train) - set(val))
    test = list(set(cases) - set(train) - set(val))
    assert not set(train) & set(val)
    assert not set(train) & set(test)
    return train, val, test


def balance_classes(df: pd.DataFrame, label_col: str,
                    labels: Sequence) -> pd.DataFrame:
    """balance_scores (prepare_dataset.py:1627-1635): downsample every class
    to the minority count, deterministic random_state=0."""
    counts = df[label_col].value_counts()
    n = int(counts.min())
    parts = [df[df[label_col] == lab].sample(n=n, replace=False,
                                             random_state=0)
             for lab in labels]
    return pd.concat(parts, axis=0)


@dataclasses.dataclass
class SegmentDataset:
    """Phase-split segment tables for one fold."""

    frames: Dict[str, pd.DataFrame]      # phase -> rows
    classes: List[str]                   # sorted label names (LabelEncoder)

    def encode(self, name: str) -> int:
        return self.classes.index(name)


def build_segment_dataset(segments: pd.DataFrame, fold: int,
                          label_col: str = "Gesture",
                          video_col: str = "Video",
                          balance: bool = True) -> SegmentDataset:
    """Split labeled segments into train/val/test with reference fold and
    balancing policies (obtain_train_val_split, prepare_dataset.py:1637-1668).
    """
    classes = sorted(segments[label_col].unique().tolist())
    train_v, val_v, test_v = fold_video_split(
        segments[video_col].unique().tolist(), fold)
    out = {}
    for phase, vids in (("train", train_v), ("val", val_v), ("test", test_v)):
        sub = segments[segments[video_col].isin(vids)]
        if len(sub) and (balance or phase in ("val", "test")):
            present = [c for c in classes if (sub[label_col] == c).any()]
            sub = balance_classes(sub, label_col, present)
        out[phase] = sub.reset_index(drop=True)
    return SegmentDataset(out, classes)


def batched_indices(n: int, batch_size: int, shuffle: bool,
                    seed: int = 0) -> List[np.ndarray]:
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    return [idx[i:i + batch_size] for i in range(0, n, batch_size)]


class CachingStore:
    """Per-batch read cache over a FeatureStore-like object.

    FeatureStore.read_video materializes the full (nframes, D) dataset;
    the 3-way TTA collation otherwise re-reads every row's video once per
    variant (3x the I/O — hundreds of MB per batch for hour-long videos).
    Scope one instance per batch so memory stays bounded."""

    def __init__(self, store):
        self._store = store
        self._cache = {}

    def read_video(self, name):
        if name not in self._cache:
            self._cache[name] = self._store.read_video(name)
        return self._cache[name]
