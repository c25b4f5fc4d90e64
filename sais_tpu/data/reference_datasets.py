"""Named dataset policies from the reference's per-dataset branches.

VideoDataset.__init__ in the reference is a 2900-line switch over dataset
names; the actual *policies* inside it are few.  This module names each one
with its RNG semantics reproduced exactly (python `random` module seeded
with the fold, pandas sample random_state), so fold membership matches the
reference bit-for-bit:

- per-gesture video split, 90/10, with the reference's val-subset-of-train
  quirk (the train-minus-val line is commented out in the original)
  (NS/VUA/JIGSAWS gesture classification + Custom_Gestures train path,
  prepare_dataset.py:1047-1076, 1548-1567);
- instance split 80/20 (kind='Instance', prepare_dataset.py:1577-1590);
- leave-one-user-out (JIGSAWS kind='User', prepare_dataset.py:1513-1537):
  test = users[fold], val = last of the fold-seeded shuffle of the rest;
- class balancing by downsampling to the minority count with
  random_state=1 (balance_gestures, :1502-1511);
- DART global-skill aggregation (NS_DART, :929-961): per-domain rater
  means (or majority), banded at <=2.6 / <=2.8 / <=3.0, keep the extreme
  bands {0, 2};
- DART-style 90/10 video split (:997-1006);
- minimum-duration gesture filter (> 10 frames, :969-977);
- JIGSAWS gesture whitelist (:1085) and the train+val merge the JIGSAWS
  branch feeds the loader (:1619-1622).
"""

from __future__ import annotations

import random
from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

JIGSAWS_GESTURES = ["G2", "G3", "G6", "G4", "G8", "G11", "G5", "G1", "G9",
                    "G10"]
DART_DOMAINS = ("GS", "IVA", "RTP", "TH", "TR", "E")


def balance_gestures(df: pd.DataFrame, label_col: str = "Gesture",
                     random_state: int = 1) -> pd.DataFrame:
    """Downsample every class to the minority count (balance_gestures,
    prepare_dataset.py:1502-1511; note random_state=1 here vs 0 in the
    'maj'-label variant)."""
    labels = df[label_col].unique().tolist()
    n = int(df[label_col].value_counts().min())
    parts = [df[df[label_col] == lab].sample(n=n, replace=False,
                                             random_state=random_state)
             for lab in labels]
    return pd.concat(parts, axis=0)


def per_gesture_video_split(df: pd.DataFrame, fold: int,
                            balance: bool = True,
                            label_col: str = "Gesture",
                            video_col: str = "Video"
                            ) -> Tuple[pd.DataFrame, pd.DataFrame,
                                       pd.DataFrame]:
    """kind='Video' split (prepare_dataset.py:1047-1076): per gesture,
    90% of videos train, 10% OF TRAIN val; the original leaves val inside
    train (the subtraction is commented out) — preserved."""
    train, val, test = [], [], []
    for gesture in sorted(df[label_col].unique().tolist()):
        cur = df[df[label_col] == gesture]
        vids = cur[video_col].unique().tolist()
        rng = random.Random(fold)
        train_vids = rng.sample(vids, int(0.9 * len(vids)))
        val_vids = rng.sample(train_vids, int(0.1 * len(train_vids)))
        test_vids = list(set(vids) - set(train_vids) - set(val_vids))
        train.append(cur[cur[video_col].isin(train_vids)])
        val.append(cur[cur[video_col].isin(val_vids)])
        test.append(cur[cur[video_col].isin(test_vids)])
    out = [pd.concat(x, axis=0) if x else pd.DataFrame() for x in
           (train, val, test)]
    if balance:
        out = [balance_gestures(d, label_col) if len(d) else d for d in out]
    else:
        out[1:] = [balance_gestures(d, label_col) if len(d) else d
                   for d in out[1:]]
    return tuple(out)


def instance_split(df: pd.DataFrame, balance: bool = True,
                   label_col: str = "Gesture"
                   ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """kind='Instance' 80/20 split (prepare_dataset.py:1577-1590);
    test == val in the reference."""
    if balance:
        df = balance_gestures(df, label_col)
    n = df.shape[0]
    rng = random.Random(0)
    indices = rng.sample(list(range(n)), n)
    ntrain = int(0.8 * n)
    train = df.iloc[indices[:ntrain]]
    val = df.iloc[indices[ntrain:]]
    return train.copy(), val.copy(), val.copy()


def leave_one_user_out_split(df: pd.DataFrame, fold: int,
                             subject_col: str = "Subject"
                             ) -> Tuple[pd.DataFrame, pd.DataFrame,
                                        pd.DataFrame]:
    """JIGSAWS kind='User' (prepare_dataset.py:1513-1537): test user is
    users[fold]; the remaining users are fold-seed shuffled, last one is
    val, rest train."""
    users = df[subject_col].unique().tolist()
    test_user = users[fold]
    others = set(users) - {test_user}
    rng = random.Random(fold)
    shuffled = rng.sample(sorted(others), len(others))
    val_user = shuffled[-1]
    train_users = shuffled[:-1]
    return (df[df[subject_col].isin(train_users)],
            df[df[subject_col] == val_user],
            df[df[subject_col] == test_user])


def jigsaws_phase_tables(df: pd.DataFrame, fold: int,
                         balance: bool = True) -> Dict[str, pd.DataFrame]:
    """The JIGSAWS branch trains on train+val merged and uses the held-out
    user for both val and test (prepare_dataset.py:1619-1622)."""
    df = df[df["Gesture"].isin(JIGSAWS_GESTURES)]
    train, val, test = leave_one_user_out_split(df, fold)
    if balance:
        train = balance_gestures(train)
        val = balance_gestures(val) if len(val) else val
        test = balance_gestures(test) if len(test) else test
    merged = pd.concat((train, val), axis=0)
    return {"train": merged, "val": test, "test": test}


def dart_band(score: float) -> float:
    """group_dart banding (prepare_dataset.py:949-956): <=2.6 -> 0,
    <=2.8 -> 1, <=3.0 -> 2, above 3.0 unchanged."""
    if score <= 2.6:
        return 0
    if score <= 2.8:
        return 1
    if score <= 3.0:
        return 2
    return score


def aggregate_dart_scores(dart: pd.DataFrame, domain: str = "TR",
                          style: str = "mean",
                          keep_extremes: bool = True) -> pd.DataFrame:
    """NS_DART rater aggregation (prepare_dataset.py:929-961): per-domain
    AVE_<d> over raters 1-5 (mean, or majority over non-NaN), banded, and
    optionally restricted to bands {0, 2}."""
    out = dart.copy()
    for d in DART_DOMAINS:
        cols = [f"{d}{i}" for i in range(1, 6)]
        if style == "mean":
            out[f"AVE_{d}"] = out[cols].mean(axis=1)
        else:  # majority of non-NaN scores, ties -> most recently counted
            def maj(row):
                vals = [v for v in row if not pd.isna(v)]
                counts = sorted(Counter(vals).items(), key=lambda el: el[1])
                return counts[-1][0]
            out[f"AVE_{d}"] = out[cols].apply(maj, axis=1)
    col = f"AVE_{domain}"
    out[col] = out[col].apply(dart_band)
    if keep_extremes:
        out = out[out[col].isin([0, 2])]
    return out


def dart_video_split(dart: pd.DataFrame, fold: int,
                     video_col: str = "Video"
                     ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """NS_DART 90/10 split (prepare_dataset.py:997-1006): val fraction is
    10% OF ALL CASES but sampled from the train pool."""
    cases = dart[video_col].unique().tolist()
    rng = random.Random(fold)
    train_cases = rng.sample(cases, int(0.9 * len(cases)))
    val_cases = rng.sample(train_cases, int(0.1 * len(cases)))
    train_cases = list(set(train_cases) - set(val_cases))
    test_cases = list(set(cases) - set(train_cases) - set(val_cases))
    return (dart[dart[video_col].isin(train_cases)],
            dart[dart[video_col].isin(val_cases)],
            dart[dart[video_col].isin(test_cases)])


def filter_min_frames(df: pd.DataFrame, min_nframes: int = 10
                      ) -> pd.DataFrame:
    """Drop gestures spanning <= min_nframes (prepare_dataset.py:969-977)."""
    span = df["EndFrame"] - df["StartFrame"]
    return df[span > min_nframes]


def frame_cap(indices: np.ndarray, cap: int = 2000) -> np.ndarray:
    """The reference hard-caps sequences at 2000 frames
    (prepare_dataset.py:2437), matching the learned pos-embedding table."""
    return indices[:cap]
