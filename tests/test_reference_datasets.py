"""Named dataset-policy parity vs literal reference transcriptions."""

import random

import numpy as np
import pandas as pd

from sais_tpu.data.reference_datasets import (aggregate_dart_scores,
                                              balance_gestures, dart_band,
                                              dart_video_split,
                                              filter_min_frames,
                                              instance_split,
                                              jigsaws_phase_tables,
                                              leave_one_user_out_split,
                                              per_gesture_video_split)


def _gesture_df(rng, nvids=20, per_vid=6, gestures=("a", "b", "c")):
    rows = []
    for v in range(nvids):
        for i in range(per_vid):
            rows.append({"Video": f"v{v}",
                         "Gesture": gestures[rng.integers(len(gestures))],
                         "StartFrame": 10 * i + 1, "EndFrame": 10 * i + 50})
    return pd.DataFrame(rows)


def test_per_gesture_video_split_matches_reference():
    rng = np.random.default_rng(0)
    df = _gesture_df(rng)
    for fold in (0, 1, 3):
        ours_tr, ours_va, ours_te = per_gesture_video_split(df, fold,
                                                            balance=False)
        # literal reference (prepare_dataset.py:1047-1067)
        train_df = pd.DataFrame()
        val_df = pd.DataFrame()
        test_df = pd.DataFrame()
        for gesture in sorted(df["Gesture"].unique().tolist()):
            curr = df[df["Gesture"] == gesture]
            vids = curr["Video"].unique().tolist()
            random.seed(fold)
            train_vids = random.sample(vids, int(0.9 * len(vids)))
            val_vids = random.sample(train_vids, int(0.1 * len(train_vids)))
            test_vids = list(set(vids) - set(train_vids) - set(val_vids))
            train_df = pd.concat((train_df, curr[curr["Video"].isin(train_vids)]))
            val_df = pd.concat((val_df, curr[curr["Video"].isin(val_vids)]))
            test_df = pd.concat((test_df, curr[curr["Video"].isin(test_vids)]))
        val_df = balance_gestures(val_df)
        test_df = balance_gestures(test_df)
        pd.testing.assert_frame_equal(ours_tr.reset_index(drop=True),
                                      train_df.reset_index(drop=True))
        assert len(ours_va) == len(val_df) and len(ours_te) == len(test_df)
        # the val-inside-train quirk: val videos remain in train
        overlap = set(ours_va["Video"]) & set(ours_tr["Video"])
        assert overlap == set(ours_va["Video"])


def test_louo_split_matches_reference():
    df = pd.DataFrame({"Subject": list("BBCCDDEEFF"),
                       "Gesture": ["G1"] * 10, "Video": [f"t{i}" for i in range(10)]})
    for fold in range(5):
        tr, va, te = leave_one_user_out_split(df, fold)
        users = df["Subject"].unique().tolist()
        test_user = users[fold]
        others = set(users) - {test_user}
        random.seed(fold)
        shuffled = random.sample(sorted(others), len(others))
        assert set(te["Subject"]) == {test_user}
        assert set(va["Subject"]) == {shuffled[-1]}
        assert set(tr["Subject"]) == set(shuffled[:-1])
        assert not (set(tr["Subject"]) | set(va["Subject"])) & {test_user}


def test_jigsaws_phase_tables():
    rng = np.random.default_rng(1)
    rows = []
    for s in "BCDEF":
        for t in range(4):
            for g in ("G1", "G2", "G3", "G99"):
                rows.append({"Subject": s, "Video": f"{s}{t}", "Gesture": g,
                             "StartFrame": 1, "EndFrame": 60})
    df = pd.DataFrame(rows)
    tables = jigsaws_phase_tables(df, fold=0, balance=False)
    assert "G99" not in set(tables["train"]["Gesture"])  # whitelist
    # val == test == held-out user
    pd.testing.assert_frame_equal(tables["val"], tables["test"])
    assert len(set(tables["train"]["Subject"])) == 4


def test_dart_aggregation_and_banding():
    assert dart_band(2.5) == 0 and dart_band(2.7) == 1
    assert dart_band(3.0) == 2 and dart_band(3.4) == 3.4
    rng = np.random.default_rng(2)
    rows = []
    for v in range(10):
        row = {"Video": f"v{v}"}
        for d in ("GS", "IVA", "RTP", "TH", "TR", "E"):
            for i in range(1, 6):
                row[f"{d}{i}"] = float(rng.integers(2, 5))
        rows.append(row)
    dart = pd.DataFrame(rows)
    out = aggregate_dart_scores(dart, domain="TR", style="mean")
    # banded to extremes only
    assert set(out["AVE_TR"].unique()).issubset({0, 2})
    ref_means = dart[[f"TR{i}" for i in range(1, 6)]].mean(axis=1)
    kept = ref_means.apply(dart_band).isin([0, 2])
    assert len(out) == int(kept.sum())


def test_dart_split_and_filters():
    df = pd.DataFrame({"Video": [f"v{i}" for i in range(20)]})
    tr, va, te = dart_video_split(df, fold=0)
    assert len(tr) + len(va) + len(te) == 20
    assert not (set(tr["Video"]) & set(va["Video"]))
    seg = pd.DataFrame({"StartFrame": [0, 0, 0], "EndFrame": [5, 11, 100]})
    assert filter_min_frames(seg)["EndFrame"].tolist() == [11, 100]

    inst = pd.DataFrame({"Gesture": ["a", "b"] * 20, "x": range(40)})
    tr, va, te = instance_split(inst, balance=True)
    assert len(tr) == int(0.8 * 40) and len(va) == 8
    pd.testing.assert_frame_equal(va, te)
