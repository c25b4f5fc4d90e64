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
            # 0.1 * nvids (ALL videos), exactly as prepare_dataset.py:1068
            val_vids = random.sample(train_vids, int(0.1 * len(vids)))
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


# ---------------------------------------------------------------------------
# VUA_Gestures / DVC_UCL / NS_vs_VUA branches (round-2 coverage)
# ---------------------------------------------------------------------------

def _timestamp_df(rng, nvids=15, per_vid=8, gestures=(1, 2, 5, 7, 13)):
    rows = []
    for v in range(nvids):
        for i in range(per_vid):
            g = gestures[rng.integers(len(gestures))]
            rows.append({"Path": f"x\\vid{v}", "Gesture": f" {g} ",
                         "StartFrame": 100 * i + 20,
                         "EndFrame": 100 * i + 80})
    # noise rows the cleanup must drop
    rows.append({"Path": "x\\vid0", "Gesture": "nan",
                 "StartFrame": 1, "EndFrame": 2})
    rows.append({"Path": "x\\vid0", "Gesture": "1,2",
                 "StartFrame": 1, "EndFrame": 2})
    return pd.DataFrame(rows)


def test_vua_gestures_tables_match_reference():
    from sais_tpu.data.reference_datasets import (clean_gesture_timestamps,
                                                  vua_gestures_tables)
    rng = np.random.default_rng(1)
    raw = _timestamp_df(rng)
    data, classes = vua_gestures_tables(raw, "Top4", fold=2, balance=True)
    assert classes == sorted(data["train"]["Gesture"].unique().tolist())
    assert set(data["train"]["Gesture"]) <= {1, 2, 7, 13}
    # literal transcription (prepare_dataset.py:1296-1334, 1378-1394)
    df = clean_gesture_timestamps(raw)
    df = df[df["Gesture"].isin([1, 2, 7, 13])]
    train_df = pd.DataFrame()
    for gesture in sorted(df["Gesture"].unique().tolist()):
        curr = df[df["Gesture"] == gesture]
        vids = curr["Video"].unique().tolist()
        random.seed(2)
        train_vids = random.sample(vids, int(0.9 * len(vids)))
        random.sample(train_vids, int(0.1 * len(vids)))  # val (in-train)
        train_df = pd.concat((train_df, curr[curr["Video"].isin(train_vids)]))
    train_df = balance_gestures(train_df)
    pd.testing.assert_frame_equal(data["train"].reset_index(drop=True),
                                  train_df.reset_index(drop=True))
    # train+val phase exists and is the concat
    assert len(data["train+val"]) == len(data["train"]) + len(data["val"])
    # 'X_vs_Y' binary domains filter to the pair
    data2, classes2 = vua_gestures_tables(raw, "1_vs_7", fold=0)
    assert classes2 == [1, 7]


def test_dvc_ucl_tables_subtract_val_and_merge():
    from sais_tpu.data.reference_datasets import dvc_ucl_tables
    rng = np.random.default_rng(3)
    raw = _timestamp_df(rng, gestures=(0, 1, 2, 3, 4, 5, 6, 7))
    data, classes = dvc_ucl_tables(raw, fold=1, balance=True)
    assert 5 not in set(classes)  # gesture 5 excluded (:1488)
    # val/test are the same held-out table; train is train+val merged
    pd.testing.assert_frame_equal(data["val"], data["test"])
    # DVC subtracts val videos from train (the active Feb-26 line, :1432):
    # within each gesture, no video overlap between the split parts before
    # balancing is guaranteed — check the merged train has both parts
    assert len(data["train"]) >= len(data["val"])


def test_ns_vs_vua_tables():
    from sais_tpu.data.reference_datasets import ns_vs_vua_tables
    rng = np.random.default_rng(4)
    # VUA stitch table
    rows = []
    for v in range(10):
        for s in range(4):
            start = int(rng.integers(50, 200))
            entry = start + int(rng.integers(40, 120))
            wd = entry + int(rng.integers(100, 200))
            race, ease = [("Needle Handling", "# Repositions"),
                          ("Needle Withdrawal", "Wrist Rotation"),
                          ("Needle Driving", "Driving Sequence")][s % 3]
            rows.append({"File": v, "Path": f"x\\vvid{v}", "Stitch": s,
                         "RACE": race, "EASE": ease,
                         "maj": int(rng.integers(0, 3)),
                         "Needle Handling Start Frame": start,
                         "Needle Entry Start Frame": entry,
                         "Needle Withdrawal Start Frame": wd,
                         "Needle Withdrawal End Frame": wd + 120})
    vua = pd.DataFrame(rows)
    ns_rows = []
    for v in range(12):
        for i in range(40):
            ns_rows.append({"Path": f"x\\nvid{v}",
                            "Gesture": ["p", "h", "c", "r", "m", "k"][i % 6],
                            "Note": np.nan,
                            "StartFrame": 30 * i + 1,
                            "EndFrame": 30 * i + 25})
    ns = pd.DataFrame(ns_rows)
    data, classes = ns_vs_vua_tables(vua, ns, fold=0, balance=True)
    assert classes == ["NS", "VUA"]
    for phase in ("train", "val", "test"):
        if len(data[phase]):
            counts = data[phase]["Domain"].value_counts()
            assert counts.min() == counts.max()  # domain-balanced
            assert set(data[phase].columns) == {"StartFrame", "EndFrame",
                                                "Domain", "Video"}
    # NW windows are +/-40 around withdrawal start
    from sais_tpu.data.reference_datasets import vua_ease_window
    row = vua[vua["RACE"] == "Needle Withdrawal"].iloc[0]
    s, e = vua_ease_window("Needle Withdrawal", row)
    assert e - s == 80
    assert s == row["Needle Withdrawal Start Frame"] - 40


def test_gronau_inference_sampling():
    from sais_tpu.data.reference_datasets import (
        gronau_gesture_inference_table)
    rng = np.random.default_rng(5)
    rows = []
    for pid in range(4):
        for g in ("p", "h", "c"):
            for i in range(5 if pid % 2 == 0 else 2):
                rows.append({"Path": f"x\\g{pid}", "PID": pid, "Gesture": g,
                             "StartFrame": 10 * i, "EndFrame": 10 * i + 30})
    df = pd.DataFrame(rows)
    out = gronau_gesture_inference_table(df)
    # only (pid, gesture) groups with >= 3 examples survive, sampled to 3
    assert set(out["PID"]) == {0, 2}
    assert all(len(g) == 3 for _, g in out.groupby(["PID", "Gesture"]))


def test_balance_groups_matches_reference():
    from sais_tpu.data.reference_datasets import (balance_groups,
                                                  prepare_usc_meta)
    rng = np.random.default_rng(6)
    meta = pd.DataFrame({
        "CaseID": list(range(20)),
        "TaskID": [11] * 20,
        "Surgery Date": pd.to_datetime(["2017-01-01"] * 20),
        "2016 Robotic Cases": [np.nan] * 20,
        "2017 Robotic Cases": [50 if i < 10 else 200 for i in range(20)],
        "2018 Robotic Cases": [np.nan] * 20,
        "2019 Robotic Cases": [np.nan] * 20,
        "Prostate volume": rng.normal(49, 10, 20),
        "Age": rng.normal(66, 5, 20),
        "BMI": rng.normal(28, 3, 20),
    })
    meta = prepare_usc_meta(meta)
    assert set(meta["Caseload Group"].dropna()) == {"novice", "expert"}
    df = pd.DataFrame({
        "File": list(range(20)) * 2,
        "Anatomy": ["Posterior"] * 40,
        "maj": [0] * 20 + [2] * 20,
        "x": rng.normal(size=40),
    })
    out = balance_groups(df, meta)
    # within each skill class, novice/expert counts equalized
    for label in (0, 2):
        counts = out[out["maj"] == label]["Caseload Group"].value_counts()
        assert counts.min() == counts.max()


def _stitch_multi_race_df(n_videos=15, seed=3):
    """Synthetic stitch table covering all three RACE/EASE pairings."""
    rng = np.random.default_rng(seed)
    races = [("Needle Handling", "# Repositions"),
             ("Needle Driving", "Driving Sequence"),
             ("Needle Withdrawal", "Wrist Rotation")]
    rows = []
    for v in range(n_videos):
        for s, (race, ease) in enumerate(races):
            start = int(rng.integers(30, 200))
            entry = start + int(rng.integers(40, 120))
            wd_start = entry + int(rng.integers(30, 80))
            wd_end = wd_start + int(rng.integers(90, 150))
            rows.append({
                "File": v, "Video": f"vid{v}", "Stitch": s,
                "Path": f"p\\vid{v}", "RACE": race, "EASE": ease,
                "maj": int(rng.integers(0, 3)),
                "Needle Handling Start Frame": start,
                "Needle Entry Start Frame": entry,
                "Needle Withdrawal Start Frame": wd_start,
                "Needle Withdrawal End Frame": wd_end,
            })
    return pd.DataFrame(rows)


def test_stitch_phase_tables_rng_exact():
    """Literal transcription of the reference split (prepare_dataset.py
    :513-551) must agree row-for-row."""
    import random as pyrandom

    from sais_tpu.data.reference_datasets import stitch_phase_tables

    df = _stitch_multi_race_df()
    fold = 2
    tables, classes = stitch_phase_tables(df, fold)
    assert classes == ["# Repositions", "Driving Sequence", "Wrist Rotation"]

    # --- reference transcription ---
    ref = df[~df["File"].isin([102, 372])].copy()

    def durFilterFunc(row):
        if row["RACE"] == "Needle Handling":
            return (row["Needle Entry Start Frame"]
                    - row["Needle Handling Start Frame"]) > 20
        if row["RACE"] == "Needle Withdrawal":
            return (row["Needle Withdrawal End Frame"]
                    - row["Needle Withdrawal Start Frame"]) > 80
        diff = (row["Needle Withdrawal Start Frame"]
                - row["Needle Entry Start Frame"])
        return diff > int(diff * 0.20)

    ref = ref[ref.apply(durFilterFunc, axis=1)]

    def RaceAndEaseFilter(row):
        return (row["RACE"], row["EASE"]) in {
            ("Needle Withdrawal", "Wrist Rotation"),
            ("Needle Handling", "# Repositions"),
            ("Needle Driving", "Driving Sequence")}

    ref = ref[ref.apply(RaceAndEaseFilter, axis=1)]
    ref = ref[ref["maj"].isin([0, 1, 2])]
    cases = ref["Video"].unique().tolist()
    pyrandom.seed(fold)
    train_cases = pyrandom.sample(cases, int(0.9 * len(cases)))
    val_cases = pyrandom.sample(train_cases, int(0.1 * len(train_cases)))
    train_cases = list(set(train_cases) - set(val_cases))
    test_cases = list(set(cases) - set(train_cases) - set(val_cases))
    assert sorted(tables["train"]["Video"].unique()) == sorted(train_cases)
    assert sorted(tables["val"]["Video"].unique()) == sorted(val_cases)
    assert sorted(tables["test"]["Video"].unique()) == sorted(test_cases)
    assert (tables["train"]["Domain"] == "NH_vs_ND_vs_NW").all()


def test_stitch_phase_training_fraction():
    from sais_tpu.data.reference_datasets import stitch_phase_tables

    df = _stitch_multi_race_df()
    full, _ = stitch_phase_tables(df, fold=1)
    frac, _ = stitch_phase_tables(df, fold=1, training_fraction=0.5)
    n = len(full["train"])
    assert len(frac["train"]) == int(n * 0.5)
    # reference semantics: df_train.sample(n, random_state=0)
    expect = full["train"].sample(n=int(n * 0.5), random_state=0)
    assert list(frac["train"]["Stitch"]) == list(expect["Stitch"])
    assert list(frac["train"]["Video"]) == list(expect["Video"])
    # val/test untouched
    assert len(frac["val"]) == len(full["val"])
    assert len(frac["test"]) == len(full["test"])


def test_ns_vs_vua_training_fraction_applies_to_vua_part():
    from sais_tpu.data.reference_datasets import ns_vs_vua_tables

    vua = _stitch_multi_race_df(n_videos=20)
    rng = np.random.default_rng(7)
    ns_rows = []
    for v in range(12):
        for g in ["a", "b", "c", "d", "e", "f"]:
            for i in range(25):
                s = int(rng.integers(0, 5000))
                ns_rows.append({"Video": f"ns{v}", "Gesture": g,
                                "StartFrame": s,
                                "EndFrame": s + 20 + i,
                                "Note": np.nan})
    ns = pd.DataFrame(ns_rows)
    full, _ = ns_vs_vua_tables(vua, ns, fold=0, balance=False)
    frac, _ = ns_vs_vua_tables(vua, ns, fold=0, balance=False,
                               training_fraction=0.5)
    n_vua_full = (full["train"]["Domain"] == "VUA").sum()
    n_vua_frac = (frac["train"]["Domain"] == "VUA").sum()
    assert n_vua_frac == int(n_vua_full * 0.5)
    # the unconditional domain balancing (prepare_dataset.py:879-881) then
    # downsamples NS to the (now smaller) VUA minority count
    assert (frac["train"]["Domain"] == "NS").sum() == n_vua_frac


def test_cinvivo_inference_windows_match_reference():
    """Literal transcription of prepare_dataset.py:1199-1226 as oracle."""
    from sais_tpu.data.reference_datasets import cinvivo_inference_table
    rng = np.random.default_rng(11)
    rows = []
    for cat, lab, n in [("surgery", "caseA", 107), ("surgery", "caseB", 15),
                        ("lab", "caseC", 44), ("lab", "caseD", 7)]:
        for i in range(n):
            rows.append({"path": f"frames/{lab}/f_{i:08d}.jpg",
                         "category": cat, "label": lab})
    paths_df = pd.DataFrame(rows)

    # --- reference math, transcribed verbatim ---
    df = paths_df.copy()
    countdf = df.groupby(by=["category", "label"]).count().reset_index()
    countdf.columns = ["category", "label", "count"]
    duration, hop, fps = 0.5, 0.5, 30
    duration_frames = int(duration * fps)
    hop_frames = int(hop * fps)
    inference_df = pd.DataFrame()
    for idx, (category, label, total_frames) in countdf.iterrows():
        nsamples = (total_frames - duration_frames) // hop_frames + 1
        startframes = [n * hop_frames for n in range(nsamples)]
        endframes = [s + duration_frames for s in startframes]
        frames_df = pd.DataFrame([startframes, endframes]).T
        frames_df.columns = ["StartFrame", "EndFrame"]
        frames_df[["category", "label"]] = [category, label]
        frames_df[["Video", "Domain"]] = [label, "Gesture"]
        inference_df = pd.concat((inference_df, frames_df), axis=0)
    # --- end transcription ---

    out = cinvivo_inference_table(paths_df)
    ref = inference_df.reset_index(drop=True)
    got = out.reset_index(drop=True)
    assert list(got.columns) == list(ref.columns)
    for col in ref.columns:
        assert got[col].astype(ref[col].dtype).tolist() == ref[col].tolist()
    # caseD (7 frames < one window) contributes nothing
    assert "caseD" not in set(got["Video"])
    # caseA: (107-15)//15+1 = 7 windows
    assert (got["Video"] == "caseA").sum() == 7


def test_ns_vs_vua_batches_sampling():
    """NS_vs_VUA collation: fixed stride 10, 2000-frame cap, label 0=NS /
    1=VUA (prepare_dataset.py:2405-2438), per-domain store dispatch."""
    import numpy as np
    import pandas as pd

    from sais_tpu.config import WindowConfig
    from sais_tpu.data.reference_datasets import (DomainKeyedStore,
                                                  ns_vs_vua_batches)

    class Store:
        def __init__(self, base):
            self.base = base

        def read_video(self, name):
            return (np.arange(30000, dtype=np.float32)[:, None]
                    + self.base) * np.ones((1, 4), np.float32)

    rows = pd.DataFrame({
        "Video": ["nsv", "vuav"],
        "Domain": ["NS", "VUA"],
        "StartFrame": [1, 1],
        "EndFrame": [25001, 301],
    })
    store = DomainKeyedStore({"NS": Store(0.0), "VUA": Store(1.0)},
                             {"nsv": "NS", "vuav": "VUA"})
    (batch,) = ns_vs_vua_batches(rows, store, None, WindowConfig(),
                                 batch_size=2, shuffle=False)
    np.testing.assert_array_equal(batch["labels"], [0, 1])
    # 25000-frame segment: stride 10 -> 2500 indices, capped at 2000
    lens = (~batch["rgb_mask"][:, 0, 1:]).sum(-1)
    assert lens[0] == 2000 and lens[1] == 30
    # stride 10 grid from frame-index 0 (StartFrame-1)
    np.testing.assert_allclose(batch["rgb"][1, 0, :3, 0],
                               [1.0, 11.0, 21.0])
