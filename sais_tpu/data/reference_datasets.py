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
    90% of videos train; val is 10% OF ALL VIDEOS sampled from the train
    pool (`int(0.1*nvids)`, :1068 — NOT 10% of train); the original leaves
    val inside train (the subtraction is commented out) — preserved."""
    train, val, test = [], [], []
    for gesture in sorted(df[label_col].unique().tolist()):
        cur = df[df[label_col] == gesture]
        vids = cur[video_col].unique().tolist()
        rng = random.Random(fold)
        train_vids = rng.sample(vids, int(0.9 * len(vids)))
        val_vids = rng.sample(train_vids, int(0.1 * len(vids)))
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


# ---------------------------------------------------------------------------
# VUA_Gestures_Classification (prepare_dataset.py:1283-1395)
# ---------------------------------------------------------------------------

def clean_gesture_timestamps(df: pd.DataFrame,
                             int_labels: bool = True) -> pd.DataFrame:
    """Shared timestamp-CSV cleanup (prepare_dataset.py:1358-1364 and
    :1476-1482): Video from the path tail, stripped labels, drop NaN and
    multi-label rows, integer-cast gestures."""
    df = df.copy()
    if "Video" not in df.columns:
        df["Video"] = df["Path"].apply(
            lambda p: p.split("\\")[-1] if "\\" in p else p.split("/")[-1])
    df["Gesture"] = df["Gesture"].apply(lambda g: str(g).strip())
    df = df[df["Gesture"] != "nan"]
    df = df[df["Gesture"].apply(lambda g: len(g.split(",")) == 1)]
    if int_labels:
        df["Gesture"] = df["Gesture"].astype(int)
    return df


VUA_TOP4_GESTURES = [1, 2, 7, 13]  # prepare_dataset.py:1378


def vua_gestures_tables(df: pd.DataFrame, domain: str, fold: int,
                        balance: bool = True
                        ) -> Tuple[Dict[str, pd.DataFrame], List]:
    """VUA_Gestures_Classification (prepare_dataset.py:1283-1395):
    domain = 'Top4' or 'X_vs_Y'; per-gesture video split with the
    val-inside-train quirk; phases include the merged 'train+val' table
    the reference loader exposes (:1392-1394)."""
    df = clean_gesture_timestamps(df)
    if "vs" in domain:
        gestures = [int(g) for g in domain.split("_vs_")]
    else:  # 'Top4'
        gestures = VUA_TOP4_GESTURES
    df = df[df["Gesture"].isin(gestures)]
    tr, va, te = per_gesture_video_split(df, fold, balance=balance)
    classes = sorted(tr["Gesture"].unique().tolist())
    return ({"train": tr, "val": va,
             "train+val": pd.concat((tr, va), axis=0), "test": te},
            classes)


# ---------------------------------------------------------------------------
# DVC_UCL_Gestures_Classification (prepare_dataset.py:1396-1500)
# ---------------------------------------------------------------------------

DVC_UCL_GESTURES = [0, 1, 2, 3, 4, 6, 7]  # :1488 ('removed 5 b/c not enough')


def dvc_ucl_tables(df: pd.DataFrame, fold: int, balance: bool = True
                   ) -> Tuple[Dict[str, pd.DataFrame], List]:
    """DVC_UCL branch: unlike the NS/VUA splits, the 'Feb 26 2022'
    train-minus-val subtraction IS active here (:1432), and the loader
    trains on train+val merged with the test split as both val and test
    (:1497)."""
    df = clean_gesture_timestamps(df)
    df = df[df["Gesture"].isin(DVC_UCL_GESTURES)]
    train, val, test = [], [], []
    for gesture in sorted(df["Gesture"].unique().tolist()):
        cur = df[df["Gesture"] == gesture]
        vids = cur["Video"].unique().tolist()
        rng = random.Random(fold)
        train_vids = rng.sample(vids, int(0.9 * len(vids)))
        val_vids = rng.sample(train_vids, int(0.1 * len(vids)))
        train_vids = list(set(train_vids) - set(val_vids))
        test_vids = list(set(vids) - set(train_vids) - set(val_vids))
        train.append(cur[cur["Video"].isin(train_vids)])
        val.append(cur[cur["Video"].isin(val_vids)])
        test.append(cur[cur["Video"].isin(test_vids)])
    tr = pd.concat(train, axis=0) if train else pd.DataFrame()
    va = pd.concat(val, axis=0) if val else pd.DataFrame()
    te = pd.concat(test, axis=0) if test else pd.DataFrame()
    if balance:
        tr = balance_gestures(tr) if len(tr) else tr
    va = balance_gestures(va) if len(va) else va
    te = balance_gestures(te) if len(te) else te
    classes = sorted(tr["Gesture"].unique().tolist())
    return ({"train": pd.concat((tr, va), axis=0), "val": te, "test": te},
            classes)


# ---------------------------------------------------------------------------
# NS_vs_VUA domain discrimination (prepare_dataset.py:569-888)
# ---------------------------------------------------------------------------

NS_TOP6_GESTURES = ["p", "h", "c", "r", "m", "k"]  # :856


def vua_ease_window(race: str, row) -> Tuple[int, int]:
    """getStartAndEndFrame (prepare_dataset.py:600-612): NW windows are
    +/-40 frames around the withdrawal start; NH/ND span their phases."""
    if race == "Needle Withdrawal":
        s = row["Needle Withdrawal Start Frame"]
        return s - 40, s + 40
    if race == "Needle Handling":
        return (row["Needle Handling Start Frame"],
                row["Needle Entry Start Frame"])
    return (row["Needle Entry Start Frame"],
            row["Needle Withdrawal Start Frame"])


def stitch_phase_tables(stitch_df: pd.DataFrame, fold: int,
                        training_fraction: float = 1.0
                        ) -> Tuple[Dict[str, pd.DataFrame], List[str]]:
    """VUA_EASE_Stitch sub-phase recognition, TRAINING path
    (prepare_dataset.py:428-568, `else` branch at :513-565).

    Rows are EASE stitch annotations; the label is the EASE domain name
    (equivalently the RACE sub-phase: NH vs ND vs NW).  Reproduces the
    reference exactly: File 102/372 exclusion, per-RACE duration filter,
    the three RACE/EASE pairings with maj in {0,1,2}, the fold-seeded
    0.9/0.1 video split, Domain='NH_vs_ND_vs_NW', and the -tf
    training-fraction subsample (df_train.sample(n, random_state=0),
    :549-551).  Classes are returned in LabelEncoder (alphabetical) order.
    """
    from sais_tpu.data.skill import duration_filter, ease_video_split

    df = stitch_df[~stitch_df["File"].isin([102, 372])].copy()
    if "Video" not in df.columns:
        df["Video"] = df["Path"].apply(
            lambda p: p.split("\\")[-1] if "\\" in p else p.split("/")[-1])
    df = duration_filter(df)
    pairs = [("Needle Withdrawal", "Wrist Rotation"),
             ("Needle Handling", "# Repositions"),
             ("Needle Driving", "Driving Sequence")]
    keep = False
    for race, ease in pairs:
        keep = keep | ((df["RACE"] == race) & (df["EASE"] == ease))
    df = df[keep & df["maj"].isin([0, 1, 2])]
    tr, va, te = ease_video_split(df, fold)
    tr, va, te = tr.copy(), va.copy(), te.copy()
    for part in (tr, va, te):
        part["Domain"] = "NH_vs_ND_vs_NW"
    if training_fraction < 1 and len(tr):
        tr = tr.sample(n=int(len(tr) * training_fraction), random_state=0)
    classes = sorted(["Wrist Rotation", "# Repositions", "Driving Sequence"])
    return ({"train": tr.reset_index(drop=True),
             "val": va.reset_index(drop=True),
             "test": te.reset_index(drop=True)}, classes)


def ns_vs_vua_tables(vua_stitch: pd.DataFrame, ns_timestamps: pd.DataFrame,
                     fold: int, balance: bool = True,
                     training_fraction: float = 1.0
                     ) -> Tuple[Dict[str, pd.DataFrame], List[str]]:
    """Combined NS-vs-VUA activity-discrimination dataset
    (prepare_dataset.py:569-888, training path):

    VUA part — EASE stitch rows filtered by duration + all three RACE/EASE
    pairings, maj in {0,1,2}, windows via getStartAndEndFrame, 0.9/0.1
    video split (val = 10% of TRAIN here, :698-701); NS part — gesture
    timestamps with the P-129 exclusion, >10-frame and >100-count filters,
    Note-free rows, Top6 gestures, per-gesture split; domains balanced to
    the minority count with random_state=1 (:879-881).
    """
    from sais_tpu.data.skill import duration_filter

    vua = vua_stitch[~vua_stitch["File"].isin([102, 372])].copy()
    if "Video" not in vua.columns:
        vua["Video"] = vua["Path"].apply(lambda p: p.split("\\")[-1])
    vua = duration_filter(vua)
    pairs = [("Needle Withdrawal", "Wrist Rotation"),
             ("Needle Handling", "# Repositions"),
             ("Needle Driving", "Driving Sequence")]
    keep = False
    for race, ease in pairs:
        keep = keep | ((vua["RACE"] == race) & (vua["EASE"] == ease))
    vua = vua[keep & vua["maj"].isin([0, 1, 2])]
    vua["Domain"] = "VUA"
    se = vua.apply(lambda row: pd.Series(vua_ease_window(row["RACE"], row)),
                   axis=1)
    vua[["StartFrame", "EndFrame"]] = se.to_numpy()

    cases = vua["Video"].unique().tolist()
    rng = random.Random(fold)
    train_cases = rng.sample(cases, int(0.9 * len(cases)))
    val_cases = rng.sample(train_cases, int(0.1 * len(train_cases)))
    train_cases = list(set(train_cases) - set(val_cases))
    cols = ["StartFrame", "EndFrame", "Domain", "Video"]
    vua = vua[cols]
    vua_tr = vua[vua["Video"].isin(train_cases)]
    vua_va = vua[vua["Video"].isin(val_cases)]
    vua_te = vua[~vua["Video"].isin(train_cases + val_cases)]
    if training_fraction < 1 and len(vua_tr):
        # -tf subsample of the VUA train rows (prepare_dataset.py:703-705)
        vua_tr = vua_tr.sample(n=int(len(vua_tr) * training_fraction),
                               random_state=0)

    ns = clean_gesture_timestamps(ns_timestamps, int_labels=False)
    ns = ns[~ns["Video"].str.contains("P-129")]
    ns["Domain"] = "NS"
    ns = filter_min_frames(ns)
    counts = ns["Gesture"].value_counts()
    ns = ns[ns["Gesture"].isin(counts[counts > 100].index.tolist())]
    if "Note" in ns.columns:
        ns = ns[ns["Note"].isna()]
    ns = ns[ns["Gesture"].isin(NS_TOP6_GESTURES)]
    ns_tr, ns_va, ns_te = per_gesture_video_split(ns, fold, balance=balance)

    out = {}
    for phase, v_part, n_part in (("train", vua_tr, ns_tr),
                                  ("val", vua_va, ns_va),
                                  ("test", vua_te, ns_te)):
        n_part = n_part[cols] if len(n_part) else v_part.iloc[:0]
        comb = pd.concat((v_part, n_part), axis=0)
        out[phase] = balance_gestures(comb, label_col="Domain") \
            if len(comb) and comb["Domain"].nunique() else comb
    return out, sorted(["NS", "VUA"])


def gronau_gesture_inference_table(df: pd.DataFrame,
                                   gestures: Sequence[str] = tuple(
                                       NS_TOP6_GESTURES),
                                   random_state: int = 1) -> pd.DataFrame:
    """Per-(PID, gesture) breadth-sampling inference tables: with >= 3
    examples, sample exactly 3.  The reference uses random_state=1 for
    Gronau_inference (prepare_dataset.py:794-827, :1150-1166) and
    random_state=0 for RAPN_inference (:1180-1198) — pass it accordingly."""
    df = clean_gesture_timestamps(df, int_labels=False)
    df = filter_min_frames(df)
    df = df[df["Gesture"].isin(list(gestures))]
    parts = []
    for pid in sorted(df["PID"].unique().tolist()):
        for gesture in sorted(df["Gesture"].unique().tolist()):
            cur = df[(df["PID"] == pid) & (df["Gesture"] == gesture)]
            if len(cur) >= 3:
                parts.append(cur.sample(n=3, replace=False,
                                        random_state=random_state))
    return pd.concat(parts, axis=0) if parts else pd.DataFrame()


def rapn_gesture_inference_table(df: pd.DataFrame,
                                 gestures: Sequence[str] = tuple(
                                     NS_TOP6_GESTURES)) -> pd.DataFrame:
    """RAPN_inference variant (prepare_dataset.py:1180-1198)."""
    return gronau_gesture_inference_table(df, gestures, random_state=0)


def cinvivo_inference_table(paths_df: pd.DataFrame, fps: int = 30,
                            duration_s: float = 0.5,
                            hop_s: float = 0.5) -> pd.DataFrame:
    """CinVivo_inference window phase (prepare_dataset.py:1199-1226).

    The reference counts frames per (category, label) group of
    CinVivo_Paths.csv and lays duration = hop = 0.5 s windows at 30 fps
    over each group: nsamples = (total - 15) // 15 + 1, StartFrame =
    n * 15, EndFrame = StartFrame + 15, with Video = label and
    Domain = 'Gesture'.  Groups shorter than one window contribute no
    rows (the reference's range() over a non-positive count).  The
    separate dataset-name choice 'CinVivo_OutView'
    (run_experiments.py:20) has no VideoDataset branch upstream and is
    dead code — this phase, inside NS_Gestures_Classification, is the
    live CinVivo path.
    """
    dur = int(duration_s * fps)
    hop = int(hop_s * fps)
    counts = (paths_df.groupby(["category", "label"]).size()
              .reset_index(name="count"))
    parts = []
    for _, row in counts.iterrows():
        nsamples = (int(row["count"]) - dur) // hop + 1
        starts = np.arange(max(nsamples, 0)) * hop
        part = pd.DataFrame({"StartFrame": starts, "EndFrame": starts + dur})
        part["category"] = row["category"]
        part["label"] = row["label"]
        part["Video"] = row["label"]
        part["Domain"] = "Gesture"
        parts.append(part)
    if not parts:
        return pd.DataFrame(columns=["StartFrame", "EndFrame", "category",
                                     "label", "Video", "Domain"])
    return pd.concat(parts, axis=0)


# ---------------------------------------------------------------------------
# Group balancing (-bg) over surgeon/patient meta (prepare_dataset.py:190-257)
# ---------------------------------------------------------------------------

def prepare_usc_meta(meta_df: pd.DataFrame) -> pd.DataFrame:
    """loadMetaInfo USC path (prepare_dataset.py:240-257): caseload from
    the surgery-year column, novice/expert banding at 100 cases, median
    splits for prostate volume / age / BMI."""
    meta = meta_df.copy()
    meta["TaskID"] = meta["TaskID"].astype(int)
    meta["Surgery Date"] = pd.to_datetime(meta["Surgery Date"])
    meta["Surgery Year"] = meta["Surgery Date"].apply(
        lambda d: int(d.year) if not pd.isnull(d) else d)
    meta["Caseload"] = meta.apply(
        lambda row: row[f"{row['Surgery Year']} Robotic Cases"]
        if row["Surgery Year"] in (2016, 2017, 2018, 2019) else np.nan,
        axis=1)
    meta["Caseload"] = meta["Caseload"].fillna(-1).astype(int)
    meta["Caseload Group"] = pd.cut(meta["Caseload"], [0, 100, float("inf")],
                                    labels=["novice", "expert"])
    meta["Prostate Volume Group"] = pd.qcut(meta["Prostate volume"],
                                            [0, 0.5, 1], labels=["≤49", ">49"])
    meta["Patient Age Group"] = pd.qcut(meta["Age"], [0, 0.5, 1],
                                        labels=["≤66", ">66"])
    meta["Patient BMI Group"] = pd.qcut(meta["BMI"], [0, 0.5, 1],
                                        labels=["≤28", ">28"])
    return meta


def balance_groups(df: pd.DataFrame, meta_df: pd.DataFrame,
                   group: str = "Caseload Group") -> pd.DataFrame:
    """balanceGroups (prepare_dataset.py:190-213): merge surgeon/patient
    meta by (CaseID, TaskID), then within every skill class downsample each
    group value to the per-class minority count (random_state=0)."""
    meta = meta_df.drop_duplicates(subset=["CaseID", "TaskID"], keep="first")
    df = df.copy()
    df["TaskID"] = df["Anatomy"].apply(
        lambda side: 11 if side == "Posterior" else 12)
    df.columns = df.columns.astype(str)
    df.columns = df.columns.str.replace("File", "CaseID")
    df = df.merge(meta, how="left", on=["CaseID", "TaskID"])
    final = []
    for label in df["maj"].unique().tolist():
        cur = df[df["maj"] == label]
        min_amount = int(cur[group].value_counts().min())
        for group_val in cur[cur[group].notna()][group].unique():
            final.append(cur[cur[group] == group_val].sample(
                n=min_amount, replace=False, random_state=0))
    return pd.concat(final, axis=0) if final else df.iloc[:0]


def single_group(df: pd.DataFrame, meta_df: pd.DataFrame, group: str,
                 group_val: str) -> pd.DataFrame:
    """getSingleGroup (prepare_dataset.py:215-236): keep only rows whose
    merged meta matches one group value (e.g. prostate volume > 60 ml)."""
    meta = meta_df.drop_duplicates(subset=["CaseID", "TaskID"], keep="first")
    df = df.copy()
    df["TaskID"] = df["Anatomy"].apply(
        lambda side: 11 if side == "Posterior" else 12)
    df.columns = df.columns.astype(str)
    df.columns = df.columns.str.replace("File", "CaseID")
    df = df.merge(meta, how="left", on=["CaseID", "TaskID"])
    return df[df[group] == group_val]


class DomainKeyedStore:
    """read_video dispatch over per-domain stores (the reference opens one
    h5 per domain for NS_vs_VUA, hf_rgb[domain], prepare_dataset.py:2439).
    rows must carry unique video names across domains."""

    def __init__(self, stores: Dict[str, object],
                 video_to_domain: Dict[str, str]):
        self.stores = stores
        self.video_to_domain = video_to_domain

    def read_video(self, name: str):
        return self.stores[self.video_to_domain[str(name)]].read_video(name)


def ns_vs_vua_batches(phase_rows: pd.DataFrame, rgb_store, flow_store,
                      wcfg, batch_size: int, shuffle: bool, seed: int = 0,
                      tta: bool = False, use_flow: bool = False):
    """Collated NS_vs_VUA batches: fixed stride 10, 2000-frame cap, label
    0=NS / 1=VUA (prepare_dataset.py:2405-2438).  rgb_store may be a
    DomainKeyedStore wrapping the two per-domain feature stores."""
    from sais_tpu.data.collate import segment_batches

    return segment_batches(
        phase_rows, rgb_store, flow_store, classes=["NS", "VUA"], wcfg=wcfg,
        batch_size=batch_size, shuffle=shuffle, seed=seed,
        use_flow=use_flow, tta=tta, fixed_stride=10, cap=2000,
        label_fn=lambda row: 0 if row["Domain"] == "NS" else 1,
        # segments run up to the 2000-cap — far past the skill buckets
        buckets=(16, 32, 64, 128, 256, 512, 1024, 2000))


def frame_cap(indices: np.ndarray, cap: int = 2000) -> np.ndarray:
    """The reference hard-caps sequences at 2000 frames
    (prepare_dataset.py:2437), matching the learned pos-embedding table."""
    return indices[:cap]
