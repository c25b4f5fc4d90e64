"""Skill/step task sampling parity + inference API smoke."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import (ModelConfig, PipelineConfig, TemporalConfig,
                             WindowConfig)
from sais_tpu.data.tasks import (RACE_POLICIES, policy_indices, race_window,
                                 step_window_config, step_window_manifest)
from sais_tpu.infer.pipeline import GestureDecoder
from sais_tpu.infer.skill import SkillAssessor, StepRecognizer
from sais_tpu.models.full_model import full_model_init, prototypes_init

DIM = 32


def reference_skill_indices(start_frame, end_frame, race, offset):
    """Literal transcription of the VUA_EASE eval sampling
    (prepare_dataset.py:2170-2198)."""
    startIdx, endIdx = start_frame - 1, end_frame - 1
    if race == "Needle Withdrawal":
        jump = int((endIdx - startIdx) // 10)
        start, end = startIdx, endIdx
    else:
        diff = endIdx - startIdx
        drop = int(diff * 0.20)
        start, end = startIdx, endIdx - drop
        jump = 10
    return list(np.arange(start + offset, end + offset, jump))


def test_skill_sampling_matches_reference():
    cases = [("Needle Withdrawal", 100, 400), ("Needle Handling", 50, 380),
             ("Needle Driving", 200, 901)]
    for race, sf, ef in cases:
        policy = RACE_POLICIES[race]
        s, e = race_window(sf, ef, race)
        for off in (0, 3, 6):
            ref = reference_skill_indices(sf, ef, race, off)
            ours = policy_indices(s, e, policy, off).tolist()
            assert ours == ref, (race, off)


def test_step_windows_match_reference():
    # duration 10 s, hop 5 s @ 20 fps (prepare_dataset.py:469-478)
    m = step_window_manifest("v", 1000, fps=20)
    # nsamples = (1000 - 200)//100 + 1 = 9
    assert len(m) == 9
    assert m.start_frames[0] == 0 and m.end_frames[0] == 200
    assert m.start_frames[-1] == 800 and m.end_frames[-1] == 1000


def _tiny_cfg(importance=True, modalities="RGB"):
    return PipelineConfig(
        model=ModelConfig(rep_dim=DIM, modalities=modalities,
                          importance_head=importance,
                          temporal=TemporalConfig(rep_dim=DIM, num_layers=1,
                                                  num_heads=2, ffn_dim=64,
                                                  max_positions=256)),
        compute_dtype="float32",
    )


def test_skill_assessor_end_to_end():
    cfg = _tiny_cfg()
    params = full_model_init(jax.random.key(0), cfg.model)
    _, protos = prototypes_init(jax.random.key(1), 3)
    assessor = SkillAssessor(params, protos, cfg)

    rng = np.random.default_rng(0)
    rgb = rng.normal(size=(1000, DIM)).astype(np.float32)
    segments = pd.DataFrame({
        "StartFrame": [100, 50], "EndFrame": [400, 380],
        "RACE": ["Needle Withdrawal", "Needle Handling"],
    })
    out = assessor.assess_segments(rgb, None, segments)
    assert len(out["probs"][0]) == 2 and len(out["probs"][2]) == 2
    for p in out["probs"][0]:
        np.testing.assert_allclose(p.sum(), 1.0, atol=1e-5)
    # attention is (f+1, f+1) for the first TTA augment
    f0 = len(reference_skill_indices(100, 400, "Needle Withdrawal", 0))
    assert out["attention"][0].shape == (f0 + 1, f0 + 1)
    # importance trimmed to real frames, CLS dropped
    assert out["importance"][0].shape == (f0,)


def test_step_recognizer_end_to_end():
    cfg = _tiny_cfg(importance=False)
    import dataclasses
    cfg = dataclasses.replace(cfg, window=step_window_config(fps=20))
    params = full_model_init(jax.random.key(2), cfg.model)
    _, protos = prototypes_init(jax.random.key(3), 3)
    dec = GestureDecoder([(params, protos)], cfg, device_batch=16)
    rec = StepRecognizer(dec, fps=20)
    rng = np.random.default_rng(1)
    rgb = rng.normal(size=(1000, DIM)).astype(np.float32)
    df = rec.recognize("case1", rgb, None)
    assert len(df) == 9
    assert set(df["Step"]).issubset({"Needle Handling", "Needle Driving",
                                     "Needle Withdrawal"})
    probs = df[["Needle Handling", "Needle Driving",
                "Needle Withdrawal"]].to_numpy()
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)


def test_flow_jump_phase_resolution():
    """prepare_dataset.py:2239-2249: fixed 15 for Gronau inference, fixed
    30 for Lab/AFB, HMH per-video fps // 2 (HMH_FPS_TABLE); inference
    phases with NO branch (COH/Gronau_full/USC) reuse the row's RGB
    stride (the reference's stale jump_size quirk); else the VUA
    per-video table, KeyError on unknown videos like the reference's
    fps_dict['VUA'][videoname]."""
    import pytest

    from sais_tpu.data.skill import _flow_jump

    assert _flow_jump("x", phase="Gronau_inference") == 15
    assert _flow_jump("x", phase="Lab_inference") == 30
    assert _flow_jump("x", phase="AFB_inference") == 30
    assert _flow_jump("HMV4", phase="HMH_inference") == 30   # 60 fps // 2
    assert _flow_jump("HMV8", phase="HMH_inference") == 29   # 59.94 // 2
    assert _flow_jump("1", phase="train") == 10              # VUA 20 fps
    # stale-jump phases reuse the RGB sampling stride per row
    assert _flow_jump("x", phase="COH_inference", rgb_stride=10) == 10
    assert _flow_jump("x", phase="Gronau_full_inference",
                      rgb_stride=37) == 37
    assert _flow_jump("x", phase="USC_inference", rgb_stride=10) == 10
    with pytest.raises(KeyError, match="fps table"):
        _flow_jump("unknown", phase="train")
    with pytest.raises(KeyError, match="HMH_FPS_TABLE"):
        _flow_jump("unknown", phase="HMH_inference")


def test_skill_policy_branches():
    """Sampling windows differ per reference branch:
    VUA_EASE (prepare_dataset.py:2173-2198) vs VUA_EASE_Stitch
    (:2307-2355) vs AFB low-pass (:2184-2188)."""
    import pandas as pd

    from sais_tpu.data.skill import skill_segment_indices

    nw = pd.Series({"RACE": "Needle Withdrawal",
                    "Needle Withdrawal Start Frame": 1001,
                    "Needle Withdrawal End Frame": 1501})
    nh = pd.Series({"RACE": "Needle Handling",
                    "Needle Handling Start Frame": 101,
                    "Needle Entry Start Frame": 401})
    # EASE branch: NW full span, stride span//10
    np.testing.assert_array_equal(
        skill_segment_indices(nw, "test"), np.arange(1000, 1500, 50))
    # EASE branch: NH drops 20% of the span, stride 10
    np.testing.assert_array_equal(
        skill_segment_indices(nh, "test"), np.arange(100, 400 - 60, 10))
    # AFB_inference NH: stride 120 low-pass
    np.testing.assert_array_equal(
        skill_segment_indices(nh, "AFB_inference"),
        np.arange(100, 340, 120))
    # stitch train: NW samples [start-40, start+40) stride 10
    np.testing.assert_array_equal(
        skill_segment_indices(nw, "train", branch="stitch"),
        np.arange(960, 1040, 10))
    # stitch train: NH trims a FIXED 20 frames, stride 10
    np.testing.assert_array_equal(
        skill_segment_indices(nh, "train", branch="stitch"),
        np.arange(100, 380, 10))
    # stitch non-USC inference: NW [start, start+60), NH full span
    np.testing.assert_array_equal(
        skill_segment_indices(nw, "COH_inference", branch="stitch"),
        np.arange(1000, 1060, 10))
    np.testing.assert_array_equal(
        skill_segment_indices(nh, "COH_inference", branch="stitch"),
        np.arange(100, 400, 10))
    # stitch USC_inference: full span stride 10 for every race
    np.testing.assert_array_equal(
        skill_segment_indices(nw, "USC_inference", branch="stitch"),
        np.arange(1000, 1500, 10))
    # TTA shifts both ends (offset +3)
    np.testing.assert_array_equal(
        skill_segment_indices(nw, "train", 3, branch="stitch"),
        np.arange(963, 1043, 10))


def test_ease_inference_tables_match_reference():
    """Literal transcription of the VUA_EASE 'inference' phase branch
    (prepare_dataset.py:304-380) as oracle for every phase variant."""
    import pandas as pd
    from sais_tpu.data.skill import (RACE_EASE_PAIRS,
                                     ease_inference_table)

    rng = np.random.default_rng(3)
    rows = []
    fid = 0
    for vid in ["g1", "g2", "g3"]:
        for maj in [0, 1, 2]:
            for i in range(7):
                s = int(rng.integers(100, 4000))
                rows.append({
                    "Path": f"cases\\{vid}", "File": fid,
                    "videoname": vid, "RACE": "Needle Handling",
                    "EASE": "# Repositions", "maj": maj,
                    "Needle Handling Start Frame": s,
                    "Needle Entry Start Frame": s + 25 + i,
                    "Needle Withdrawal Start Frame": s + 200,
                    "Needle Withdrawal End Frame": s + 300,
                })
                fid += 1
    # rows from a different RACE/EASE pairing must be filtered out
    rows.append({"Path": "cases\\g1", "File": fid, "videoname": "g1",
                 "RACE": "Needle Withdrawal", "EASE": "Wrist Rotation",
                 "maj": 2, "Needle Handling Start Frame": 0,
                 "Needle Entry Start Frame": 50,
                 "Needle Withdrawal Start Frame": 100,
                 "Needle Withdrawal End Frame": 400})
    # rows the USC filters must drop: excluded File, 'P-' videoname,
    # and a too-short Needle Handling segment
    rows.append(dict(rows[0], File=102))
    rows.append(dict(rows[0], File=fid + 1, videoname="P-07"))
    rows.append(dict(rows[0], File=fid + 2,
                     **{"Needle Entry Start Frame":
                        rows[0]["Needle Handling Start Frame"] + 10}))
    stitch = pd.DataFrame(rows)
    domain = "NH_02"

    # --- reference math, transcribed verbatim ---
    def RaceAndEaseFilter(row, race):
        val = False
        if race == "NH":
            if row["RACE"] == "Needle Handling":
                if row["EASE"] == "# Repositions":
                    val = True
        return val

    def balance_scores(df, maj_labels):
        min_class_amount = df["maj"].value_counts().min()
        balanced_df = pd.DataFrame()
        for maj_label in maj_labels:
            curr_df = df[df["maj"] == maj_label].sample(
                n=min_class_amount, replace=False, random_state=0)
            balanced_df = pd.concat((balanced_df, curr_df), axis=0)
        return balanced_df.copy()

    def reference_table(phase):
        df = stitch.copy()
        df["Video"] = df["Path"].apply(
            lambda path: path.split("\\")[-1] if "\\" in path
            else path.split("/")[-1])
        race = domain.split("_")[0]
        bool1 = df[["RACE", "EASE"]].apply(
            lambda row: RaceAndEaseFilter(row, race), axis=1)
        df = df[bool1]
        df["maj"] = df["maj"].map({0: 0, 1: 0, 2: 2})
        if phase == "Gronau_full_inference":
            final_df = df.copy()
        elif phase == "Lab_inference":
            final_df = df.copy()
            final_df["Domain"] = domain
        elif phase == "AFB_inference":
            maj_labels = [0, 2]
            final_df = balance_scores(df, maj_labels)
            final_df["Domain"] = domain
        elif phase == "USC_inference":
            df = df[~df["File"].isin([102, 372])]
            df = df[~df["videoname"].str.contains("P-")]

            def durFilterFunc(row):
                if row["RACE"] == "Needle Handling":
                    return (row["Needle Entry Start Frame"]
                            - row["Needle Handling Start Frame"]) > 20
                elif row["RACE"] == "Needle Withdrawal":
                    return (row["Needle Withdrawal End Frame"]
                            - row["Needle Withdrawal Start Frame"]) > 80
                diff = (row["Needle Withdrawal Start Frame"]
                        - row["Needle Entry Start Frame"])
                return diff > int(diff * 0.20)

            df = df[df.apply(durFilterFunc, axis=1)]
            final_df = df.copy()
            final_df["Domain"] = domain
        else:
            nsamples = 5
            high_df = df[df["maj"] == 2]
            low_df = df[df["maj"] == 0]
            high_sampled_df = pd.DataFrame()
            for pid in high_df["Video"].unique():
                pid_df = high_df[high_df["Video"] == pid].sample(
                    nsamples, random_state=0)
                high_sampled_df = pd.concat((high_sampled_df, pid_df),
                                            axis=0)
            df = pd.concat((high_sampled_df, low_df), axis=0)
            min_count = df["maj"].value_counts().min()
            scores = df["maj"].unique()
            final_df = pd.DataFrame()
            for score in scores:
                curr_df = df[df["maj"] == score].sample(min_count,
                                                        random_state=0)
                final_df = pd.concat((final_df, curr_df), axis=0)
            final_df["Domain"] = domain
        return final_df
    # --- end transcription ---

    for phase in ("Gronau_inference", "HMH_inference", "Lab_inference",
                  "AFB_inference", "Gronau_full_inference",
                  "USC_inference"):
        ref = reference_table(phase)
        got = ease_inference_table(stitch, phase, domain)
        assert list(got.index) == list(ref.index), phase
        assert got["maj"].tolist() == ref["maj"].tolist(), phase
        if phase == "Gronau_full_inference":
            assert "Domain" not in got.columns   # the reference quirk
        else:
            assert (got["Domain"] == domain).all()
    # the default branch balances the per-video-sampled high class
    # against the (remapped 0+1) low class
    got = ease_inference_table(stitch, "Gronau_inference", domain)
    assert (got["maj"] == 2).sum() == (got["maj"] == 0).sum()


@pytest.mark.slow
def test_step_recognizer_beyond_2000_frame_windows():
    """FULL-LENGTH windows past the reference's 2000-frame subsample cap
    (prepare_dataset.py:2437; SURVEY §5.7): a 10 s window at fps 250 with
    stride_divisor 4096 (stride 1) puts 2500 frames into the temporal
    encoder — the regime the flash/ring paths exist for.  The decoder's
    bucketed collation, the >2000 pos-emb table (--max-positions), and the
    probability contract must all hold end-to-end with NO silent cap."""
    import dataclasses

    import pytest as _pytest

    cfg = _tiny_cfg(importance=False)
    cfg = dataclasses.replace(
        cfg,
        window=dataclasses.replace(step_window_config(fps=250.0),
                                   stride_divisor=4096),
        model=dataclasses.replace(
            cfg.model, temporal=dataclasses.replace(
                cfg.model.temporal, max_positions=2600)))
    assert cfg.window.duration_frames == 2500
    params = full_model_init(jax.random.key(4), cfg.model)
    _, protos = prototypes_init(jax.random.key(5), 3)
    dec = GestureDecoder([(params, protos)], cfg, device_batch=1)
    rec = StepRecognizer(dec, fps=250.0)
    rng = np.random.default_rng(2)
    rgb = rng.normal(size=(5000, DIM)).astype(np.float32)
    df = rec.recognize("longcase", rgb, None)
    # (5000 - 2500) // 1250 + 1 windows, each seeing all 2500 frames
    assert len(df) == 3
    probs = df[["Needle Handling", "Needle Driving",
                "Needle Withdrawal"]].to_numpy()
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)

    # the DEFAULT 2000-slot table must fail loudly on such windows, not
    # silently truncate frames
    small = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, temporal=dataclasses.replace(
                cfg.model.temporal, max_positions=2000)))
    params2 = full_model_init(jax.random.key(6), small.model)
    dec2 = GestureDecoder([(params2, protos)], small, device_batch=1)
    with _pytest.raises(Exception):
        StepRecognizer(dec2, fps=250.0).recognize("longcase", rgb, None)


def test_cli_max_positions_plumbing():
    """--max-positions flows into TemporalConfig.max_positions (default 0
    keeps the reference's 2000-slot table)."""
    from sais_tpu.cli.main import _pipeline_config, build_parser

    p = build_parser()
    args = p.parse_args(["steps", "-f", "v", "--max-positions", "4096"])
    assert _pipeline_config(args).model.temporal.max_positions == 4096
    args = p.parse_args(["steps", "-f", "v"])
    assert _pipeline_config(args).model.temporal.max_positions == 2000
