"""Path-manifest parity with generate_paths.py (literal transcription
oracle, single-video case = the main.sh invocation)."""

import os

import numpy as np
import pandas as pd

from sais_tpu.io.manifests import (flow_paths_manifest, frame_paths_manifest,
                                   write_manifests)


def _make_frames(tmp_path, case="vid_1", n=47):
    d = tmp_path / "images" / case
    d.mkdir(parents=True)
    for i in range(1, n + 1):                   # ffmpeg numbers from 1
        (d / f"frames_{i:08d}.jpg").write_bytes(b"x")
    return case, n


def _reference_manifests(root, case):
    """generate_paths.py:21-69 transcribed (single video)."""
    load_path = "images"
    casepath = os.path.join(root, "images", case)
    files = sorted(os.listdir(casepath))
    paths_df = pd.DataFrame(
        [os.path.join(load_path, case, f) for f in files], columns=["path"])
    paths_df["category"] = case
    paths_df["label"] = case

    jump = 15
    indices = np.arange(0, len(files) - jump, jump)
    sel = [files[i] for i in indices]
    frames = [int(f.split("_")[-1].strip(".jpg")) for f in sel]
    nxt = [f + jump for f in frames]
    nxt_files = ["frames_" + "0" * (8 - len(str(f))) + str(f) + ".jpg"
                 for f in nxt]
    flow_df = pd.DataFrame(
        [os.path.join(load_path, case, f) for f in sel], columns=["path1"])
    flow_df["path2"] = [os.path.join(load_path, case, f) for f in nxt_files]
    flow_df["category"] = case
    flow_df["label"] = case
    nflow = [int(p.split("frames_")[-1].strip(".jpg")) // jump
             for p in flow_df["path1"]]
    flow_df["flowpath"] = [
        os.path.join("flows", case, "flows_" + "0" * (8 - len(str(n)))
                     + str(n) + ".jpg") for n in nflow]
    return paths_df, flow_df


def test_manifests_match_reference(tmp_path):
    case, _ = _make_frames(tmp_path)
    ref_paths, ref_flow = _reference_manifests(str(tmp_path), case)

    got_paths = frame_paths_manifest(str(tmp_path), [case])
    got_flow = flow_paths_manifest(str(tmp_path), [case])
    pd.testing.assert_frame_equal(got_paths, ref_paths)
    pd.testing.assert_frame_equal(got_flow, ref_flow)

    # CSV round trip: same columns incl. the index column layout the
    # reference's consumers read with index_col=0
    write_manifests(str(tmp_path), [case])
    on_disk = pd.read_csv(os.path.join(str(tmp_path), "paths",
                                       "Custom_FlowPaths.csv"), index_col=0)
    pd.testing.assert_frame_equal(on_disk, ref_flow)


def test_manifests_skip_stray_files(tmp_path):
    case, n = _make_frames(tmp_path, n=16)
    (tmp_path / "images" / case / ".DS_Store").write_bytes(b"junk")
    (tmp_path / "images" / case / "frames_00000099.tmp").write_bytes(b"junk")
    got = frame_paths_manifest(str(tmp_path), [case])
    assert len(got) == n
    flow = flow_paths_manifest(str(tmp_path), [case])
    assert len(flow) == 1                       # 16 frames @ jump 15
    assert flow.loc[0, "flowpath"].endswith("flows_00000000.jpg")
