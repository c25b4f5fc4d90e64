"""Raw-video training path (data_type='raw') + multi-task linearB head.

Covers the reference's raw VUA_EASE branch (prepare_dataset.py:1795-1990),
the frozen-encoder cls_head training (prepare_model.py:232-244, 423-428)
and the '+'-domain head dispatch (prepare_model.py:406-416).
"""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import ModelConfig, TemporalConfig, TrainConfig
from sais_tpu.data.raw import (R3D_MEAN, R3D_STD, collate_raw,
                               process_snippet, raw_batches,
                               raw_segment_indices)


def _row(race="Needle Handling", start=100, entry=260, wd=400, wd_end=600,
         maj=0, video="vid0"):
    return pd.Series({
        "Video": video, "RACE": race, "maj": maj, "Domain": "NH_02",
        "Needle Handling Start Frame": start,
        "Needle Entry Start Frame": entry,
        "Needle Withdrawal Start Frame": wd,
        "Needle Withdrawal End Frame": wd_end,
    })


def test_raw_indices_match_reference_math():
    # Needle Handling: drop final 20%, jump=(end-start)//16, exactly 16
    row = _row()
    idx = raw_segment_indices(row)
    diff = 260 - 100
    start, end = 100, 260 - int(diff * 0.20)
    jump = (end - start) // 16
    np.testing.assert_array_equal(idx, np.arange(start, end, jump)[:16])
    assert len(idx) == 16
    # Needle Withdrawal: +/-40 window around the start frame (:1873-1876)
    row = _row(race="Needle Withdrawal")
    idx = raw_segment_indices(row)
    np.testing.assert_array_equal(idx, np.arange(360, 440, 80 // 16)[:16])
    # raw path uses FRAME NUMBERS (no -1): first index == start frame - 40
    assert idx[0] == 400 - 40
    # TTA variants sample from the RAW annotation span with the base
    # window's jump (indices2 = arange(startIdx+3, endIdx+3, jump)[:16],
    # prepare_dataset.py:1884-1886) — for NW that is the withdrawal span
    # itself, NOT the +/-40 base window shifted
    idx3 = raw_segment_indices(row, tta_offset=3)
    nw_start, nw_end = int(row["Needle Withdrawal Start Frame"]), int(
        row["Needle Withdrawal End Frame"])
    np.testing.assert_array_equal(
        idx3, np.arange(nw_start + 3, nw_end + 3, 80 // 16)[:16])
    # NH: base start equals the raw start, so the variant is the shifted
    # base grid as long as 16 samples fit before the (undropped) end
    row = _row()
    idx = raw_segment_indices(row)
    idx3 = raw_segment_indices(row, tta_offset=3)
    np.testing.assert_array_equal(idx3, (idx + 3)[:len(idx3)])


def test_process_snippet_shapes_and_stats():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 100, 140, 3), dtype=np.uint8)
    out = process_snippet(frames, 64, R3D_MEAN, R3D_STD)
    assert out.shape == (4, 64, 64, 3)
    # normalized units: mean near 0 for uniform noise around 127
    assert abs(out.mean()) < 2.0


class _SyntheticFrames:
    """Frame source whose pixel intensity encodes the class."""

    def __init__(self, labels_by_video, h=64, w=80):
        self.labels = labels_by_video
        self.h, self.w = h, w

    def __call__(self, video, indices, modality="RGB"):
        rng = np.random.default_rng(abs(hash(video)) % 2**31)
        base = 60 if self.labels[video] == 0 else 190
        return rng.integers(base - 30, base + 30,
                            (len(indices), self.h, self.w, 3)).astype(
            np.uint8)


def _stitch_rows(n=8):
    rows = []
    for v in range(n):
        rows.append(dict(_row(video=f"vid{v}", maj=0 if v % 2 == 0 else 2)))
    return pd.DataFrame(rows)


@pytest.mark.slow
def test_raw_r3d_trainer_learns():
    from sais_tpu.train.classification import RawClassificationTrainer
    from sais_tpu.models.r3d import r3d18_init

    rows = _stitch_rows()
    src = _SyntheticFrames({f"vid{v}": 0 if v % 2 == 0 else 1
                            for v in range(8)})
    cfg = ModelConfig(rep_dim=512, modalities="RGB", nclasses=2,
                      data_type="raw",
                      temporal=TemporalConfig(rep_dim=512, num_layers=1,
                                              num_heads=2, ffn_dim=64,
                                              max_positions=8))
    from sais_tpu.models.full_model import full_model_init
    params = full_model_init(jax.random.key(0), cfg)
    enc = r3d18_init(jax.random.key(1))
    t = RawClassificationTrainer(cfg, TrainConfig(lr=0.05), params, enc,
                                 encoder_type="R3D")
    batches = list(raw_batches(rows, src, [0, 2], "NH_02", "train",
                               batch_size=4, shuffle=False, width=32))
    assert batches[0]["raw"].shape == (4, 1, 16, 32, 32, 3)
    l0, _ = t.run_epoch(iter(batches), train=True)
    for _ in range(6):
        ln, m = t.run_epoch(iter(batches), train=True)
    assert ln < l0
    assert m["acc"] >= 0.75

    # eval TTA over raw snippets also flows through the frozen encoder
    tta = list(raw_batches(rows, src, [0, 2], "NH_02", "val", batch_size=4,
                           shuffle=False, width=32, tta=True))
    loss, m = t.run_epoch(iter(tta), train=False)
    assert np.isfinite(loss)


def test_multitask_primary_domain_uses_linearB():
    """'+'-domain rows route through linear (first domain) or linearB
    (second) — prepare_model.py:406-416."""
    from sais_tpu.models.full_model import (full_model_init,
                                            prototypes_forward)
    cfg = ModelConfig(rep_dim=16, modalities="RGB", nclasses=4,
                      multi_task=True,
                      temporal=TemporalConfig(rep_dim=16, num_layers=1,
                                              num_heads=2, ffn_dim=32,
                                              max_positions=8))
    params = full_model_init(jax.random.key(2), cfg)
    rgb = jax.random.normal(jax.random.key(3), (2, 1, 4, 16))
    mask = jnp.zeros((2, 1, 5), bool)
    both_first = prototypes_forward(params, cfg, rgb, mask,
                                    primary_domain=jnp.array([True, True]))
    both_second = prototypes_forward(params, cfg, rgb, mask,
                                     primary_domain=jnp.array([False, False]))
    mixed = prototypes_forward(params, cfg, rgb, mask,
                               primary_domain=jnp.array([True, False]))
    np.testing.assert_allclose(np.asarray(mixed.video_rep[0]),
                               np.asarray(both_first.video_rep[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mixed.video_rep[1]),
                               np.asarray(both_second.video_rep[1]),
                               atol=1e-6)
    # the two heads genuinely differ
    assert np.abs(np.asarray(both_first.video_rep)
                  - np.asarray(both_second.video_rep)).max() > 1e-3


def test_skill_collate_emits_primary_domain():
    from sais_tpu.data.skill import collate_skill

    rows = _stitch_rows(4)
    rows.loc[2:, "Domain"] = "ND_02"
    rng = np.random.default_rng(1)

    class Store:
        def read_video(self, name):
            return rng.normal(size=(700, 16)).astype(np.float32)

    batch = collate_skill(rows, Store(), None, [0, 2], "NH_02+ND_02",
                          "train")
    np.testing.assert_array_equal(batch["primary_domain"],
                                  [True, True, False, False])


@pytest.mark.slow
def test_raw_unfrozen_encoder_trains_jointly():
    """freeze_encoder=False (reference CLI without -fe): the encoder sits
    inside the jitted loss and its parameters receive gradient updates."""
    from sais_tpu.models.full_model import full_model_init
    from sais_tpu.models.r3d import r3d18_init
    from sais_tpu.train.classification import RawClassificationTrainer

    rows = _stitch_rows()
    src = _SyntheticFrames({f"vid{v}": 0 if v % 2 == 0 else 1
                            for v in range(8)})
    cfg = ModelConfig(rep_dim=512, modalities="RGB", nclasses=2,
                      data_type="raw",
                      temporal=TemporalConfig(rep_dim=512, num_layers=1,
                                              num_heads=2, ffn_dim=64,
                                              max_positions=8))
    params = full_model_init(jax.random.key(0), cfg)
    enc = r3d18_init(jax.random.key(1))
    t = RawClassificationTrainer(cfg, TrainConfig(lr=1e-4), params, enc,
                                 encoder_type="R3D", freeze_encoder=False)
    enc0 = jax.tree.map(np.asarray, t.params["encoder"])
    batches = list(raw_batches(rows, src, [0, 2], "NH_02", "train",
                               batch_size=4, shuffle=False, width=32))
    l0, _ = t.run_epoch(iter(batches), train=True)
    l1, _ = t.run_epoch(iter(batches), train=True)
    assert np.isfinite(l0) and np.isfinite(l1)
    # encoder params actually moved (requires_grad=True semantics)
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        t.params["encoder"], enc0))
    assert max(moved) > 0.0


def test_process_snippet_matches_torch_tensor_path():
    """processImages parity: torchvision's tensor path = float crop with
    round-half-even origin + NON-antialiased bilinear resize
    (prepare_dataset.py:1936-1947).  torchvision is absent here, so the
    oracle is torch.nn.functional.interpolate (what F.resize calls for
    tensors)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 101, 143, 3), dtype=np.uint8)
    mean, std = R3D_MEAN, R3D_STD
    ours = process_snippet(frames, 64, mean, std)

    t = torch.from_numpy(frames).permute(0, 3, 1, 2).float() / 255.0
    h, w = 101, 143
    ch, cw = int(0.8 * h), int(0.8 * w)
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    t = t[:, :, top:top + ch, left:left + cw]
    t = F.interpolate(t, size=(64, 64), mode="bilinear",
                      align_corners=False)
    m = torch.tensor(mean)[None, :, None, None]
    sd = torch.tensor(std)[None, :, None, None]
    ref = ((t - m) / sd).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-3)   # cv2 fixed-point
