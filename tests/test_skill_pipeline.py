"""VUA_EASE skill/importance data pipeline + training-time TTA.

Covers the reference's explanation->importance path
(prepare_dataset.py:63-426), the 0.9/0.1 fold split, the -il training
objective on a fixed batch (NCE + importance quirk), and the 3-way TTA
evaluation semantics threaded through the trainers
(perform_training.py:126-149, 161-204).
"""

import numpy as np
import pandas as pd
import pytest
import torch

import jax
import jax.numpy as jnp

from sais_tpu.config import ModelConfig, TemporalConfig, TrainConfig
from sais_tpu.data.skill import (attach_importance, build_ease_dataset,
                                 collate_skill, explanation_frame_indices,
                                 frame_importance, load_explanations,
                                 skill_batches)
from sais_tpu.models.full_model import full_model_init, prototypes_init
from sais_tpu.port.torch_port import full_model_params_from_torch
from sais_tpu.train.loop import PrototypeTrainer

DIM = 32


def _stitch_df(n_videos=12, stitches_per_video=3, seed=0):
    """Synthetic VUA_EASE_Stitch_Paths.csv-schema table (NH domain)."""
    rng = np.random.default_rng(seed)
    rows = []
    for v in range(n_videos):
        for s in range(stitches_per_video):
            start = int(rng.integers(30, 200))
            entry = start + int(rng.integers(40, 120))   # NH span > 20
            wd_start = entry + int(rng.integers(30, 80))
            wd_end = wd_start + int(rng.integers(90, 150))  # NW span > 80
            rows.append({
                "File": v, "Video": f"vid{v}", "Stitch": s,
                "Path": f"p\\vid{v}",
                "RACE": "Needle Handling", "EASE": "# Repositions",
                "maj": 0 if v % 2 == 0 else 2,
                "Needle Handling Start Frame": start,
                "Needle Entry Start Frame": entry,
                "Needle Withdrawal Start Frame": wd_start,
                "Needle Withdrawal End Frame": wd_end,
            })
    return pd.DataFrame(rows)


def _explanations_df(stitch_df, seed=1):
    """EASE_Explanations-schema annotations with 6 relative spans."""
    rng = np.random.default_rng(seed)
    rows = []
    for _, r in stitch_df.iterrows():
        row = {"File Number": r["File"], "Stitch": r["Stitch"],
               "Suturing Phase": "NH", "Hospital": "USC"}
        for n in range(1, 7):
            s = int(rng.integers(0, 60))
            row[f"Start{n} Frame"] = s
            row[f"End{n} Frame"] = s + int(rng.integers(5, 25))
        rows.append(row)
    return pd.DataFrame(rows)


def test_explanation_indices_match_reference_math():
    """returnFrameIndices (prepare_dataset.py:79-111), literal check."""
    # Needle Handling: stride 10, drop final 20%, frame-number space, reset
    idx = explanation_frame_indices("Needle Handling", 100, 200)
    diff = 200 - 100
    expect = np.arange(100, 200 - int(diff * 0.20), 10) - 100
    np.testing.assert_array_equal(idx, expect)
    # Needle Withdrawal: full span, stride span//10
    idx = explanation_frame_indices("Needle Withdrawal", 50, 163)
    expect = np.arange(50, 163, int((163 - 50) // 10)) - 50
    np.testing.assert_array_equal(idx, expect)


def test_frame_importance_membership():
    """getFrameImportance (prepare_dataset.py:113-126): 1 iff inside any
    span, boundaries inclusive."""
    spans = [(5, 10), (20, 25)] + [(-1, -1)] * 4
    got = frame_importance(np.array([0, 5, 10, 11, 20, 25, 26]), spans)
    assert got == [0, 1, 1, 0, 1, 1, 0]


def test_attach_importance_merges_low_skill_only():
    stitch = _stitch_df()
    expl = _explanations_df(stitch)
    merged = attach_importance(stitch, load_explanations([expl], "NH_02"))
    low = merged[merged["maj"] != 2]
    high = merged[merged["maj"] == 2]
    assert low["frame importance"].notna().all()
    # every low-skill target list matches its sampling grid length
    for _, r in low.iterrows():
        n = len(explanation_frame_indices(
            "Needle Handling", r["Needle Handling Start Frame"],
            r["Needle Entry Start Frame"]))
        assert len(r["frame importance"]) == n
        assert set(r["frame importance"]) <= {0, 1}
    assert len(high) == (stitch["maj"] == 2).sum()


def test_ease_split_is_rng_exact():
    """obtain_train_val_split (prepare_dataset.py:268-280) transcription."""
    import random
    stitch = _stitch_df()
    data, classes = build_ease_dataset(stitch, "NH_02", fold=3, balance=False)
    assert classes == [0, 2]
    cases = stitch[~stitch["File"].isin([102, 372])]["Video"].unique().tolist()
    random.seed(3)
    train_cases = random.sample(cases, int(0.9 * len(cases)))
    val_cases = random.sample(train_cases, int(0.1 * len(train_cases)))
    train_cases = sorted(set(train_cases) - set(val_cases))
    assert sorted(data["train"]["Video"].unique()) == train_cases
    assert sorted(data["val"]["Video"].unique()) == sorted(val_cases)
    # balance=False still balances val/test (prepare_dataset.py:296-301)
    for ph in ("val", "test"):
        if len(data[ph]):
            counts = data[ph]["maj"].value_counts()
            assert counts.min() == counts.max()


def test_multitask_domains_concat_with_label_offset():
    stitch = _stitch_df()
    nd = stitch.copy()
    nd["RACE"] = "Needle Driving"
    nd["EASE"] = "Driving Sequence"
    both = pd.concat([stitch, nd], axis=0).reset_index(drop=True)
    data, classes = build_ease_dataset(both, "NH_02+ND_02", fold=0,
                                       balance=False)
    assert set(data["train"]["Domain"]) <= {"NH_02", "ND_02"}
    from sais_tpu.data.skill import encode_skill_label
    assert encode_skill_label(0, "NH_02", "NH_02+ND_02", classes) == 0
    assert encode_skill_label(2, "ND_02", "NH_02+ND_02", classes) == 3


class _ArrayStore:
    def __init__(self, reps):
        self.reps = reps

    def read_video(self, name):
        return self.reps[name]


def test_importance_training_loss_matches_reference_on_fixed_batch():
    """BASELINE config 3 'Done' criterion: training with -il on synthetic
    EASE annotations reproduces the reference objective (torch oracle:
    golden forward + calcNCELoss + calcImportanceLoss transcription)."""
    from tests.golden.torch_temporal import (golden_nce_loss,
                                             golden_prototypes_forward,
                                             random_full_model_state_dict)

    stitch = _stitch_df(n_videos=6, stitches_per_video=2)
    expl = _explanations_df(stitch)
    data, classes = build_ease_dataset(
        stitch, "NH_02", fold=0, balance=True,
        explanations=[expl], importance_loss=True)
    rows = data["train"]
    assert len(rows) >= 2

    rng = np.random.default_rng(5)
    store = _ArrayStore({f"vid{v}": rng.normal(
        size=(600, DIM)).astype(np.float32) for v in range(6)})

    cfg = ModelConfig(rep_dim=DIM, modalities="RGB", importance_head=True,
                      nclasses=2,
                      temporal=TemporalConfig(rep_dim=DIM, num_layers=2,
                                              num_heads=2, ffn_dim=64,
                                              max_positions=64))
    gen = torch.Generator().manual_seed(6)
    sd = random_full_model_state_dict(gen, dim=DIM, proj=16, ffn=64,
                                      layers=2, pos_slots=64)
    params = full_model_params_from_torch(sd, num_layers=2)
    keys, protos = prototypes_init(jax.random.key(7), 2, proj_dim=16)

    batch = collate_skill(rows, store, None, classes, "NH_02", "train",
                          importance_loss=True, buckets=(16, 32, 64))
    assert batch["importance"].max() == 1.0  # targets actually flow through

    protos_np = np.asarray(protos)  # _train_step donates its state buffers
    trainer = PrototypeTrainer(cfg, TrainConfig(lr=0.0, importance_loss=True),
                               params, keys, protos)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    _, loss, _ = trainer._train_step(trainer.state, b)

    # --- torch oracle on the same padded batch ---------------------------
    rgb_t = torch.from_numpy(batch["rgb"])
    pad_t = torch.from_numpy(batch["rgb_mask"])
    video_rep, _, _, imps = golden_prototypes_forward(
        sd, rgb_t, pad_t, layers=2, heads=2, importance=True)
    proto_dict = {str(i): torch.from_numpy(protos_np[i])[None]
                  for i in range(2)}
    nce = golden_nce_loss(video_rep, torch.vstack(list(proto_dict.values())),
                          list(proto_dict.keys()), batch["labels"].tolist())
    # calcImportanceLoss transcription (prepare_miscellaneous.py:48-60)
    crit = torch.nn.BCEWithLogitsLoss(reduction="none")
    oi = imps[:, :, 1:, 0]
    il = crit(oi, torch.from_numpy(batch["importance"]))
    il = torch.mean(il)
    inv = ~torch.from_numpy(batch["ipad"])
    il = il * inv[:, :, :-1]
    low = np.where(batch["labels"] == 0)[0]
    il = torch.mean(il[low, :])
    expected = float(nce + il)
    assert abs(float(loss) - expected) < 1e-4, (float(loss), expected)


def test_tta_epoch_means_losses_and_probs():
    """Eval batches carrying 3 TTA variants: epoch loss is the mean of the
    per-variant losses; metrics use the TTA prob mean."""
    cfg = ModelConfig(rep_dim=DIM, modalities="RGB", nclasses=2,
                      temporal=TemporalConfig(rep_dim=DIM, num_layers=1,
                                              num_heads=2, ffn_dim=64,
                                              max_positions=64))
    params = full_model_init(jax.random.key(0), cfg)
    keys, protos = prototypes_init(jax.random.key(1), 2)
    trainer = PrototypeTrainer(cfg, TrainConfig(lr=0.1), params, keys, protos)

    rng = np.random.default_rng(2)

    def variant(seed):
        return {
            "rgb": rng.normal(size=(4, 1, 8, DIM)).astype(np.float32),
            "rgb_mask": np.zeros((4, 1, 9), bool),
            "labels": np.array([0, 1, 0, 1], np.int32),
            "label_cols": np.array([0, 1, 0, 1], np.int32),
        }

    variants = [variant(i) for i in range(3)]
    batch = dict(variants[0])
    batch["tta"] = variants

    loss, m = trainer.run_epoch(iter([batch]), train=False)
    per = [trainer._eval_step(trainer.state,
                              {k: jnp.asarray(v) for k, v in var.items()})
           for var in variants]
    expected_loss = float(np.mean([float(p[0]) for p in per]))
    assert abs(loss - expected_loss) < 1e-6
    mean_probs = np.mean([np.asarray(p[2]) for p in per], axis=0)
    expected_acc = float(np.mean(np.argmax(mean_probs, 1)
                                 == np.array([0, 1, 0, 1])))
    assert abs(m["acc"] - expected_acc) < 1e-9


def test_skill_batches_tta_structure():
    stitch = _stitch_df(n_videos=6, stitches_per_video=2)
    data, classes = build_ease_dataset(stitch, "NH_02", fold=0, balance=False)
    rng = np.random.default_rng(8)
    store = _ArrayStore({f"vid{v}": rng.normal(
        size=(600, DIM)).astype(np.float32) for v in range(6)})
    rows = data["test"]
    if not len(rows):
        rows = data["train"]
    batches = list(skill_batches(rows, store, None, classes, "NH_02", "test",
                                 batch_size=4, shuffle=False, tta=True))
    assert batches
    for b in batches:
        assert len(b["tta"]) == 3
        # offsets shift the sampling grid: variants differ in content
        assert not np.array_equal(b["tta"][0]["rgb"], b["tta"][1]["rgb"])


def test_gesture_segment_batches_tta():
    from sais_tpu.config import WindowConfig
    from sais_tpu.data.collate import segment_batches
    rng = np.random.default_rng(9)
    store = _ArrayStore({"v0": rng.normal(size=(400, DIM)).astype(np.float32)})
    rows = pd.DataFrame({
        "Video": ["v0", "v0"], "StartFrame": [50, 100],
        "EndFrame": [110, 160], "Gesture": ["a", "b"],
    })
    batches = list(segment_batches(rows, store, None, ["a", "b"],
                                   WindowConfig(), batch_size=2,
                                   shuffle=False, use_flow=False, tta=True))
    assert len(batches) == 1 and len(batches[0]["tta"]) == 3
    np.testing.assert_array_equal(batches[0]["rgb"],
                                  batches[0]["tta"][0]["rgb"])


def test_stitch_phase_batches_and_training_step():
    """vua-ease-stitch mode: stitch sub-phase rows collate with the EASE
    label_fn and drive a PrototypeTrainer step (the CLI loader path)."""
    from sais_tpu.data.reference_datasets import stitch_phase_tables
    from sais_tpu.data.skill import skill_batches
    from tests.test_reference_datasets import _stitch_multi_race_df

    df = _stitch_multi_race_df(n_videos=10)
    tables, classes = stitch_phase_tables(df, fold=0)
    rng = np.random.default_rng(0)
    reps = {f"vid{v}": rng.normal(size=(2000, DIM)).astype(np.float32)
            for v in range(10)}
    store = _ArrayStore(reps)

    rows = tables["train"]
    batches = list(skill_batches(
        rows, store, None, list(classes), "NH_vs_ND_vs_NW", "train",
        batch_size=4, shuffle=False,
        label_fn=lambda row: list(classes).index(row["EASE"])))
    assert batches
    first = batches[0]
    sub = rows.iloc[:len(first["labels"])]
    expect = [list(classes).index(e) for e in sub["EASE"]]
    assert list(first["labels"]) == expect

    import dataclasses

    import jax

    from sais_tpu.config import ModelConfig, TemporalConfig, TrainConfig
    from sais_tpu.models.full_model import full_model_init, prototypes_init
    from sais_tpu.train.loop import PrototypeTrainer

    mcfg = dataclasses.replace(
        ModelConfig(), rep_dim=DIM, proj_dim=16, nclasses=3,
        modalities="RGB",
        temporal=TemporalConfig(rep_dim=DIM, num_layers=1, num_heads=2,
                                ffn_dim=64, max_positions=256))
    params = full_model_init(jax.random.key(0), mcfg)
    keys, protos = prototypes_init(jax.random.key(1), 3, proj_dim=16)
    trainer = PrototypeTrainer(mcfg, TrainConfig(lr=0.01, nepochs=1,
                                                 batch_size=4),
                               params, keys, protos)
    _, metrics = trainer.run_epoch(iter(batches[:2]), train=True)
    assert np.isfinite(metrics["loss"])
