"""CLI end-to-end smokes for the training-side subcommands (CPU).

The decode-side CLI is covered by test_pipeline_e2e; these drive the
round-2 additions end-to-end through `sais` exactly as a user would:
stitch sub-phase training, the multi-domain loop, skill assessment and
step recognition.
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

from sais_tpu.io.feature_store import FeatureStore, rgb_store_path

pytestmark = pytest.mark.slow


def _main(argv):
    from sais_tpu.cli.main import main
    old = sys.argv
    sys.argv = ["sais"] + argv
    try:
        main()
    finally:
        sys.argv = old


def _write_store(root, videos, frames=1500, dim=384, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "results"), exist_ok=True)
    with FeatureStore(rgb_store_path(root), "a") as fs:
        for v in videos:
            fs.write_video(v, rng.normal(size=(frames, dim))
                           .astype(np.float32))


def test_stitch_phase_training_cli(tmp_path):
    from tests.test_reference_datasets import _stitch_multi_race_df

    root = str(tmp_path)
    df = _stitch_multi_race_df(n_videos=8)
    csv = os.path.join(root, "stitch.csv")
    df.to_csv(csv)
    _write_store(root, [f"vid{v}" for v in range(8)], frames=2000)
    _main(["train", "-p", root, "--segments", csv,
           "--dataset", "vua-ease-stitch", "--random-init", "-mod", "RGB",
           "-e", "1", "--nfolds", "1", "-bs", "4", "-tf", "0.8",
           "--dtype", "float32"])
    assert os.path.exists(os.path.join(root, "params", "Fold_0"))


def test_multi_domain_training_cli(tmp_path):
    from tests.test_skill_pipeline import _stitch_df

    root = str(tmp_path)
    nh = _stitch_df()
    nd = nh.copy()
    nd["RACE"] = "Needle Driving"
    nd["EASE"] = "Driving Sequence"
    df = pd.concat([nh, nd]).reset_index(drop=True)
    csv = os.path.join(root, "stitch.csv")
    df.to_csv(csv)
    _write_store(root, [f"vid{v}" for v in range(12)])
    _main(["train", "-p", root, "--segments", csv, "--dataset", "vua-ease",
           "--random-init", "-mod", "RGB", "-e", "1", "--nfolds", "1",
           "-bs", "4", "--dtype", "float32",
           "--domains", "NH_02", "ND_02"])
    assert os.path.exists(os.path.join(root, "params", "NH_02", "Fold_0"))
    assert os.path.exists(os.path.join(root, "params", "ND_02", "Fold_0"))


def test_assess_and_steps_cli(tmp_path):
    root = str(tmp_path)
    _write_store(root, ["vidA"], frames=3000)
    seg = pd.DataFrame([
        {"Video": "vidA", "RACE": "Needle Handling",
         "StartFrame": 100, "EndFrame": 400},
        {"Video": "vidA", "RACE": "Needle Driving",
         "StartFrame": 500, "EndFrame": 900},
    ])
    csv = os.path.join(root, "seg.csv")
    seg.to_csv(csv)
    _main(["assess", "-f", "vidA", "-p", root, "--segments", csv,
           "--random-init", "-mod", "RGB", "--nclasses", "3",
           "--dtype", "float32"])
    assert os.path.exists(os.path.join(
        root, "params", "Fold_0", "reps_and_labels_inference.pkl"))
    assert os.path.exists(os.path.join(root, "results",
                                       "vidA_skill_fold0.csv"))

    _main(["steps", "-f", "vidA", "-p", root, "--random-init",
           "-mod", "RGB", "--dtype", "float32"])
    df = pd.read_csv(os.path.join(root, "results", "vidA_steps.csv"))
    assert len(df) == (3000 - 200) // 100 + 1
    assert set(df["Step"]) <= {"Needle Handling", "Needle Driving",
                               "Needle Withdrawal"}


def test_training_fraction_gating(tmp_path):
    """-tf on a dataset where the reference never subsamples must error
    loudly instead of silently training on 100%."""
    from tests.test_skill_pipeline import _stitch_df

    root = str(tmp_path)
    csv = os.path.join(root, "stitch.csv")
    _stitch_df().to_csv(csv)
    _write_store(root, [f"vid{v}" for v in range(12)])
    with pytest.raises(SystemExit, match="-tf only applies"):
        _main(["train", "-p", root, "--segments", csv,
               "--dataset", "vua-ease", "--random-init", "-tf", "0.5",
               "-e", "1", "--nfolds", "1", "--dtype", "float32"])


def test_cli_pretrain_e2e_and_resume(tmp_path, monkeypatch, capsys):
    """`sais pretrain` end to end on CPU: video glob -> border crop ->
    device multi-crop -> DINO steps -> checkpoint + JSONL log; a second
    invocation resumes from the saved epoch instead of restarting.
    Backbone geometry comes from --arch via the zoo (monkeypatched to a
    patch-32 depth-1 ViT so the 224/96 reference crops stay cheap)."""
    import cv2
    import jax

    from sais_tpu.config import ViTConfig
    from sais_tpu.models import zoo

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "videos"))
    path = os.path.join(root, "videos", "vidP.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (80, 64))
    rng = np.random.default_rng(3)
    for _ in range(24):
        w.write(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8))
    w.release()

    tiny = ViTConfig(image_size=224, patch_size=32, embed_dim=32, depth=1,
                     num_heads=2)
    monkeypatch.setitem(zoo.CONFIGS, "vits16", tiny)
    args = ["pretrain", "-p", root, "-bs", "8", "-e", "1",
            "--out-dim", "32", "--local-crops", "2", "--drop-path", "0.1"]
    _main(args)
    out = os.path.join(root, "pretrain")
    assert os.path.exists(os.path.join(out, "log.txt"))
    with open(os.path.join(out, "log.txt")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 1  # one epoch record
    ckpts = os.listdir(os.path.join(out, "ckpt"))
    assert ckpts, "no checkpoint written"

    capsys.readouterr()
    _main(["pretrain", "-p", root, "-bs", "8", "-e", "2",
           "--out-dim", "32", "--local-crops", "2"])
    assert "resumed from epoch 1" in capsys.readouterr().out


def test_cli_pretrain_data_parallel_mesh(tmp_path, monkeypatch):
    """`sais pretrain --data-parallel` through the CLI on the 8-virtual-
    device CPU mesh: shuffle-loader batches shard over the mesh and the
    dp DINO step runs (the reference's DDP pretrain, main_dino.py:351,
    as one jit program)."""
    import cv2
    import jax

    from sais_tpu.config import ViTConfig
    from sais_tpu.models import zoo

    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs the 8-device CPU mesh")
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "videos"))
    rng = np.random.default_rng(4)
    for name in ("a", "b"):
        path = os.path.join(root, "videos", f"{name}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                            (80, 64))
        for _ in range(16):
            w.write(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8))
        w.release()

    tiny = ViTConfig(image_size=224, patch_size=32, embed_dim=32, depth=1,
                     num_heads=2)
    monkeypatch.setitem(zoo.CONFIGS, "vits16", tiny)
    _main(["pretrain", "-p", root, "-bs", "8", "-e", "1",
           "--out-dim", "32", "--local-crops", "2", "--data-parallel",
           "--loader-threads", "2"])
    with open(os.path.join(root, "pretrain", "log.txt")) as f:
        assert len(f.read().strip().splitlines()) == 1


def test_platform_override_env(monkeypatch):
    """SAIS_PLATFORM pins jax_platforms via config.update — the only
    override that beats a sitecustomize-registered PJRT plugin (env
    JAX_PLATFORMS is read before the CLI can change it)."""
    import jax

    from sais_tpu.cli.main import _apply_platform_override

    prev = jax.config.jax_platforms
    try:
        monkeypatch.setenv("SAIS_PLATFORM", "cpu")
        _apply_platform_override()
        assert jax.config.jax_platforms == "cpu"
        monkeypatch.delenv("SAIS_PLATFORM")
        _apply_platform_override()   # unset -> leaves config alone
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", prev)


def test_attention_cli_image_and_masks(tmp_path, capsys):
    """`sais attention --image` writes per-head heatmaps + mass-threshold
    masks (reference visualize_attention.py:179-213 outputs)."""
    from PIL import Image

    root = str(tmp_path)
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3),
                                            dtype=np.uint8)
    Image.fromarray(img).save(os.path.join(root, "frame.png"))
    _main(["attention", "--image", os.path.join(root, "frame.png"),
           "-p", root, "--random-init", "--attn-threshold", "0.6",
           "--dtype", "float32"])
    out = capsys.readouterr().out
    assert "wrote" in out
    results = os.listdir(os.path.join(root, "results"))
    heads = [f for f in results if "_attn_img0_head" in f]
    masks = [f for f in results if "_mask_th0.6_head" in f]
    assert len(heads) == 6          # ViT-S: 6 heads
    assert len(masks) == 6
    m = np.asarray(Image.open(os.path.join(root, "results", masks[0])))
    assert set(np.unique(m)) <= {0, 255}   # binary mass mask
