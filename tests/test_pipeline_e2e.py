"""End-to-end smoke: synthetic mp4 -> features -> windows -> gestures CSV.

Mirrors `bash ./SAIS/main.sh -f video` (reference stages 1-6) on a tiny
model, all on CPU.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import (ModelConfig, PipelineConfig, PreprocessConfig,
                             TemporalConfig, ViTConfig)
from sais_tpu.infer.pipeline import FeatureExtractor, GestureDecoder
from sais_tpu.models.full_model import full_model_init, prototypes_init
from sais_tpu.models.vit import vit_init
from sais_tpu.ops.preprocess import preprocess_batch, preprocess_reference_host

pytestmark = pytest.mark.slow

DIM = 64


def tiny_cfg():
    return PipelineConfig(
        vit=ViTConfig(image_size=32, patch_size=8, embed_dim=DIM, depth=2,
                      num_heads=4),
        preprocess=PreprocessConfig(resize=32),
        model=ModelConfig(rep_dim=DIM, modalities="RGB",
                          temporal=TemporalConfig(rep_dim=DIM, num_layers=2,
                                                  num_heads=4, ffn_dim=128)),
        compute_dtype="float32",
    )


def synth_video(path, nframes=90, h=48, w=64):
    import cv2
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    assert writer.isOpened()
    rng = np.random.default_rng(0)
    for i in range(nframes):
        frame = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        frame[:, : (i * w // nframes)] = (255, 0, 0)
        writer.write(frame)
    writer.release()


def test_decode_pipeline_end_to_end(tmp_path):
    cfg = tiny_cfg()
    video_path = str(tmp_path / "vid.mp4")
    synth_video(video_path)

    vit_params = vit_init(jax.random.key(0), cfg.vit)
    # python decode path: streaming == array (identical preprocessing)
    fx = FeatureExtractor(vit_params, cfg, batch_size=32,
                          use_native_decode=False)
    reps = fx.extract_video(video_path)
    assert reps.shape == (90, DIM)
    assert np.isfinite(reps).all()

    from sais_tpu.io.video import VideoReader
    with VideoReader(video_path) as r:
        frames = np.stack(list(r.frames()))
    reps2 = fx.extract_array(frames)
    np.testing.assert_allclose(reps, reps2, atol=1e-5)

    # native decode path (host INTER_AREA resize) stays close to the device
    # antialiased-bilinear path but is not bitwise identical by design
    fx_native = FeatureExtractor(vit_params, cfg, batch_size=32)
    reps3 = fx_native.extract_video(video_path)
    if reps3.shape == reps.shape:  # native lib built on this machine
        corr = np.corrcoef(reps3.ravel(), reps.ravel())[0, 1]
        assert corr > 0.98, corr

    model_params = full_model_init(jax.random.key(1), cfg.model)
    _, protos = prototypes_init(jax.random.key(2), 2)
    dec = GestureDecoder([(model_params, protos)], cfg, device_batch=8)
    df = dec.decode("vid", reps, None)
    # 90 frames -> 6 windows; schema matches the reference CSV
    for col in (0, 1, "StartFrame", "EndFrame", "Entropy", "pred",
                "Gesture", "Video", "StartTime", "EndTime", "Path"):
        assert col in df.columns or len(df) == 0, col
    probs = dec.window_probs("vid", reps, None)
    assert probs.shape == (6, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)

    # inference artifacts (reference train.py:113-119 exports)
    art = dec.inference_artifacts("vid", reps, None)
    assert set(art["reps"].keys()) == {0, 1, 2}
    assert art["reps"][0].shape == (6, 256)
    np.testing.assert_allclose(
        np.mean(np.stack([art["probs"][i] for i in range(3)], 0), 0), probs,
        atol=1e-6)
    assert art["attention"].shape[0] == 6  # first-augment attention maps


def test_preprocess_device_matches_pil_reference():
    """The device path replays Pillow's fixed-point resample bit-exactly
    (ops/preprocess.resize_pil_exact); the only residual difference vs the
    host-PIL oracle is float rounding in the normalize (f32 vs numpy f64
    promotion) — ulp-level."""
    rng = np.random.default_rng(1)
    cfg = PreprocessConfig()
    for shape in ((3, 100, 140, 3), (2, 480, 640, 3), (1, 224, 224, 3)):
        frames = rng.integers(0, 255, shape, dtype=np.uint8)
        dev = np.asarray(preprocess_batch(jnp.asarray(frames), cfg))
        host = preprocess_reference_host(frames, cfg)
        assert dev.shape == host.shape == (shape[0], 224, 224, 3)
        assert np.abs(dev - host).max() < 1e-5


def test_native_pump_matches_pil_exactly(tmp_path):
    """The C++ frame_pump's crop+resize is bit-identical with PIL on the
    decoded frames (same fixed-point resample as the device twin), so the
    native-decode path feeds the ViT the same pixels as the exact path."""
    from PIL import Image

    from sais_tpu.io.native_loader import NativeFramePump, ensure_built
    from sais_tpu.io.video import VideoReader
    if not ensure_built():
        pytest.skip("native toolchain/opencv unavailable")

    path = str(tmp_path / "vid.mp4")
    synth_video(path, nframes=12, h=100, w=140)
    with VideoReader(path) as r:
        frames = list(r.frames())
    expected = []
    from sais_tpu.ops.preprocess import center_crop_bounds
    for f in frames:
        r0, r1 = center_crop_bounds(f.shape[0], 0.8)
        c0, c1 = center_crop_bounds(f.shape[1], 0.8)
        img = Image.fromarray(f[r0:r1, c0:c1])
        expected.append(np.asarray(img.resize((64, 64), Image.BILINEAR)))
    expected = np.stack(expected)

    with NativeFramePump(path, out_size=64) as pump:
        got = np.concatenate(list(pump.batches(5)))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.slow
def test_resize_pil_exact_fuzz():
    """Bit-exactness vs PIL across 40 random geometries (down/up-scale,
    extreme aspect ratios, tiny and large sources, non-square outputs via
    square calls at varied sizes)."""
    from PIL import Image

    from sais_tpu.ops.preprocess import resize_pil_exact
    rng = np.random.default_rng(7)
    for _ in range(40):
        h = int(rng.integers(8, 600))
        w = int(rng.integers(8, 900))
        out = int(rng.choice([32, 64, 96, 128, 224, 336]))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(img).resize((out, out),
                                                     Image.BILINEAR))
        ours = np.asarray(resize_pil_exact(jnp.asarray(img[None]), out))[0]
        np.testing.assert_array_equal(ours, ref, err_msg=f"{h}x{w}->{out}")


def test_resize_pil_exact_bitwise():
    """resize_pil_exact == PIL Image.resize(BILINEAR) on uint8, bit for
    bit, across down/up-scales and odd geometries (VERDICT r2 item 2:
    extract_representations.py:158-162 exactness without host PIL)."""
    from PIL import Image

    from sais_tpu.ops.preprocess import resize_pil_exact
    rng = np.random.default_rng(2)
    for (h, w, out) in [(864, 1536, 224), (100, 150, 224), (224, 224, 224),
                        (137, 251, 224), (300, 300, 96), (33, 47, 224)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(img).resize((out, out),
                                                     Image.BILINEAR))
        ours = np.asarray(resize_pil_exact(jnp.asarray(img[None]), out))[0]
        np.testing.assert_array_equal(ours, ref, err_msg=f"{h}x{w}->{out}")


def test_feature_store_roundtrip(tmp_path):
    from sais_tpu.io.feature_store import FeatureStore
    p = str(tmp_path / "results" / "reps.h5")
    with FeatureStore(p, "w") as fs:
        fs.write_video("a", np.ones((5, 4), np.float32))
        fs.append_video("b", np.zeros((3, 4), np.float32))
        fs.append_video("b", np.ones((2, 4), np.float32))
    with FeatureStore(p) as fs:
        assert fs.videos() == ["a", "b"]
        assert fs.read_video("b").shape == (5, 4)
        assert fs.read_video("b")[3:].sum() == 8


def test_producer_reaped_on_consumer_abort(tmp_path):
    """A mid-stream device failure must not leak the decode producer:
    a thread blocked in q.put on the full prefetch queue (plus its open
    capture) would accumulate per failed request in the serve daemon."""
    import threading
    import time as _time

    import jax
    import pytest

    from sais_tpu.infer.pipeline import FeatureExtractor
    from sais_tpu.models.vit import vit_init

    cfg = tiny_cfg()
    video = str(tmp_path / "v.mp4")
    synth_video(video, nframes=80)
    params = vit_init(jax.random.key(0), cfg.vit)
    fx = FeatureExtractor(params, cfg, batch_size=4,
                          use_native_decode=False)

    def explode(batches, fn):
        next(batches)      # consume one batch, then die mid-stream
        raise RuntimeError("device failure")

    fx._drain = explode
    before = threading.active_count()
    with pytest.raises(RuntimeError, match="device failure"):
        fx.extract_video(video, prefetch=2)
    deadline = _time.time() + 10
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_feature_store_attrs_and_flow_jump_reconcile(tmp_path):
    """`sais flow` records its pair stride as a per-video H5 attr;
    decode/assess/steps adopt it when no --flow-jump was given and
    refuse a contradicting explicit one (a silent mismatch gathers the
    wrong flow rows for every window)."""
    import dataclasses as dc
    import types

    import pytest

    from sais_tpu.cli.main import _reconcile_flow_jump
    from sais_tpu.config import PipelineConfig
    from sais_tpu.io.feature_store import FeatureStore, flow_store_path

    root = str(tmp_path)
    with FeatureStore(flow_store_path(root), "w") as fs:
        fs.write_video("v", np.ones((4, 4), np.float32),
                       attrs={"flow_jump": 30})
        fs.write_video("old", np.ones((4, 4), np.float32))
    with FeatureStore(flow_store_path(root)) as fs:
        assert fs.video_attr("v", "flow_jump") == 30
        assert fs.video_attr("old", "flow_jump") is None
        assert fs.video_attr("missing", "flow_jump") is None

    cfg = PipelineConfig()
    cfg = dc.replace(cfg, model=dc.replace(cfg.model,
                                           modalities="RGB-Flow"))
    assert cfg.window.flow_jump_factor == 15
    # no explicit flag -> adopt the recorded stride, AND pin it on args
    # (consumers with their own stride fallbacks — assess's per-phase
    # tables — must see it as if the user passed it)
    args = types.SimpleNamespace(path=root, flow_jump=None)
    assert _reconcile_flow_jump(cfg, args, "v").window.flow_jump_factor == 30
    assert args.flow_jump == "30"
    # attr-less legacy store -> flags untouched
    assert _reconcile_flow_jump(cfg, args,
                                "old").window.flow_jump_factor == 15
    # explicit contradicting flag -> refuse loudly
    args2 = types.SimpleNamespace(path=root, flow_jump="15")
    with pytest.raises(SystemExit):
        _reconcile_flow_jump(cfg, args2, "v")
    # explicit AGREEING flag passes through (stride already equal)
    cfg30 = dc.replace(cfg, window=dc.replace(cfg.window,
                                              flow_jump_factor=30))
    assert _reconcile_flow_jump(cfg30, args2,
                                "v").window.flow_jump_factor == 30
    # RGB-only decode never opens the flow store
    cfg_rgb = dc.replace(cfg, model=dc.replace(cfg.model,
                                               modalities="RGB"))
    assert _reconcile_flow_jump(
        cfg_rgb, types.SimpleNamespace(path=str(tmp_path / "nowhere"),
                                       flow_jump=None),
        "v").window.flow_jump_factor == 15


def test_decode_refuses_missing_flow_for_flow_modalities():
    """A zero-substituted flow stream would silently skew probabilities
    (the flow branch still contributes CLS/pos-emb features); the decoder
    must raise instead when modalities include Flow but no reps exist."""
    import dataclasses
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, modalities="RGB-Flow"))
    params = full_model_init(jax.random.key(5), cfg.model)
    _, protos = prototypes_init(jax.random.key(6), 2)
    dec = GestureDecoder([(params, protos)], cfg, device_batch=8)
    reps = np.zeros((90, DIM), np.float32)
    with pytest.raises(ValueError, match="flow"):
        dec.decode("vid", reps, None)
    # RGB-only config continues to tolerate absent flow
    dec_rgb = GestureDecoder([(params, protos)], tiny_cfg(), device_batch=8)
    assert dec_rgb.window_probs("vid", reps, None).shape[0] == 6


def test_multi_fold_ensemble_decode():
    """Fold ensembling averages per-fold TTA-mean probs
    (process_inference_results.py:224-228)."""
    cfg = tiny_cfg()
    rng = np.random.default_rng(3)
    reps = rng.normal(size=(90, DIM)).astype(np.float32)
    folds = []
    for i in range(2):
        params = full_model_init(jax.random.key(10 + i), cfg.model)
        _, protos = prototypes_init(jax.random.key(20 + i), 2)
        folds.append((params, protos))
    dec2 = GestureDecoder(folds, cfg, device_batch=8)
    p2 = dec2.window_probs("v", reps, None)
    singles = [GestureDecoder([f], cfg, device_batch=8).window_probs(
        "v", reps, None) for f in folds]
    np.testing.assert_allclose(p2, np.mean(singles, axis=0), atol=1e-6)


def test_tail_bucket_padding_matches_unbucketed():
    """Partial final chunks pad to the next TAIL_BUCKET (32..256) rather
    than the full device_batch; results must be identical to small-chunk
    execution, and the chosen pad sizes must follow _chunk_batch."""
    cfg = tiny_cfg()
    rng = np.random.default_rng(9)
    reps = rng.normal(size=(1400, DIM)).astype(np.float32)  # 93 windows
    params = full_model_init(jax.random.key(31), cfg.model)
    _, protos = prototypes_init(jax.random.key(32), 2)

    bucketed = GestureDecoder([(params, protos)], cfg)  # device_batch=512
    key = ("p", 15)
    # short variants (total <= device_batch): buckets always used
    assert bucketed._chunk_batch(93, 93, key) == 128
    assert bucketed._chunk_batch(1, 1, key) == 32
    assert bucketed._chunk_batch(256, 256, key) == 256
    assert bucketed._chunk_batch(300, 300, key) == 512
    assert bucketed._chunk_batch(512, 512, key) == 512
    # long variant (total > device_batch): a COLD tail bucket would add an
    # XLA compile the preceding full chunks didn't pay — pad to the
    # already-compiled device_batch instead, unless the bucket is warm
    assert bucketed._chunk_batch(93, 600, key) == 512
    bucketed._warm_buckets.add((128, key))
    assert bucketed._chunk_batch(93, 600, key) == 128
    small = GestureDecoder([(params, protos)], cfg, device_batch=8)
    assert small._chunk_batch(5, 5, key) == 8   # no bucket below device_batch

    np.testing.assert_allclose(
        bucketed.window_probs("v", reps, None),
        small.window_probs("v", reps, None), atol=1e-5)


def test_tail_bucket_warmth_marked_by_dispatch(monkeypatch):
    """Real dispatches (e.g. serve warmup's window_probs calls) must mark
    their bucket shapes warm so long videos start using them."""
    cfg = tiny_cfg()
    params = full_model_init(jax.random.key(41), cfg.model)
    _, protos = prototypes_init(jax.random.key(42), 2)
    monkeypatch.setattr(GestureDecoder, "TAIL_BUCKETS", (2, 4))
    dec = GestureDecoder([(params, protos)], cfg, device_batch=8)
    rng = np.random.default_rng(5)

    # short video (3 windows) -> bucketed chunk of 4 -> marked warm
    dec.window_probs("v", rng.normal(size=(50, DIM)).astype(np.float32),
                     None)
    warm_sizes = {b for b, _ in dec._warm_buckets}
    assert 4 in warm_sizes, dec._warm_buckets
    key = next(k for b, k in dec._warm_buckets if b == 4)
    # long video (11 windows = 8 + tail 3): the warm bucket is now chosen
    assert dec._chunk_batch(3, 11, key) == 4
    # a cold bucket size on a long video still defers to device_batch
    assert dec._chunk_batch(1, 11, key) == 8


def test_center_crop_bounds_matches_pil_box_math():
    """The reference feeds torchvision CenterCrop a FLOAT size
    (main_dino.py:301: CenterCrop((0.8*h, 0.8*w))); the crop box then
    rounds each coordinate half-to-even inside PIL (Image._crop).  Both
    our crop sites share center_crop_bounds, which must match that box
    math exactly — including sizes where frac*size has a .5+ fraction
    (truncating the stop bound loses a row)."""
    from PIL import Image

    from sais_tpu.ops.augment import center_border_crop
    from sais_tpu.ops.preprocess import center_crop_bounds

    for size in (100, 101, 107, 224, 480, 719, 1079, 1081):
        for frac in (0.7, 0.8):
            ch = frac * size
            top = int(round((size - ch) / 2.0))
            img = Image.fromarray(np.zeros((size, 8, 3), np.uint8))
            out = img.crop((0, top, 8, top + ch))
            r0, r1 = center_crop_bounds(size, frac)
            assert (r0, r1) == (top, top + out.size[1]), (size, frac)
    # the augmentation-side crop uses the same bounds
    frames = np.arange(101 * 50 * 3, dtype=np.float32).reshape(1, 101, 50, 3)
    out = center_border_crop(frames, 0.7, 0.7)
    r0, r1 = center_crop_bounds(101, 0.7)
    c0, c1 = center_crop_bounds(50, 0.7)
    np.testing.assert_array_equal(np.asarray(out),
                                  frames[:, r0:r1, c0:c1])
