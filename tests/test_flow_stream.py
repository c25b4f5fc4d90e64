"""Flow stream: rendering semantics + end-to-end flow feature extraction."""

import numpy as np
import pytest

import jax

from sais_tpu.config import (PipelineConfig, PreprocessConfig, RAFTConfig,
                             ViTConfig)
from sais_tpu.ops.flow_viz import flow_to_rgb, flow_to_rgb_uint8, make_colorwheel

pytestmark = pytest.mark.slow


def test_colorwheel_shape_and_anchors():
    w = make_colorwheel()
    assert w.shape == (55, 3)
    np.testing.assert_array_equal(w[0], [255, 0, 0])      # pure red start
    np.testing.assert_array_equal(w[15], [255, 255, 0])   # yellow after RY


def test_zero_flow_renders_white_on_bright():
    rgb = flow_to_rgb(np.zeros((4, 4, 2)), flow_max_radius=1.0)
    np.testing.assert_allclose(rgb, 1.0)


def test_max_radius_normalization_and_hue():
    flow = np.zeros((1, 2, 2))
    flow[..., 0] = [2.0, 0.0]  # pixel 0: pure +x motion, pixel 1: none
    rgb = flow_to_rgb(flow)
    # +x motion at full radius -> saturated wheel[0] = red
    np.testing.assert_allclose(rgb[0, 0], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(rgb[0, 1], [1.0, 1.0, 1.0], atol=1e-6)
    u8 = flow_to_rgb_uint8(flow)
    assert u8.dtype == np.uint8 and u8[0, 0, 0] == 255


def test_flow_to_rgb_device_matches_numpy():
    """The on-device renderer (one-hot matmul wheel lookup) matches the
    flowpy-parity numpy implementation to <= 1 uint8 level (f32 vs f64
    rounding at the truncation boundary), per-sample normalization."""
    import jax.numpy as jnp

    from sais_tpu.ops.flow_viz import flow_to_rgb_device
    rng = np.random.default_rng(3)
    flow = (rng.standard_normal((5, 33, 47, 2)) * 7).astype(np.float32)
    flow[0] *= 0.01                       # per-sample max radius differs
    flow[1, :4, :4] = 0                   # zero-motion patch
    ref = np.stack([flow_to_rgb_uint8(f) for f in flow])
    dev = np.asarray(flow_to_rgb_device(jnp.asarray(flow)))
    diff = np.abs(ref.astype(int) - dev.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_flow_extractor_end_to_end():
    from sais_tpu.infer.pipeline import FlowExtractor
    from sais_tpu.models.raft import raft_init
    from sais_tpu.models.vit import vit_init

    cfg = PipelineConfig(
        vit=ViTConfig(image_size=32, patch_size=8, embed_dim=48, depth=1,
                      num_heads=4),
        preprocess=PreprocessConfig(resize=32),
        raft=RAFTConfig(iters=2),
        compute_dtype="float32",
    )
    raft_params = raft_init(jax.random.key(0), cfg.raft)
    vit_params = vit_init(jax.random.key(1), cfg.vit)
    fx = FlowExtractor(raft_params, vit_params, cfg, pair_batch=2)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (40, 128, 136, 3), dtype=np.uint8)
    reps, rgb = fx.extract(frames)
    # 40 frames, jump 15 -> pair starts 0, 15 (range(0, 25, 15))
    assert reps.shape == (2, 48)
    assert rgb.shape == (2, 128, 136, 3) and rgb.dtype == np.uint8
    assert np.isfinite(reps).all()

    # streaming path == array path (same pairing, same numerics), while
    # never buffering more than pair_batch frame pairs on the host
    # (extract_representations.py:145-176 streams through a dataloader; the
    # array path cannot run on multi-hour videos)
    stream_reps = fx.extract_video(None, frame_source=iter(frames))
    np.testing.assert_allclose(stream_reps, reps, atol=1e-5)
    assert fx.peak_buffered_pairs <= 2

    # pairing parity across awkward lengths (n = k*jump, k*jump+1, etc.)
    for n in (30, 31, 45, 46, 59):
        sub = frames[:n]
        a, _ = fx.extract(sub)
        b = fx.extract_video(None, frame_source=iter(sub))
        assert a.shape == b.shape, n
        np.testing.assert_allclose(b, a, atol=1e-5)


def test_tail_chunk_reuses_one_compiled_shape():
    """The last partial pair-chunk is padded to the full batch on a single
    chip too — one compiled RAFT shape per resolution regardless of video
    length (a fresh tail shape costs an extra XLA compile, 20-180 s
    through a remote-compile tunnel)."""
    from sais_tpu.infer.pipeline import FlowExtractor
    from sais_tpu.models.raft import raft_init
    from sais_tpu.models.vit import vit_init

    cfg = PipelineConfig(
        vit=ViTConfig(image_size=32, patch_size=8, embed_dim=48, depth=1,
                      num_heads=4),
        preprocess=PreprocessConfig(resize=32),
        raft=RAFTConfig(iters=1),
        compute_dtype="float32",
    )
    fx = FlowExtractor(raft_init(jax.random.key(0), cfg.raft),
                       vit_init(jax.random.key(1), cfg.vit), cfg,
                       pair_batch=2)
    shapes = set()
    orig_flow, orig_fused = fx._flow_fn, fx._fused_fn

    def spy_flow(params, a, b):
        shapes.add(tuple(a.shape))
        return orig_flow(params, a, b)

    def spy_fused(rp, vp, a, b):
        shapes.add(tuple(a.shape))
        return orig_fused(rp, vp, a, b)

    fx._flow_fn = spy_flow
    fx._fused_fn = spy_fused
    rng = np.random.default_rng(1)
    # 50 frames @ jump 15 -> pair starts 0/15/30 -> 3 pairs = 2 + 1 (tail)
    frames = rng.integers(0, 255, (50, 64, 72, 3), dtype=np.uint8)
    out = fx.flow_fields(frames)
    assert out.shape[0] == 3
    stream = fx.extract_video(None, frame_source=iter(frames))
    assert stream.shape[0] == 3
    assert shapes == {(2, 64, 72, 3)}   # tail padded, single dispatch shape


def test_extract_video_missing_file_raises():
    """Producer-thread decode failures must surface, not masquerade as an
    empty video (code-review finding: try/finally swallowed them)."""
    import dataclasses

    import jax

    from sais_tpu.infer.pipeline import FeatureExtractor, FlowExtractor
    from sais_tpu.models.raft import raft_init
    from sais_tpu.models.vit import vit_init

    cfg = dataclasses.replace(PipelineConfig(), compute_dtype="float32")
    vit = vit_init(jax.random.key(0), cfg.vit)
    fx = FeatureExtractor(vit, cfg, use_native_decode=False)
    with pytest.raises(FileNotFoundError):
        fx.extract_video("/nonexistent/video.mp4")
    raft = raft_init(jax.random.key(1), cfg.raft)
    fl = FlowExtractor(raft, vit, cfg)
    with pytest.raises(FileNotFoundError):
        fl.extract_video("/nonexistent/video.mp4")
