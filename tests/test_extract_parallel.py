"""Data-parallel extraction: mesh-sharded FeatureExtractor / FlowExtractor
must equal the single-device path (8 virtual CPU devices, conftest)."""

import numpy as np

import jax

from sais_tpu.config import MeshConfig, PipelineConfig
from sais_tpu.infer.pipeline import FeatureExtractor, FlowExtractor
from sais_tpu.models.raft import raft_init
from sais_tpu.models.vit import vit_init
from sais_tpu.parallel.mesh import make_mesh

import dataclasses


def _f32_cfg():
    return dataclasses.replace(PipelineConfig(), compute_dtype="float32")


def test_feature_extractor_mesh_matches_single_device():
    cfg = _f32_cfg()
    params = vit_init(jax.random.key(0), cfg.vit)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (20, 120, 160, 3), dtype=np.uint8)

    single = FeatureExtractor(params, cfg, batch_size=8,
                              use_native_decode=False)
    mesh = make_mesh(MeshConfig())
    assert mesh.devices.size == 8
    sharded = FeatureExtractor(params, cfg, batch_size=8,
                               use_native_decode=False, mesh=mesh)
    a = single.extract_array(frames)
    b = sharded.extract_array(frames)
    assert a.shape == b.shape == (20, cfg.vit.embed_dim)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_feature_extractor_mesh_rounds_batch_to_devices():
    cfg = _f32_cfg()
    params = vit_init(jax.random.key(0), cfg.vit)
    mesh = make_mesh(MeshConfig())
    fx = FeatureExtractor(params, cfg, batch_size=13,
                          use_native_decode=False, mesh=mesh)
    assert fx.batch_size % mesh.devices.size == 0


def test_flow_extractor_mesh_matches_single_device():
    cfg = _f32_cfg()
    raft = raft_init(jax.random.key(1), cfg.raft)
    vit = vit_init(jax.random.key(0), cfg.vit)
    rng = np.random.default_rng(1)
    # 40 frames at jump 15 -> 2 pairs; small res to keep CPU fast
    frames = rng.integers(0, 255, (40, 48, 64, 3), dtype=np.uint8)

    single = FlowExtractor(raft, vit, cfg, pair_batch=2, iters=2)
    mesh = make_mesh(MeshConfig())
    sharded = FlowExtractor(raft, vit, cfg, pair_batch=8, iters=2, mesh=mesh)
    a = single.flow_fields(frames)
    b = sharded.flow_fields(frames)   # 2 pairs padded to 8, trimmed back
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
