"""Tensor-parallel ViT over a 2-D (data x model) mesh matches single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import MeshConfig, ViTConfig
from sais_tpu.models.vit import vit_features, vit_init
from sais_tpu.parallel.mesh import make_mesh
from sais_tpu.parallel.tp import (put_tp_params, shard_vit_params_tp,
                                  tp_vit_features)

pytestmark = pytest.mark.slow


def test_tp_vit_matches_single_device():
    cfg = ViTConfig(image_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4)
    params = vit_init(jax.random.key(0), cfg)
    images = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))

    ref = vit_features(params, images, cfg)

    # 4 data x 2 model mesh on the 8 virtual CPU devices
    mesh = make_mesh(MeshConfig(model_parallel=2))
    assert mesh.shape == {"data": 4, "model": 2}
    tp_params = put_tp_params(shard_vit_params_tp(params, cfg, 2), mesh)
    out = tp_vit_features(tp_params, images, cfg, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_tp_four_way():
    cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=64, depth=1,
                    num_heads=4)
    params = vit_init(jax.random.key(2), cfg)
    images = jax.random.uniform(jax.random.key(3), (4, 16, 16, 3))
    ref = vit_features(params, images, cfg)
    mesh = make_mesh(MeshConfig(model_parallel=4))  # 2 data x 4 model
    tp_params = put_tp_params(shard_vit_params_tp(params, cfg, 4), mesh)
    out = tp_vit_features(tp_params, images, cfg, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
