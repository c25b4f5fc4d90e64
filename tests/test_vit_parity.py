"""Numerical parity: JAX ViT + torch weight converter vs golden torch DINO ViT.

Gate 1 of the build plan (SURVEY.md section 7): CLS features must match the
PyTorch reference implementation to <=1e-3 (we hold ourselves to 1e-4 in f32).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sais_tpu.config import ViTConfig
from sais_tpu.models.vit import vit_forward, vit_init
from sais_tpu.port.torch_port import vit_params_from_torch
from tests.golden.torch_vit import golden_vit_forward, random_dino_state_dict

SMALL = dict(depth=3, dim=64, heads=4, patch=8, img=32)


def _small_cfg():
    return ViTConfig(image_size=SMALL["img"], patch_size=SMALL["patch"],
                     embed_dim=SMALL["dim"], depth=SMALL["depth"],
                     num_heads=SMALL["heads"])


def test_cls_features_match_torch():
    gen = torch.Generator().manual_seed(0)
    sd = random_dino_state_dict(gen, depth=SMALL["depth"], dim=SMALL["dim"],
                                heads=SMALL["heads"], patch=SMALL["patch"],
                                img=SMALL["img"])
    images = torch.randn(4, 3, SMALL["img"], SMALL["img"], generator=gen)

    golden = golden_vit_forward(sd, images, depth=SMALL["depth"],
                                heads=SMALL["heads"], patch=SMALL["patch"])

    params = vit_params_from_torch(sd)
    ours, _ = vit_forward(params, jnp.asarray(images.numpy().transpose(0, 2, 3, 1)),
                          _small_cfg())
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_last_attention_matches_torch():
    gen = torch.Generator().manual_seed(1)
    sd = random_dino_state_dict(gen, depth=SMALL["depth"], dim=SMALL["dim"],
                                heads=SMALL["heads"], patch=SMALL["patch"],
                                img=SMALL["img"])
    images = torch.randn(2, 3, SMALL["img"], SMALL["img"], generator=gen)
    _, golden_attn = golden_vit_forward(
        sd, images, depth=SMALL["depth"], heads=SMALL["heads"],
        patch=SMALL["patch"], return_last_attention=True)

    params = vit_params_from_torch(sd)
    _, attn = vit_forward(params,
                          jnp.asarray(images.numpy().transpose(0, 2, 3, 1)),
                          _small_cfg(), return_last_attention=True)
    np.testing.assert_allclose(np.asarray(attn), golden_attn.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_vit_s16_full_size_parity():
    """Full ViT-S/16 at 224x224 — the production configuration."""
    gen = torch.Generator().manual_seed(2)
    sd = random_dino_state_dict(gen)
    images = torch.randn(2, 3, 224, 224, generator=gen)
    golden = golden_vit_forward(sd, images)

    params = vit_params_from_torch(sd)
    ours, _ = vit_forward(params,
                          jnp.asarray(images.numpy().transpose(0, 2, 3, 1)),
                          ViTConfig())
    assert ours.shape == (2, 384)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_vit_init_and_jit():
    cfg = _small_cfg()
    params = vit_init(jax.random.key(0), cfg)
    fn = jax.jit(lambda p, x: vit_forward(p, x, cfg)[0])
    out = fn(params, jnp.ones((2, SMALL["img"], SMALL["img"], 3)))
    assert out.shape == (2, SMALL["dim"])
    assert np.isfinite(np.asarray(out)).all()


def test_vit_bf16_close_to_f32():
    cfg = _small_cfg()
    params = vit_init(jax.random.key(1), cfg)
    x = jax.random.normal(jax.random.key(2), (2, SMALL["img"], SMALL["img"], 3))
    f32, _ = vit_forward(params, x, cfg)
    bf16, _ = vit_forward(params, x, cfg, compute_dtype=jnp.bfloat16)
    # bf16 compute path stays within loose tolerance of f32
    assert np.max(np.abs(np.asarray(f32) - np.asarray(bf16))) < 0.15
