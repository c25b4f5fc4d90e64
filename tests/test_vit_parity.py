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


def test_pos_embed_interpolation_matches_torch_bicubic():
    """Non-224 inputs: interpolate_pos_encoding parity incl. torch's
    a=-0.75 bicubic kernel, the explicit-scale coordinate transform, and
    DINO's +0.1 scale fudge (vision_transformer.py:174-194, issue #8)."""
    import torch.nn.functional as F

    from sais_tpu.models.vit import interpolate_pos_embed

    rng = np.random.default_rng(0)
    side, dim = 14, 32
    pe = rng.normal(size=(1, side * side + 1, dim)).astype(np.float32)
    for gh, gw in ((30, 56), (7, 7), (13, 21)):
        ours = np.asarray(interpolate_pos_embed(jnp.asarray(pe),
                                                gh * gw, gh, gw))
        t = torch.from_numpy(pe[:, 1:]).reshape(1, side, side, dim) \
            .permute(0, 3, 1, 2)
        ref = F.interpolate(t, scale_factor=((gh + 0.1) / side,
                                             (gw + 0.1) / side),
                            mode="bicubic", recompute_scale_factor=False)
        assert ref.shape[-2:] == (gh, gw)
        ref = ref.permute(0, 2, 3, 1).reshape(1, -1, dim).numpy()
        np.testing.assert_allclose(
            ours, np.concatenate([pe[:, :1], ref], axis=1), atol=1e-5)
