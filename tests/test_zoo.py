"""Model zoo (hubconf surface): geometries + port parity.

The reference exposes dino_vits16/8 and dino_vitb16/8 as torch-hub entry
points (dino-main/hubconf.py:22-81); sais_tpu.models.zoo mirrors the
same named geometries with local-checkpoint porting.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.models import zoo
from sais_tpu.models.vit import vit_features, vit_forward
from sais_tpu.port.torch_port import vit_params_from_torch

REF_DINO = "/root/reference/SAIS/scripts/dino-main"


def test_zoo_configs_match_hubconf_geometries():
    """hubconf builds vit_small / vit_base at patch 16 and 8
    (hubconf.py:27,42,57,72 + vision_transformer.py:243-255)."""
    s16 = zoo.config("vits16")
    assert (s16.patch_size, s16.embed_dim, s16.depth, s16.num_heads) == \
        (16, 384, 12, 6)
    s8 = zoo.config("dino_vits8")          # hubconf alias
    assert (s8.patch_size, s8.embed_dim) == (8, 384)
    b16 = zoo.config("vitb16")
    assert (b16.embed_dim, b16.depth, b16.num_heads) == (768, 12, 12)
    b8 = zoo.config("dino_vitb8")
    assert (b8.patch_size, b8.embed_dim) == (8, 768)
    with pytest.raises(KeyError):
        zoo.config("dino_resnet50")        # deliberately out of scope


def test_zoo_create_random_init_forwards():
    """Every zoo geometry random-inits and runs a forward at a small
    image size (pos-embed interpolation covers the non-default grid)."""
    for name in ("vits16", "vits8"):
        params, cfg = zoo.create(name, key=jax.random.key(0))
        imgs = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
        feats = vit_features(params, imgs, cfg)
        assert feats.shape == (2, cfg.embed_dim)
        assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.slow
def test_zoo_vits8_parity_with_reference_module(tmp_path):
    """Port a REAL reference vit_small(patch_size=8) state dict through
    the zoo checkpoint path and match CLS features at 96x96."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF_DINO):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF_DINO)
    try:
        import vision_transformer as vits
    finally:
        sys.path.remove(REF_DINO)

    torch.manual_seed(0)
    m = vits.vit_small(patch_size=8)       # vision_transformer.py:243-247
    m.eval()
    ckpt = tmp_path / "vits8.pth"
    torch.save(m.state_dict(), str(ckpt))

    params, cfg = zoo.create("vits8", torch_checkpoint=str(ckpt))
    gen = torch.Generator().manual_seed(1)
    imgs = torch.randn(2, 3, 96, 96, generator=gen)
    with torch.no_grad():
        ref = m(imgs)
    ours, _ = vit_forward(params,
                          jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)),
                          cfg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-3, atol=1e-4)
