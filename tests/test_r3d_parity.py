"""R3D-18 parity: JAX + converter vs golden functional torch."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sais_tpu.models.r3d import (normalize_clips, r3d18_features, r3d18_init,
                                 r3d18_params_from_torch)
from tests.golden.torch_r3d import (golden_r3d18_features,
                                    random_r3d18_state_dict)

pytestmark = pytest.mark.slow


def test_r3d18_matches_torch():
    gen = torch.Generator().manual_seed(0)
    sd = random_r3d18_state_dict(gen)
    clips = torch.randn(2, 3, 5, 32, 32, generator=gen)
    golden = golden_r3d18_features(sd, clips)

    params = r3d18_params_from_torch(sd)
    ours = r3d18_features(params,
                          jnp.asarray(clips.numpy().transpose(0, 2, 3, 4, 1)))
    assert ours.shape == (2, 512)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_r3d18_init_and_normalize():
    params = r3d18_init(jax.random.key(0))
    clips = jnp.ones((1, 5, 32, 32, 3), jnp.uint8) * 128
    x = normalize_clips(clips)
    feats = r3d18_features(params, x)
    assert feats.shape == (1, 512)
    assert np.isfinite(np.asarray(feats)).all()
