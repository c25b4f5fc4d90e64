"""RAFT parity: JAX implementation + converter vs golden torch (official
princeton-vl semantics).  Gate for BASELINE config 2 (dual-stream flow)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sais_tpu.config import RAFTConfig
from sais_tpu.models.raft import (pad_to_multiple_of_8, raft_forward,
                                  raft_init, raft_params_from_torch, unpad)
from tests.golden.torch_raft import golden_raft_forward, random_raft_state_dict

pytestmark = pytest.mark.slow


def test_raft_forward_matches_torch():
    gen = torch.Generator().manual_seed(0)
    sd = random_raft_state_dict(gen)
    i1 = torch.rand(1, 3, 128, 128, generator=gen) * 255
    i2 = torch.rand(1, 3, 128, 128, generator=gen) * 255

    golden = golden_raft_forward(sd, i1, i2, iters=3)

    params = raft_params_from_torch(sd)
    ours = raft_forward(params, jnp.asarray(i1.numpy().transpose(0, 2, 3, 1)),
                        jnp.asarray(i2.numpy().transpose(0, 2, 3, 1)),
                        RAFTConfig(), iters=3)
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_nchw, golden.numpy(), rtol=1e-3,
                               atol=2e-3)


def test_raft_odd_fmap_dims():
    """Non-power-of-two fmap sizes exercise the floor avg-pool path."""
    gen = torch.Generator().manual_seed(1)
    sd = random_raft_state_dict(gen)
    i1 = torch.rand(1, 3, 136, 152, generator=gen) * 255  # fmap 17x19
    i2 = torch.rand(1, 3, 136, 152, generator=gen) * 255
    golden = golden_raft_forward(sd, i1, i2, iters=2)
    params = raft_params_from_torch(sd)
    ours = raft_forward(params, jnp.asarray(i1.numpy().transpose(0, 2, 3, 1)),
                        jnp.asarray(i2.numpy().transpose(0, 2, 3, 1)),
                        RAFTConfig(), iters=2)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               golden.numpy(), rtol=1e-3, atol=2e-3)


def test_raft_init_and_padding():
    cfg = RAFTConfig()
    params = raft_init(jax.random.key(0), cfg)
    img = jnp.ones((1, 50, 70, 3)) * 128.0
    padded, pads = pad_to_multiple_of_8(img)
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    flow = raft_forward(params, padded, padded, cfg, iters=2)
    flow = unpad(flow, pads)
    assert flow.shape == (1, 50, 70, 2)
    assert np.isfinite(np.asarray(flow)).all()
    # identical frames with random weights: flow should stay small/finite
    assert np.abs(np.asarray(flow)).max() < 100


def test_raft_config_dims_respected():
    """hidden_dim/context_dim are independent knobs: the context split is
    at hidden_dim (torch: torch.split(cnet, [hdim, cdim], dim=1)) and the
    GRU gates size hdim + cdim + 128 -> hdim.  RAFT-small is a different
    architecture and must refuse loudly."""
    import pytest

    from sais_tpu.config import RAFTConfig
    from sais_tpu.models.raft import raft_forward, raft_init

    cfg = RAFTConfig(hidden_dim=96, context_dim=160)
    p = raft_init(jax.random.key(0), cfg)
    i1 = jnp.zeros((1, 32, 40, 3), jnp.uint8)
    f = raft_forward(p, i1, i1, cfg, iters=2)
    assert f.shape == (1, 32, 40, 2)
    assert np.isfinite(np.asarray(f)).all()
    with pytest.raises(NotImplementedError, match="small"):
        raft_forward(p, i1, i1, RAFTConfig(small=True))


def test_stem_s2d_exact():
    """The space-to-depth stride-2 stem is the direct conv exactly (up to
    float reassociation) for both RAFT stride-2 kernel sizes."""
    from sais_tpu.models.raft import _conv, _stem_conv_s2d
    key = jax.random.key(3)
    for h, w, k, cin, cout in [(48, 64, 7, 3, 32), (24, 40, 3, 16, 24)]:
        kx, kw, kb = jax.random.split(jax.random.fold_in(key, k * h), 3)
        x = jax.random.normal(kx, (2, h, w, cin), jnp.float32)
        p = {"w": jax.random.normal(kw, (k, k, cin, cout)) * 0.1,
             "b": jax.random.normal(kb, (cout,)) * 0.1}
        ref = _conv(x, p, 2)
        got = _stem_conv_s2d(x, p)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
