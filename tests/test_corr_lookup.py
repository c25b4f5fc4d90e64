"""Correlation-lookup kernels: the three implementations must agree.

The shift-based lookup (_lookup_level_shift) is the production path; the
element-gather version (_lookup_level) is the semantic reference
(grid_sample(align_corners=True, padding_mode='zeros') at 81 offsets,
official CorrBlock ordering quirk — RAFT/corr.py upstream).  Fast tier:
small arrays, no torch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.models.raft import (_lookup_level, _lookup_level_matmul,
                                  _lookup_level_shift, corr_lookup,
                                  corr_pyramid)


def _case(seed=0, b=2, hl=13, wl=17, lo=-9.0, hi=25.0):
    key = jax.random.PRNGKey(seed)
    n = hl * wl
    corr = jax.random.normal(key, (b, n, hl, wl))
    coords = jax.random.uniform(jax.random.fold_in(key, 1), (b, n, 2),
                                minval=lo, maxval=hi)
    return corr, coords


@pytest.mark.parametrize("impl", [_lookup_level_shift, _lookup_level_matmul])
def test_lookup_matches_gather_reference(impl):
    corr, coords = _case()
    ref = np.asarray(_lookup_level(corr, coords, 4))
    got = np.asarray(impl(corr, coords, 4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_lookup_far_outside_is_zero():
    """Windows entirely outside the volume must be exactly zero (the
    grid_sample zero-padding contract)."""
    corr, _ = _case()
    b, n = corr.shape[:2]
    coords = jnp.full((b, n, 2), 1e4)
    out = np.asarray(_lookup_level_shift(corr, coords, 4))
    assert (out == 0).all()
    coords = jnp.full((b, n, 2), -1e4)
    out = np.asarray(_lookup_level_shift(corr, coords, 4))
    assert (out == 0).all()


def test_lookup_partial_boundary_window():
    """Centers just outside the grid still pick up the in-range tail of
    their bilinear window."""
    corr, _ = _case(b=1, hl=8, wl=8)
    # center at (-0.5, -0.5): floor lands off-grid but floor+1 is row/col 0
    coords = jnp.full((1, corr.shape[1], 2), -0.5)
    ref = np.asarray(_lookup_level(corr, coords, 4))
    got = np.asarray(_lookup_level_shift(corr, coords, 4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert np.abs(ref).sum() > 0


def test_lookup_exact_integer_coords():
    """Integer coords (frac == 0) hit single grid points exactly."""
    corr, _ = _case(b=1, hl=10, wl=12)
    b, n, hl, wl = corr.shape
    coords = jnp.tile(jnp.array([[5.0, 4.0]]), (b, n, 1))
    out = np.asarray(_lookup_level_shift(corr, coords, 1))
    cn = np.asarray(corr)
    # offset ordering is x-major: k = (a, c) samples (x + a - r, y + c - r)
    for a in range(3):
        for c in range(3):
            expect = cn[:, :, 4 + c - 1, 5 + a - 1]
            np.testing.assert_allclose(out[..., a * 3 + c], expect,
                                       rtol=1e-6, atol=1e-6)


def test_corr_lookup_modes_agree_through_pyramid():
    key = jax.random.PRNGKey(3)
    b, h, w, d = 2, 16, 24, 32
    f1 = jax.random.normal(key, (b, h, w, d))
    f2 = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, d))
    pyr = corr_pyramid(f1, f2, 4)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = (jnp.stack([gx, gy], -1)[None].repeat(b, 0)
              + jax.random.normal(jax.random.fold_in(key, 2), (b, h, w, 2)) * 3)
    ref = np.asarray(corr_lookup(pyr, coords, 4, mode="gather"))
    for mode in ("shift", "matmul"):
        got = np.asarray(corr_lookup(pyr, coords, 4, mode=mode))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=mode)


def test_lanes_layout_matches_query_major():
    """corr_pyramid_lanes + corr_lookup_lanes (the raft_forward fast path)
    must reproduce the query-major gather reference exactly."""
    from sais_tpu.models.raft import corr_lookup_lanes, corr_pyramid_lanes

    key = jax.random.PRNGKey(7)
    b, h, w, d = 2, 14, 22, 32
    f1 = jax.random.normal(key, (b, h, w, d))
    f2 = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, d))
    pyr_q = corr_pyramid(f1, f2, 4)
    pyr_l = corr_pyramid_lanes(f1, f2, 4)
    for cq, cl in zip(pyr_q, pyr_l):
        np.testing.assert_allclose(np.asarray(cq),
                                   np.asarray(cl).transpose(0, 3, 1, 2),
                                   rtol=1e-5, atol=1e-5)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = (jnp.stack([gx, gy], -1)[None].repeat(b, 0)
              + jax.random.normal(jax.random.fold_in(key, 2), (b, h, w, 2)) * 4)
    ref = np.asarray(corr_lookup(pyr_q, coords, 4, mode="gather"))
    got = np.asarray(corr_lookup_lanes(pyr_l, coords, 4))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
