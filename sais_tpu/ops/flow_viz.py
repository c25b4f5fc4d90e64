"""Optical-flow -> RGB rendering (flowpy algorithm, which ptlflow vendors).

The reference renders RAFT flow fields to RGB JPEGs via
ptlflow.utils.flow_utils.flow_to_rgb and feeds those images to DINO
(extract_representations.py:243-247, 254-262).  ptlflow's implementation is
adapted from the public `flowpy` package: a 55-entry Middlebury-style color
wheel (transition lengths 15/6/4/11/13/6 through R-Y-G-C-B-M-R), hue from
the flow angle with linear interpolation between wheel entries, saturation
from the radius normalized by the per-call max, 'bright' background
(white at zero motion).  The reference then converts to uint8 by
truncation: np.uint8(rgb * 255).

Implemented in numpy (host-side rendering; the flow field itself comes off
the TPU) with per-sample max-radius normalization matching the reference's
one-image-at-a-time call pattern.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

DEFAULT_TRANSITIONS = (15, 6, 4, 11, 13, 6)


def make_colorwheel(transitions=DEFAULT_TRANSITIONS) -> np.ndarray:
    """(sum(transitions), 3) float wheel through R-Y-G-C-B-M-R."""
    hues = np.array([
        [255, 0, 0], [255, 255, 0], [0, 255, 0],
        [0, 255, 255], [0, 0, 255], [255, 0, 255], [255, 0, 0],
    ], dtype=np.float64)
    wheel = np.zeros((sum(transitions), 3))
    col = 0
    for i, t in enumerate(transitions):
        for j in range(t):
            wheel[col] = hues[i] + (hues[i + 1] - hues[i]) * (j / t)
            col += 1
    return wheel


_WHEEL = make_colorwheel()


def flow_to_rgb(flow: np.ndarray, flow_max_radius: Optional[float] = None,
                background: str = "bright") -> np.ndarray:
    """(H, W, 2) flow (u, v) -> (H, W, 3) float RGB in [0, 1].

    flowpy semantics: angle = arg(u + i v) mapped onto the wheel with
    (ncols-1)/(2 pi) scaling; 'bright' renders color = 1 - r*(1 - hue);
    radius > 1 pixels fall back to value-scaled hue (hue / r).
    """
    u = flow[..., 0].astype(np.float64)
    v = flow[..., 1].astype(np.float64)
    nan_mask = ~np.isfinite(u) | ~np.isfinite(v)
    u = np.where(nan_mask, 0.0, u)
    v = np.where(nan_mask, 0.0, v)
    radius = np.sqrt(u * u + v * v)
    angle = np.arctan2(v, u)
    if flow_max_radius is None:
        flow_max_radius = float(np.max(radius)) if radius.size else 1.0
    if flow_max_radius > 0:
        radius = radius / flow_max_radius
    ncols = len(_WHEEL)
    angle = np.where(angle < 0, angle + 2 * np.pi, angle)
    angle = angle * ((ncols - 1) / (2 * np.pi))
    frac, floor = np.modf(angle)
    ceil = np.ceil(angle).astype(int) % ncols
    hue = (_WHEEL[floor.astype(int)] * (1 - frac[..., None]) +
           _WHEEL[ceil] * frac[..., None])
    r = radius[..., None]
    if background == "bright":
        colors = 255.0 - r * (255.0 - hue)
        over = radius > 1
        colors[over] = hue[over] / r[over]
        colors[nan_mask] = 0.0
    else:
        colors = r * hue
        over = radius > 1
        colors[over] = 255.0 - (1.0 / r[over]) * (255.0 - hue[over])
        colors[nan_mask] = 255.0
    return (colors / 255.0).astype(np.float32)


def flow_to_rgb_uint8(flow: np.ndarray, **kw) -> np.ndarray:
    """Reference output convention: truncating uint8 of rgb*255
    (extract_representations.py:247)."""
    return (flow_to_rgb(flow, **kw) * 255.0).astype(np.uint8)


def flow_to_rgb_device(flow, background: str = "bright"):
    """Batched ON-DEVICE twin of `flow_to_rgb_uint8`: (B, H, W, 2) jnp flow
    -> (B, H, W, 3) uint8, per-sample max-radius normalization (the
    reference's one-image-at-a-time call pattern).

    TPU-first: the 55-entry wheel lookup runs as a weights-matrix matmul
    (one-hot rows built from iota comparisons) instead of a per-pixel
    gather — TPU gathers serialize, a (N, 55) x (55, 3) GEMM streams.
    Matches the numpy/flowpy implementation to <= 1 uint8 level (f32 vs
    f64 rounding at the truncation boundary).
    """
    import jax
    import jax.numpy as jnp

    wheel = jnp.asarray(_WHEEL, jnp.float32)            # (ncols, 3)
    ncols = wheel.shape[0]
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)
    finite = jnp.isfinite(u) & jnp.isfinite(v)
    u = jnp.where(finite, u, 0.0)
    v = jnp.where(finite, v, 0.0)
    radius = jnp.sqrt(u * u + v * v)
    max_r = jnp.max(radius, axis=(1, 2), keepdims=True)
    radius = radius / jnp.where(max_r > 0, max_r, 1.0)
    angle = jnp.arctan2(v, u)
    angle = jnp.where(angle < 0, angle + 2 * jnp.pi, angle)
    angle = angle * ((ncols - 1) / (2 * jnp.pi))
    floor = jnp.floor(angle)
    frac = angle - floor
    fi = floor.astype(jnp.int32)
    ci = jnp.ceil(angle).astype(jnp.int32) % ncols
    # one-hot interpolation weights (B, H, W, ncols) -> wheel matmul
    iota = jnp.arange(ncols, dtype=jnp.int32)
    w = ((fi[..., None] == iota) * (1.0 - frac[..., None])
         + (ci[..., None] == iota) * frac[..., None]).astype(jnp.float32)
    hue = jax.lax.dot_general(w, wheel, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    r = radius[..., None]
    over = (radius > 1)[..., None]
    if background == "bright":
        colors = 255.0 - r * (255.0 - hue)
        colors = jnp.where(over, hue / jnp.maximum(r, 1e-12), colors)
        colors = jnp.where(finite[..., None], colors, 0.0)
    else:
        colors = r * hue
        colors = jnp.where(over,
                           255.0 - (255.0 - hue) / jnp.maximum(r, 1e-12),
                           colors)
        colors = jnp.where(finite[..., None], colors, 255.0)
    return jnp.clip(colors, 0.0, 255.0).astype(jnp.uint8)
