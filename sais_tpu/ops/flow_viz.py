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
