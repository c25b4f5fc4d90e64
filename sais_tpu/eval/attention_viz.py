"""Attention-map visualization (reference: dino-main/visualize_attention.py).

Produces per-head CLS-attention heatmaps at image resolution and the
mass-thresholded binary masks the reference renders (sort attention
descending, keep the smallest set of patches holding `threshold` of the
mass — visualize_attention.py:179-213).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sais_tpu.config import ViTConfig
from sais_tpu.models.vit import vit_forward


def cls_attention_maps(params, images: jnp.ndarray, cfg: ViTConfig
                       ) -> np.ndarray:
    """(B, H, W, 3) normalized -> (B, heads, gh, gw) CLS-to-patch attention
    of the last block (get_last_selfattention equivalent)."""
    _, attn = vit_forward(params, images, cfg, return_last_attention=True)
    # attn: (B, heads, N+1, N+1); CLS row without the CLS column
    cls_attn = attn[:, :, 0, 1:]
    b, h, n = cls_attn.shape
    gh = images.shape[1] // cfg.patch_size
    gw = images.shape[2] // cfg.patch_size
    return np.asarray(cls_attn.reshape(b, h, gh, gw), np.float32)


def upsample_maps(maps: np.ndarray, patch_size: int) -> np.ndarray:
    """Nearest-neighbor upsample patch-grid maps to pixel resolution
    (the reference uses nn.functional.interpolate scale_factor=patch)."""
    return maps.repeat(patch_size, axis=-2).repeat(patch_size, axis=-1)


def threshold_masks(maps: np.ndarray, threshold: float = 0.6) -> np.ndarray:
    """Keep the top patches holding `threshold` of total attention mass per
    head (visualize_attention.py:188-199).  maps: (B, heads, gh, gw) ->
    bool masks of the same shape."""
    b, h, gh, gw = maps.shape
    flat = maps.reshape(b, h, gh * gw)
    val = flat / flat.sum(axis=-1, keepdims=True)
    order = np.argsort(val, axis=-1)               # ascending
    sorted_vals = np.take_along_axis(val, order, -1)
    cum = np.cumsum(sorted_vals, axis=-1)
    keep_sorted = cum > (1 - threshold)
    keep = np.zeros_like(keep_sorted)
    np.put_along_axis(keep, order, keep_sorted, axis=-1)
    return keep.reshape(b, h, gh, gw)


def save_attention_pngs(maps: np.ndarray, out_prefix: str,
                        patch_size: int = 16) -> list:
    """Write one grayscale PNG per head; returns the paths."""
    from PIL import Image
    up = upsample_maps(maps, patch_size)
    paths = []
    for b in range(up.shape[0]):
        for h in range(up.shape[1]):
            m = up[b, h]
            m = (255 * (m - m.min()) / max(m.max() - m.min(), 1e-9))
            path = f"{out_prefix}_img{b}_head{h}.png"
            Image.fromarray(m.astype(np.uint8)).save(path)
            paths.append(path)
    return paths
