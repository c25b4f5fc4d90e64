"""Device-side frame preprocessing: center-crop, resize, normalize.

Reference pipeline (SurgDataset.__getitem__, main_dino.py:300-326 +
prepare-transform, extract_representations.py:145-162): PIL center-crop to
0.8H x 0.8W, bilinear resize to 224x224, /255, ImageNet mean/std.  Here the
whole batch is processed on-device in one fused XLA program; uint8 frames
travel over PCIe and everything else stays on chip.

Crop arithmetic matches torchvision's center_crop rounding
(top = round((H - 0.8H)/2), box edges truncated like PIL Image.crop).

The resize is BIT-EXACT with PIL's `Image.resize((r, r), BILINEAR)` on
uint8 images: Pillow resamples in fixed point (triangle filter with
adaptive support, coefficients quantized to 1 << 22, horizontal pass
rounded/clipped to uint8 BEFORE the vertical pass — Resample.c
precompute_coeffs/normalize_coeffs_8bpc/ImagingResampleHorizontal_8bpc),
and `_resize_pil_exact` replays that integer arithmetic on device with
ksize banded gathers per axis instead of a dense matmul.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import PreprocessConfig

_PRECISION_BITS = 32 - 8 - 2          # Pillow Resample.c PRECISION_BITS
_HALF = 1 << (_PRECISION_BITS - 1)    # rounding bias of the 8bpc passes


def center_crop_bounds(size: int, frac: float) -> Tuple[int, int]:
    """(start, stop) row/col bounds replicating torchvision CenterCrop with
    a FRACTIONAL size: crop_top = int(round((size - frac*size)/2)) and the
    PIL crop box rounds each coordinate half-to-even (Image._crop:
    map(int, map(round, box))) — so the stop bound is round(top + crop),
    NOT int(top + crop) (truncation loses a row whenever frac*size has a
    fractional part >= .5, e.g. 101 @ 0.7 -> 15:86, size 71)."""
    crop = frac * size
    top = int(round((size - crop) / 2.0))
    return top, int(round(top + crop))


@lru_cache(maxsize=64)
def pil_bilinear_coeffs(in_size: int, out_size: int
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Pillow's precompute_coeffs + normalize_coeffs_8bpc for the BILINEAR
    (triangle, support=1) filter, one output axis.

    Returns (xmin (out,) int32, coeffs (out, ksize) int32) where
    out[o] = clip8(sum_k in[xmin[o]+k] * coeffs[o, k] + 1<<21 >> 22) —
    the exact integer arithmetic Pillow applies to uint8 images.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale       # bilinear filter support = 1.0
    ksize = int(np.ceil(support)) * 2 + 1
    xmins = np.zeros(out_size, np.int32)
    kk = np.zeros((out_size, ksize), np.int32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)
        xmin = max(xmin, 0)
        xmax = int(center + support + 0.5)
        xmax = min(xmax, in_size) - xmin
        ss = 1.0 / filterscale
        w = np.zeros(ksize, np.float64)
        for x in range(xmax):
            arg = (x + xmin - center + 0.5) * ss
            w[x] = max(0.0, 1.0 - abs(arg))   # triangle filter
        total = w[:xmax].sum()
        if total != 0.0:
            w[:xmax] /= total
        # fixed-point quantization (normalize_coeffs_8bpc)
        q = np.where(w < 0, (w * (1 << _PRECISION_BITS) - 0.5),
                     (w * (1 << _PRECISION_BITS) + 0.5)).astype(np.int64)
        kk[xx] = q.astype(np.int32)
        xmins[xx] = xmin
    return xmins, kk


def _resample_axis_8bpc(x: jnp.ndarray, axis: int, out_size: int
                        ) -> jnp.ndarray:
    """One fixed-point resample pass over `axis` of a uint8 array —
    bit-exact with ImagingResampleHorizontal_8bpc.  Output is uint8."""
    in_size = x.shape[axis]
    xmins, kk = pil_bilinear_coeffs(in_size, out_size)
    ksize = kk.shape[1]
    acc = jnp.full(x.shape[:axis] + (out_size,) + x.shape[axis + 1:],
                   _HALF, jnp.int32)
    idx_base = jnp.asarray(xmins)
    for k in range(ksize):
        idx = jnp.clip(idx_base + k, 0, in_size - 1)
        taps = jnp.take(x, idx, axis=axis).astype(jnp.int32)
        wshape = [1] * x.ndim
        wshape[axis] = out_size
        acc = acc + taps * jnp.asarray(kk[:, k]).reshape(wshape)
    # clip8: >> PRECISION_BITS, clamp to [0, 255] (negative sums impossible
    # for the non-negative bilinear coefficients)
    return jnp.clip(acc >> _PRECISION_BITS, 0, 255).astype(jnp.uint8)


def resize_pil_exact(frames_u8: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """(..., H, W, C) uint8 -> (..., out, out, C) uint8, bit-exact with
    `PIL.Image.resize((out, out), Image.BILINEAR)` (horizontal pass first,
    uint8 intermediate, like ImagingResample)."""
    x = _resample_axis_8bpc(frames_u8, frames_u8.ndim - 2, out_size)
    return _resample_axis_8bpc(x, frames_u8.ndim - 3, out_size)


def preprocess_batch(frames: jnp.ndarray, cfg: PreprocessConfig,
                     dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """(B, H, W, 3) uint8 RGB -> (B, resize, resize, 3) normalized.

    Jit-traceable; crop bounds and resample coefficients are static per
    input shape.  The crop/resize stage reproduces the reference's PIL
    transform stack bit-for-bit (extract_representations.py:158-162), so
    the throughput path needs no host-PIL detour for parity.
    """
    b, h, w, c = frames.shape
    r0, r1 = center_crop_bounds(h, cfg.crop_height_frac)
    c0, c1 = center_crop_bounds(w, cfg.crop_width_frac)
    x = resize_pil_exact(frames[:, r0:r1, c0:c1, :], cfg.resize)
    x = x.astype(jnp.float32) / 255.0
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def normalize_batch(frames: jnp.ndarray, cfg: PreprocessConfig,
                    dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Normalize-only path for frames already cropped/resized on the host
    (native frame_pump loader): (B, S, S, 3) uint8 -> normalized."""
    x = frames.astype(jnp.float32) / 255.0
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def preprocess_reference_host(frames_u8: np.ndarray,
                              cfg: PreprocessConfig) -> np.ndarray:
    """Bit-faithful host path through PIL, for parity validation against the
    reference's torchvision transform stack."""
    from PIL import Image

    out = []
    for frame in frames_u8:
        img = Image.fromarray(frame)
        w, h = img.size
        r0, r1 = center_crop_bounds(h, cfg.crop_height_frac)
        c0, c1 = center_crop_bounds(w, cfg.crop_width_frac)
        img = img.crop((c0, r0, c1, r1))
        img = img.resize((cfg.resize, cfg.resize), Image.BILINEAR)
        x = np.asarray(img, dtype=np.float32) / 255.0
        x = (x - np.asarray(cfg.mean)) / np.asarray(cfg.std)
        out.append(x)
    return np.stack(out).astype(np.float32)
