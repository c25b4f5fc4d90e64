"""Device-side frame preprocessing: center-crop, resize, normalize.

Reference pipeline (SurgDataset.__getitem__, main_dino.py:300-326 +
prepare-transform, extract_representations.py:145-162): PIL center-crop to
0.8H x 0.8W, bilinear resize to 224x224, /255, ImageNet mean/std.  Here the
whole batch is processed on-device in one fused XLA program; uint8 frames
travel over PCIe and everything else stays on chip.

Crop arithmetic matches torchvision's center_crop rounding
(top = round((H - 0.8H)/2), box edges truncated like PIL Image.crop).
jax.image.resize(..., 'bilinear', antialias=True) matches PIL's antialiased
BILINEAR filter to ~1e-2/255 per pixel; tests pin the tolerance.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import PreprocessConfig


def center_crop_bounds(size: int, frac: float) -> Tuple[int, int]:
    """(start, stop) row/col bounds replicating torchvision CenterCrop with a
    fractional size followed by PIL crop-box truncation."""
    crop = frac * size
    top = int(round((size - crop) / 2.0))
    return top, int(top + crop)


def preprocess_batch(frames: jnp.ndarray, cfg: PreprocessConfig,
                     dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """(B, H, W, 3) uint8 RGB -> (B, resize, resize, 3) normalized.

    Jit-traceable; crop bounds are static per input shape.
    """
    b, h, w, c = frames.shape
    r0, r1 = center_crop_bounds(h, cfg.crop_height_frac)
    c0, c1 = center_crop_bounds(w, cfg.crop_width_frac)
    x = frames[:, r0:r1, c0:c1, :].astype(jnp.float32)
    x = jax.image.resize(x, (b, cfg.resize, cfg.resize, c), method="bilinear",
                         antialias=True)
    x = x / 255.0
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
