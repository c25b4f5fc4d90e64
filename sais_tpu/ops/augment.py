"""Device-side DINO multi-crop augmentation.

TPU-native rebuild of DataAugmentationDINO (dino-main/main_dino.py:637-682),
which the reference runs per-sample on CPU workers through PIL/torchvision.
Here the whole batch is augmented on device inside the jit'd step: random
resized crops (area scale + aspect jitter, bicubic), horizontal flip,
color jitter (brightness 0.4 / contrast 0.4 / saturation 0.2 / hue 0.1,
p=0.8, per-op clamp + random op order like torchvision), random
grayscale (p=0.2), Gaussian blur (sigma ~ U[0.1, 2]),
prefiltered bilinear crops (see _random_resized_crop),
solarization (p=0.2 on the second global crop), ImageNet normalization.

Augmentations are stochastic; parity with the torchvision stack is
distributional rather than bitwise (the reference's RNG is not
reproducible across frameworks anyway).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class CropSpec:
    size: int
    scale: Tuple[float, float]
    blur_p: float
    solarize_p: float = 0.0


GLOBAL_1 = CropSpec(224, (0.4, 1.0), blur_p=1.0)
GLOBAL_2 = CropSpec(224, (0.4, 1.0), blur_p=0.1, solarize_p=0.2)
LOCAL = CropSpec(96, (0.05, 0.4), blur_p=0.5)


def _rgb_to_gray(x):
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    g = jnp.sum(x * w, axis=-1, keepdims=True)
    return jnp.broadcast_to(g, x.shape)


def _adjust_hue(x, delta):
    """Approximate hue rotation in YIQ space (delta in turns, [-0.1, 0.1])."""
    theta = delta * 2 * jnp.pi
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    t_yiq = jnp.asarray([[0.299, 0.587, 0.114],
                         [0.596, -0.274, -0.322],
                         [0.211, -0.523, 0.312]], x.dtype)
    t_rgb = jnp.asarray([[1.0, 0.956, 0.621],
                         [1.0, -0.272, -0.647],
                         [1.0, -1.106, 1.703]], x.dtype)
    yiq = x @ t_yiq.T
    y = yiq[..., 0:1]
    i = yiq[..., 1:2] * cos - yiq[..., 2:3] * sin
    q = yiq[..., 1:2] * sin + yiq[..., 2:3] * cos
    return jnp.concatenate([y, i, q], -1) @ t_rgb.T


def _color_jitter(key, x):
    """brightness 0.4, contrast 0.4, saturation 0.2, hue 0.1 (uniform
    factor ranges like torchvision ColorJitter).  torchvision clamps to
    [0, 1] after EVERY op (each adjust_* blends then clamps, so e.g. the
    contrast grey-mean is computed from the clamped brightness output)
    and applies the four ops in a random permutation per call
    (ColorJitter.get_params' torch.randperm(4)) — both reproduced here."""
    import itertools

    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    b = jax.random.uniform(kb, (), minval=0.6, maxval=1.4)
    c = jax.random.uniform(kc, (), minval=0.6, maxval=1.4)
    s = jax.random.uniform(ks, (), minval=0.8, maxval=1.2)
    h = jax.random.uniform(kh, (), minval=-0.1, maxval=0.1)

    def brightness(x):
        return jnp.clip(x * b, 0.0, 1.0)

    def contrast(x):
        mean = jnp.mean(_rgb_to_gray(x), axis=(-3, -2, -1), keepdims=True)
        return jnp.clip((x - mean) * c + mean, 0.0, 1.0)

    def saturation(x):
        gray = _rgb_to_gray(x)
        return jnp.clip((x - gray) * s + gray, 0.0, 1.0)

    def hue(x):
        return jnp.clip(_adjust_hue(x, h), 0.0, 1.0)

    ops = (brightness, contrast, saturation, hue)

    def chain(perm):
        def run(x):
            for i in perm:
                x = ops[i](x)
            return x
        return run

    branches = [chain(p) for p in itertools.permutations(range(4))]
    return jax.lax.switch(jax.random.randint(kp, (), 0, len(branches)),
                          branches, x)


def _gaussian_blur(key, x, size):
    """Separable depthwise Gaussian with sigma ~ U[0.1, 2] (reference
    GaussianBlur radius range, dino-main/utils.py GaussianBlur)."""
    del size
    sigma = jax.random.uniform(key, (), minval=0.1, maxval=2.0)
    r = 4
    t = jnp.arange(-r, r + 1, dtype=x.dtype)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    k = k / jnp.sum(k)
    img = x[None]                                   # (1, H, W, 3)

    def depthwise(img, kern):
        kern = jnp.broadcast_to(kern[..., None, None],
                                kern.shape + (1, 3))  # (kh, kw, 1, 3)
        return jax.lax.conv_general_dilated(
            img, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)

    img = jnp.pad(img, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    img = depthwise(img, k[:, None])
    img = jnp.pad(img, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    img = depthwise(img, k[None, :])
    return img[0]


def _random_resized_crop(key, img, out_size, scale):
    """Area-scale + aspect-jitter crop, bilinear resample (torchvision
    RandomResizedCrop geometry with log-uniform aspect in [3/4, 4/3]).

    Antialiasing: large sources are first box-downsampled by a STATIC
    integer factor chosen so the worst-case crop->output downscale stays
    <= ~2x — the 2-tap bilinear gather alone would alias badly when a
    1080p-scale crop shrinks to 224 (PIL's resize low-passes adaptively;
    a box prefilter + bilinear is the static-shape equivalent)."""
    h, w, _ = img.shape
    # worst-case crop dimension: cw <= sqrt(h*w*scale_max*ratio_max) with
    # ratio_max = 4/3 (aspect jitter on non-square sources can exceed the
    # old min(h,w)*sqrt(scale_max) bound) — but the sampler also clamps
    # each crop dim to the image bounds, so cap at max(h, w)
    worst = min((h * w * float(scale[1]) * (4.0 / 3.0)) ** 0.5,
                float(max(h, w))) / (2.0 * out_size)
    f = max(1, int(-(-worst // 1)))   # ceil
    if f > 1:
        hh, ww = (h // f) * f, (w // f) * f
        img = img[:hh, :ww].reshape(hh // f, f, ww // f, f,
                                    img.shape[-1]).mean((1, 3))
        h, w = hh // f, ww // f
    ka, ks2, kx, ky = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(ka, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(ks2, (), minval=jnp.log(3 / 4),
                                   maxval=jnp.log(4 / 3))
    ratio = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(area * ratio), 8.0, float(w))
    ch = jnp.clip(jnp.sqrt(area / ratio), 8.0, float(h))
    x0 = jax.random.uniform(kx, ()) * (w - cw)
    y0 = jax.random.uniform(ky, ()) * (h - ch)
    # sample the crop on a fixed out_size x out_size grid (bilinear gather;
    # one fused gather instead of dynamic-slice + resize, jit-friendly
    # because all shapes are static)
    ys = y0 + (jnp.arange(out_size) + 0.5) * ch / out_size - 0.5
    xs = x0 + (jnp.arange(out_size) + 0.5) * cw / out_size - 0.5
    y0i = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0i = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    wy = jnp.clip(ys - y0i, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x0i, 0.0, 1.0)[None, :, None]
    g00 = img[y0i][:, x0i]
    g01 = img[y0i][:, x1i]
    g10 = img[y1i][:, x0i]
    g11 = img[y1i][:, x1i]
    return ((1 - wy) * ((1 - wx) * g00 + wx * g01) +
            wy * ((1 - wx) * g10 + wx * g11))


def augment_crop(key: jax.Array, img: jnp.ndarray, spec: CropSpec
                 ) -> jnp.ndarray:
    """One augmented crop of one image.  img: (H, W, 3) float in [0,1]."""
    k = jax.random.split(key, 8)
    x = _random_resized_crop(k[0], img, spec.size, spec.scale)
    flip = jax.random.bernoulli(k[1], 0.5)
    x = jnp.where(flip, x[:, ::-1, :], x)
    do_jitter = jax.random.bernoulli(k[2], 0.8)
    x = jnp.where(do_jitter, _color_jitter(k[3], x), x)
    do_gray = jax.random.bernoulli(k[4], 0.2)
    x = jnp.where(do_gray, _rgb_to_gray(x), x)
    do_blur = jax.random.bernoulli(k[5], spec.blur_p)
    # sigma draws from its OWN key: sharing k[5] with the gate made the
    # conditional sigma distribution collapse to the bottom of [0.1, 2]
    # (blurred iff u<p ties sigma to small u)
    x = jnp.where(do_blur, _gaussian_blur(k[7], x, spec.size), x)
    if spec.solarize_p > 0:
        do_sol = jax.random.bernoulli(k[6], spec.solarize_p)
        x = jnp.where(do_sol, jnp.where(x >= 0.5, 1.0 - x, x), x)
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def multi_crop_batch(key: jax.Array, images: jnp.ndarray,
                     n_global: int = 2, n_local: int = 8,
                     global_size: int = 224, local_size: int = 96
                     ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B, H, W, 3) float [0,1] -> (n_global*B, gs, gs, 3) and
    (n_local*B, ls, ls, 3), IMAGE-major rows ([img0crop0, img0crop1,
    ...] — stack axis 1), the layout DINOTrainer.forward's
    reshape(nb, n)+transpose regrouping consumes."""
    import dataclasses as _dc

    b = images.shape[0]
    gspecs = [GLOBAL_1] + [GLOBAL_2] * (n_global - 1)
    gspecs = [_dc.replace(sp, size=global_size) for sp in gspecs]
    local_spec = _dc.replace(LOCAL, size=local_size)
    gcrops = []
    for ci, spec in enumerate(gspecs):
        keys = jax.random.split(jax.random.fold_in(key, ci), b)
        gcrops.append(jax.vmap(augment_crop, (0, 0, None))(keys, images, spec))
    globals_ = jnp.stack(gcrops, 1).reshape(n_global * b, global_size,
                                            global_size, 3)
    locals_ = None
    if n_local:
        lcrops = []
        for ci in range(n_local):
            keys = jax.random.split(jax.random.fold_in(key, 100 + ci), b)
            lcrops.append(jax.vmap(augment_crop, (0, 0, None))(keys, images,
                                                               local_spec))
        locals_ = jnp.stack(lcrops, 1).reshape(n_local * b, local_size,
                                               local_size, 3)
    return globals_, locals_


def center_border_crop(frames, height_frac: float = 0.8,
                       width_frac: float = 0.8, trim_right_px: int = 0):
    """SurgDataset border removal before augmentation (main_dino.py:300-326).

    CenterCrop((height_frac*H, width_frac*W)) — 0.8/0.8 by default,
    0.8/0.7 for the Gronau datasets (getCropDims, main_dino.py:320-325);
    trim_right_px additionally removes a right-hand strip (the VUA_Lab /
    VUA_AFB timer overlay, 130 px, main_dino.py:306-308).  Works on host
    numpy or device arrays, (B, H, W, C); box math shared with
    ops.preprocess.center_crop_bounds (float-size CenterCrop + PIL
    half-even box rounding).
    """
    from sais_tpu.ops.preprocess import center_crop_bounds
    h, w = frames.shape[1], frames.shape[2]
    # identical box math to the extraction path (the reference feeds the
    # SAME float-size CenterCrop in both places)
    top, bottom = center_crop_bounds(h, height_frac)
    left, right = center_crop_bounds(w, width_frac)
    out = frames[:, top:bottom, left:right]
    if trim_right_px:
        out = out[:, :, :max(out.shape[2] - trim_right_px, 1)]
    return out
