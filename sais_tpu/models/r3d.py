"""R3D-18 video encoder — JAX implementation of torchvision's r3d_18.

The reference's raw-video path uses torchvision r3d_18 with the classifier
head stripped, yielding 512-d snippet representations
(prepare_model.py:35-37), normalized with Kinetics statistics
(prepare_dataset.py:2746-2747).  Architecture: (3,7,7) stem conv (stride
1,2,2), four 2-block BasicBlock stages at 64/128/256/512 channels with
spatiotemporal stride 2 from stage 2 on, BatchNorm+ReLU, global avg pool.

Layout is NDHWC (TPU-friendly channels-last); the converter consumes
torchvision's state_dict naming (stem.0/1, layerX.Y.conv{1,2}.{0,1},
layerX.0.downsample.{0,1}).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_DN3 = ("NDHWC", "DHWIO", "NDHWC")

KINETICS_MEAN = (0.43216, 0.394666, 0.37645)
KINETICS_STD = (0.22803, 0.22145, 0.216989)


def _conv3(x, p, stride):
    kd, kh, kw = p["w"].shape[0], p["w"].shape[1], p["w"].shape[2]
    pad = ((kd // 2, kd // 2), (kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype), stride,
                                        pad, dimension_numbers=_DN3)


def _bn(x, p, eps=1e-5):
    scale = (p["w"] * jax.lax.rsqrt(p["rv"] + eps)).astype(x.dtype)
    bias = (p["b"] - p["rm"] * p["w"] *
            jax.lax.rsqrt(p["rv"] + eps)).astype(x.dtype)
    return x * scale + bias


def _block(x, p, stride):
    y = jax.nn.relu(_bn(_conv3(x, p["conv1"], stride), p["bn1"]))
    y = _bn(_conv3(y, p["conv2"], (1, 1, 1)), p["bn2"])
    if "down" in p:
        x = _bn(_conv3(x, p["down"], stride), p["down_bn"])
    return jax.nn.relu(x + y)


def r3d18_features(params: Params, clips: jnp.ndarray,
                   compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """clips: (B, T, H, W, 3) normalized -> (B, 512) pooled features
    (torchvision r3d_18 minus fc, prepare_model.py:36-37)."""
    x = clips.astype(compute_dtype)
    x = jax.nn.relu(_bn(_conv3(x, params["stem"], (1, 2, 2)),
                        params["stem_bn"]))
    for si, stage in enumerate(params["layers"]):
        stride = (1, 1, 1) if si == 0 else (2, 2, 2)
        x = _block(x, stage[0], stride)
        x = _block(x, stage[1], (1, 1, 1))
    return jnp.mean(x, axis=(1, 2, 3)).astype(jnp.float32)


def r3d18_params_from_torch(sd: Mapping[str, Any]) -> Params:
    """torchvision r3d_18 state_dict -> pytree (fc ignored)."""

    def _np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    def conv(prefix):
        # torch Conv3d weight (O, I, D, H, W) -> (D, H, W, I, O)
        return {"w": jnp.asarray(_np(sd[prefix + ".weight"])
                                 .transpose(2, 3, 4, 1, 0))}

    def bn(prefix):
        return {"w": jnp.asarray(_np(sd[prefix + ".weight"])),
                "b": jnp.asarray(_np(sd[prefix + ".bias"])),
                "rm": jnp.asarray(_np(sd[prefix + ".running_mean"])),
                "rv": jnp.asarray(_np(sd[prefix + ".running_var"]))}

    layers = []
    for li in range(1, 5):
        blocks = []
        for bi in range(2):
            p = f"layer{li}.{bi}"
            blk = {"conv1": conv(p + ".conv1.0"), "bn1": bn(p + ".conv1.1"),
                   "conv2": conv(p + ".conv2.0"), "bn2": bn(p + ".conv2.1")}
            if f"{p}.downsample.0.weight" in sd:
                blk["down"] = conv(p + ".downsample.0")
                blk["down_bn"] = bn(p + ".downsample.1")
            blocks.append(blk)
        layers.append(blocks)
    return {"stem": conv("stem.0"), "stem_bn": bn("stem.1"),
            "layers": layers}


def r3d18_init(key: jax.Array) -> Params:
    """Random init with torchvision shapes (kaiming-ish fan-in)."""
    ks = list(jax.random.split(key, 64))

    def conv(cin, cout, kd, kh, kw):
        fan = cin * kd * kh * kw
        return {"w": jax.random.normal(ks.pop(), (kd, kh, kw, cin, cout))
                * (2.0 / fan) ** 0.5}

    def bn(c):
        return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
                "rm": jnp.zeros((c,)), "rv": jnp.ones((c,))}

    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    layers = []
    for si, (cin, cout) in enumerate(chans):
        blocks = []
        for bi in range(2):
            bi_in = cin if bi == 0 else cout
            blk = {"conv1": conv(bi_in, cout, 3, 3, 3), "bn1": bn(cout),
                   "conv2": conv(cout, cout, 3, 3, 3), "bn2": bn(cout)}
            if bi == 0 and (si > 0):
                blk["down"] = conv(bi_in, cout, 1, 1, 1)
                blk["down_bn"] = bn(cout)
            blocks.append(blk)
        layers.append(blocks)
    return {"stem": conv(3, 64, 3, 7, 7), "stem_bn": bn(64),
            "layers": layers}


def normalize_clips(clips_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B, T, H, W, 3) -> Kinetics-normalized float
    (normalizeSnippets, prepare_dataset.py:2746-2752)."""
    x = clips_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(KINETICS_MEAN)) / jnp.asarray(KINETICS_STD)
