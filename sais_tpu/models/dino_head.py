"""DINO projection head (reference: dino-main/vision_transformer.py:257-291).

3-layer MLP (in -> 2048 -> 2048 -> bottleneck 256) with GELU, L2
normalization, then a weight-normalized linear to the prototype dimension
(65536 by default) whose per-row gain g is frozen at 1 when
norm_last_layer=True (the reference default for ViT-S) — i.e. the final
weight rows are unit-normalized at every step.

The vendored tool's non-default `--use_bn_in_head` (BatchNorm between
MLP layers, main_dino.py:70) is intentionally not implemented: SAIS's
published checkpoints and the ViT recipes all use the BN-free head.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def dino_head_bottleneck(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """MLP (in -> hidden -> hidden -> bottleneck) + L2 row normalization —
    DINOHead.forward up to (but not including) the weight-normed last
    linear (vision_transformer.py:283-287).  Split out so the fused
    last-layer+loss kernel (kernels/dino_head_loss.py) can consume the
    normalized bottleneck directly."""
    h = x
    n = len(params["mlp"])
    for i, layer in enumerate(params["mlp"]):
        h = jnp.dot(h, layer["w"].astype(h.dtype)) + layer["b"].astype(h.dtype)
        if i < n - 1:  # GELU between hidden layers, none after bottleneck
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(h.dtype)
    # F.normalize clamps the denominator (eps=1e-12): a collapsed row
    # yields zeros, not NaNs
    return h / jnp.maximum(jnp.linalg.norm(h.astype(jnp.float32), axis=-1,
                                           keepdims=True), 1e-12)


def dino_head_forward(params: Params, x: jnp.ndarray,
                      norm_last_layer: bool = True) -> jnp.ndarray:
    """x: (B, in_dim) -> (B, out_dim) prototype logits."""
    h = dino_head_bottleneck(params, x)
    v = params["last_v"]            # (bottleneck, out) column-per-prototype
    g = params["last_g"]            # (out,)
    w = v / jnp.linalg.norm(v, axis=0, keepdims=True)
    if not norm_last_layer:
        w = w * g[None, :]
    if x.dtype == jnp.bfloat16:
        # the head runs at the pipeline's precision: under the reference's
        # fp16 autocast the weight-normed last linear ALSO runs at reduced
        # precision (main_dino.py:543 autocast covers the whole forward).
        # With bf16 input the MLP matmuls above likewise ran in bf16 (they
        # use h.dtype) — the whole head is at the input's precision, with
        # the weight NORMALIZATION and accumulation kept in f32.
        # Parameter-grad rounding ~2e-3 rel (bf16 mantissa); at step level
        # this is precision parity, not a speedup (PERFORMANCE.md item 6).
        return jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(h.astype(jnp.float32), w)


def dino_head_init(key: jax.Array, in_dim: int, out_dim: int,
                   hidden: int = 2048, bottleneck: int = 256) -> Params:
    """trunc-normal(0.02) weights, zero bias, g=1 (reference init)."""
    from sais_tpu.models.vit import _trunc_normal

    k1, k2, k3, k4 = jax.random.split(key, 4)

    def tn(k, fi, fo):
        # the reference trunc_normal_ bounds a=-2, b=2 are ABSOLUTE
        # (+/-100 sigma at std 0.02, effectively untruncated); truncating
        # at +/-2 SIGMA would shrink the effective std by ~12%
        return _trunc_normal(k, (fi, fo))

    return {
        "mlp": [
            {"w": tn(k1, in_dim, hidden), "b": jnp.zeros((hidden,))},
            {"w": tn(k2, hidden, hidden), "b": jnp.zeros((hidden,))},
            {"w": tn(k3, hidden, bottleneck), "b": jnp.zeros((bottleneck,))},
        ],
        "last_v": tn(k4, bottleneck, out_dim),
        "last_g": jnp.ones((out_dim,)),
    }


def dino_head_params_from_torch(sd: Mapping[str, Any],
                                prefix: str = "") -> Params:
    """torch DINOHead state_dict -> pytree.  Keys: mlp.0/2/4.{weight,bias},
    last_layer.weight_g (out,1), last_layer.weight_v (out, bottleneck)."""

    def _np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    mlp = []
    for i in (0, 2, 4):
        mlp.append({"w": jnp.asarray(_np(sd[f"{prefix}mlp.{i}.weight"]).T),
                    "b": jnp.asarray(_np(sd[f"{prefix}mlp.{i}.bias"]))})
    g_key = (f"{prefix}last_layer.weight_g"
             if f"{prefix}last_layer.weight_g" in sd
             else f"{prefix}last_layer.parametrizations.weight.original0")
    v_key = (f"{prefix}last_layer.weight_v"
             if f"{prefix}last_layer.weight_v" in sd
             else f"{prefix}last_layer.parametrizations.weight.original1")
    return {
        "mlp": mlp,
        "last_v": jnp.asarray(_np(sd[v_key]).T),           # (bottleneck, out)
        "last_g": jnp.asarray(_np(sd[g_key]).reshape(-1)),
    }
