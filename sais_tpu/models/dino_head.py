"""DINO projection head (reference: dino-main/vision_transformer.py:257-291).

3-layer MLP (in -> 2048 -> 2048 -> bottleneck 256) with GELU, L2
normalization, then a weight-normalized linear to the prototype dimension
(65536 by default) whose per-row gain g is frozen at 1 when
norm_last_layer=True (the reference default for ViT-S) — i.e. the final
weight rows are unit-normalized at every step.

The non-default `--use_bn_in_head` variant (main_dino.py:70) inserts
BatchNorm1d after each hidden linear (Sequential indices 1 and 4,
vision_transformer.py:264-271): init with use_bn=True, thread a
`dino_head_bn_init` state through `dino_head_bottleneck(...,
bn_state=..., train=True)`.  Train mode normalizes with BATCH stats and
returns updated running stats (torch momentum 0.1, unbiased running
var); eval mode consumes the running stats.  Under a dp mesh the batch
means are computed by jnp.mean over the globally-sharded row axis inside
jit, which XLA turns into the cross-shard reduction — the reference's
nn.SyncBatchNorm (main_dino.py:402-403) for free.  BN scale/bias are
parameters (EMA'd to the teacher like the reference's `.parameters()`
loop); running stats are buffers (NOT EMA'd — each network's stats
evolve from its own forwards, matching main_dino.py:563-567).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


_BN_EPS = 1e-5        # torch BatchNorm1d defaults
_BN_MOMENTUM = 0.1


def _batch_norm(h, bn, state, train):
    """BatchNorm1d over rows.  Returns (normalized, new_state).

    Train mode: biased batch variance normalizes, UNBIASED variance
    feeds the running stat (torch semantics); jnp.mean over a
    mesh-sharded row axis is the cross-shard SyncBatchNorm reduction.
    Gradients flow through the batch stats like torch's."""
    h32 = h.astype(jnp.float32)
    if train:
        mean = jnp.mean(h32, axis=0)
        var = jnp.mean(jnp.square(h32 - mean), axis=0)
        n = h.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - _BN_MOMENTUM) * state["mean"] + _BN_MOMENTUM * mean,
            "var": (1 - _BN_MOMENTUM) * state["var"] + _BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    out = (h32 - mean) * jax.lax.rsqrt(var + _BN_EPS)
    out = out * bn["scale"].astype(jnp.float32) + bn["bias"].astype(
        jnp.float32)
    return out.astype(h.dtype), new_state


def dino_head_bottleneck(params: Params, x: jnp.ndarray, bn_state=None,
                         train: bool = True):
    """MLP (in -> hidden -> hidden -> bottleneck) + L2 row normalization —
    DINOHead.forward up to (but not including) the weight-normed last
    linear (vision_transformer.py:283-287).  Split out so the fused
    last-layer+loss kernel (kernels/dino_head_loss.py) can consume the
    normalized bottleneck directly.

    With a use_bn head (layers carry "bn"), pass bn_state
    (dino_head_bn_init) — the return becomes (h, new_bn_state)."""
    h = x
    n = len(params["mlp"])
    new_state = [] if bn_state is not None else None
    for i, layer in enumerate(params["mlp"]):
        h = jnp.dot(h, layer["w"].astype(h.dtype)) + layer["b"].astype(h.dtype)
        if "bn" in layer:
            if bn_state is None:
                raise ValueError(
                    "use_bn head needs bn_state (dino_head_bn_init)")
            h, st = _batch_norm(h, layer["bn"], bn_state[len(new_state)],
                                train)
            new_state.append(st)
        if i < n - 1:  # GELU between hidden layers, none after bottleneck
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(h.dtype)
    # F.normalize clamps the denominator (eps=1e-12): a collapsed row
    # yields zeros, not NaNs
    h = h / jnp.maximum(jnp.linalg.norm(h.astype(jnp.float32), axis=-1,
                                        keepdims=True), 1e-12)
    if bn_state is not None:
        return h, new_state
    return h


def dino_head_forward(params: Params, x: jnp.ndarray,
                      norm_last_layer: bool = True, bn_state=None,
                      train: bool = True):
    """x: (B, in_dim) -> (B, out_dim) prototype logits.  With a use_bn
    head pass bn_state; the return becomes (logits, new_bn_state)."""
    if bn_state is not None:
        h, new_state = dino_head_bottleneck(params, x, bn_state, train)
    else:
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
        out = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    else:
        out = jnp.dot(h.astype(jnp.float32), w)
    if bn_state is not None:
        return out, new_state
    return out


def dino_head_init(key: jax.Array, in_dim: int, out_dim: int,
                   hidden: int = 2048, bottleneck: int = 256,
                   use_bn: bool = False) -> Params:
    """trunc-normal(0.02) weights, zero bias, g=1 (reference init).
    use_bn adds BatchNorm1d scale/bias after each hidden linear
    (--use_bn_in_head, main_dino.py:70; torch init weight=1 bias=0)."""
    from sais_tpu.models.vit import _trunc_normal

    k1, k2, k3, k4 = jax.random.split(key, 4)

    def tn(k, fi, fo):
        # the reference trunc_normal_ bounds a=-2, b=2 are ABSOLUTE
        # (+/-100 sigma at std 0.02, effectively untruncated); truncating
        # at +/-2 SIGMA would shrink the effective std by ~12%
        return _trunc_normal(k, (fi, fo))

    mlp = [
        {"w": tn(k1, in_dim, hidden), "b": jnp.zeros((hidden,))},
        {"w": tn(k2, hidden, hidden), "b": jnp.zeros((hidden,))},
        {"w": tn(k3, hidden, bottleneck), "b": jnp.zeros((bottleneck,))},
    ]
    if use_bn:
        for layer in mlp[:2]:
            layer["bn"] = {"scale": jnp.ones((hidden,)),
                           "bias": jnp.zeros((hidden,))}
    return {
        "mlp": mlp,
        "last_v": tn(k4, bottleneck, out_dim),
        "last_g": jnp.ones((out_dim,)),
    }


def dino_head_bn_init(params: Params):
    """Fresh BatchNorm running stats (mean 0, var 1 — torch defaults),
    one entry per "bn"-carrying layer in layer order, shapes DERIVED from
    the head params so a non-default hidden size can never produce a
    mismatched state."""
    return [{"mean": jnp.zeros_like(layer["bn"]["scale"]),
             "var": jnp.ones_like(layer["bn"]["scale"])}
            for layer in params["mlp"] if "bn" in layer]


def dino_head_params_from_torch(sd: Mapping[str, Any],
                                prefix: str = "") -> Params:
    """torch DINOHead state_dict -> pytree.  Keys: mlp.0/2/4.{weight,bias},
    last_layer.weight_g (out,1), last_layer.weight_v (out, bottleneck).
    A use_bn head shifts the linears to Sequential indices 0/3/6 with
    BatchNorm1d at 1/4 (vision_transformer.py:264-271) — detected by the
    running_mean buffer key; BN running stats come via
    dino_head_bn_state_from_torch."""

    def _np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    use_bn = f"{prefix}mlp.1.running_mean" in sd
    mlp = []
    for j, i in enumerate((0, 3, 6) if use_bn else (0, 2, 4)):
        layer = {"w": jnp.asarray(_np(sd[f"{prefix}mlp.{i}.weight"]).T),
                 "b": jnp.asarray(_np(sd[f"{prefix}mlp.{i}.bias"]))}
        if use_bn and j < 2:
            bi = i + 1
            layer["bn"] = {
                "scale": jnp.asarray(_np(sd[f"{prefix}mlp.{bi}.weight"])),
                "bias": jnp.asarray(_np(sd[f"{prefix}mlp.{bi}.bias"])),
            }
        mlp.append(layer)
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


def dino_head_bn_state_from_torch(sd: Mapping[str, Any],
                                  prefix: str = ""):
    """Running-stat buffers of a use_bn torch DINOHead (mlp.1 / mlp.4
    BatchNorm1d running_mean/running_var), in layer order.

    Copies explicitly: torch's .numpy() shares memory with the live
    buffer and jnp.asarray can be zero-copy on CPU, so without the copy
    a later torch train-mode forward would silently mutate the ported
    state through the shared buffer."""

    def _np(x):
        return np.array(x.detach().cpu().numpy() if hasattr(x, "detach")
                        else x)

    out = []
    for i in (1, 4):
        k = f"{prefix}mlp.{i}.running_mean"
        if k in sd:
            out.append({
                "mean": jnp.asarray(_np(sd[k])),
                "var": jnp.asarray(_np(sd[f"{prefix}mlp.{i}.running_var"])),
            })
    return out
