"""Temporal transformer encoder — TPU-native replacement for the reference's
hand-patched torch.nn.TransformerEncoder.

The reference builds two 4-layer/4-head encoders at d_model=rep_dim
(prepare_model.py:74-81) and monkey-patches torch 1.8's transformer module so
every layer returns its attention weights and the encoder returns the LAST
layer's weights (README.md:43-48).  Those weights are nn.MultiheadAttention's
post-softmax attention AVERAGED OVER HEADS, shape (batch, L, S) — that is the
attention map SAIS exports for frame-importance attribution.

Semantics replicated exactly (verified against a torch golden):
- post-norm residual blocks: src = norm1(src + attn(src)); then
  src = norm2(src + ffn(src)) — torch TransformerEncoderLayer default;
- ReLU feed-forward of width 2048, LayerNorm eps 1e-5 (torch defaults);
- q scaled by head_dim**-0.5 before the score matmul;
- key_padding_mask: True entries are masked to -inf before softmax.

TPU-first differences: batch-major layout (torch is seq-major), params as a
pytree, float32 softmax/layernorm with optional bf16 matmuls, and a single
fused forward that also emits the attention map without a second pass.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sais_tpu.config import TemporalConfig

Params = Dict[str, Any]

_NEG_INF = -1e30


from sais_tpu.models.vit import _layer_norm  # shared f32 layernorm


def multihead_attention(x: jnp.ndarray, p: Params, num_heads: int,
                        key_padding_mask: Optional[jnp.ndarray]
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Self-attention matching torch nn.MultiheadAttention eval semantics.

    x: (B, L, D); key_padding_mask: (B, L) bool, True = pad (ignore as key).
    Returns (out (B, L, D), head-averaged weights (B, L, L)).
    """
    b, l, d = x.shape
    h = num_heads
    dh = d // h
    qkv = jnp.dot(x, p["in_w"].astype(x.dtype),
                  preferred_element_type=x.dtype) + p["in_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, h, dh).transpose(0, 2, 1, 3) * (dh ** -0.5)
    k = k.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhld,bhmd->bhlm", q, k,
                        preferred_element_type=jnp.float32)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], _NEG_INF, logits)
    weights = jax.nn.softmax(logits, axis=-1)          # (B, h, L, L) f32
    out = jnp.einsum("bhlm,bhmd->bhld", weights.astype(x.dtype), v,
                     preferred_element_type=x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
    out = jnp.dot(out, p["out_w"].astype(x.dtype),
                  preferred_element_type=x.dtype) + p["out_b"].astype(x.dtype)
    return out, jnp.mean(weights, axis=1)


def multihead_attention_flash(x: jnp.ndarray, p: Params, num_heads: int,
                              key_padding_mask: Optional[jnp.ndarray],
                              want_cls_row: bool = False,
                              interpret: bool = False
                              ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Same math as `multihead_attention` but through the fused Pallas
    flash kernel — no (L, L) weight materialization.  Returns the CLS-row
    head-averaged attention (B, L) instead of the full matrix when asked."""
    from sais_tpu.kernels.flash_attention import (cls_attention_row,
                                                  flash_attention)
    b, l, d = x.shape
    h = num_heads
    dh = d // h
    qkv = jnp.dot(x, p["in_w"].astype(x.dtype),
                  preferred_element_type=x.dtype) + p["in_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
    out = flash_attention(q, k, v, key_padding_mask, interpret=interpret)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
    out = jnp.dot(out, p["out_w"].astype(x.dtype),
                  preferred_element_type=x.dtype) + p["out_b"].astype(x.dtype)
    cls_row = (cls_attention_row(q, k, key_padding_mask)
               if want_cls_row else None)
    return out, cls_row


def encoder_layer(x: jnp.ndarray, p: Params, cfg: TemporalConfig,
                  key_padding_mask: Optional[jnp.ndarray],
                  use_flash: bool = False, want_cls_row: bool = False,
                  interpret: bool = False
                  ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Post-norm torch TransformerEncoderLayer (activation=relu)."""
    if use_flash:
        y, attn = multihead_attention_flash(x, p["mha"], cfg.num_heads,
                                            key_padding_mask, want_cls_row,
                                            interpret)
    else:
        y, attn = multihead_attention(x, p["mha"], cfg.num_heads,
                                      key_padding_mask)
    x = _layer_norm(x + y, p["ln1_s"], p["ln1_b"], cfg.layernorm_eps)
    h = jnp.dot(x, p["ff1_w"].astype(x.dtype),
                preferred_element_type=x.dtype) + p["ff1_b"].astype(x.dtype)
    h = jax.nn.relu(h)
    h = jnp.dot(h, p["ff2_w"].astype(x.dtype),
                preferred_element_type=x.dtype) + p["ff2_b"].astype(x.dtype)
    x = _layer_norm(x + h, p["ln2_s"], p["ln2_b"], cfg.layernorm_eps)
    return x, attn


def encoder_forward(params: Params, x: jnp.ndarray, cfg: TemporalConfig,
                    key_padding_mask: Optional[jnp.ndarray] = None,
                    use_flash: bool = False, interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stacked encoder; returns (output, last layer's head-averaged attn) —
    the patched-torch contract the reference relies on (README.md:43-48).

    With use_flash=True all layers run the fused Pallas kernel and the
    returned attention is the LAST layer's CLS row (B, L) — the quantity
    SAIS exports — instead of the full (B, L, L) matrix.
    """
    attn = None
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        x, attn = encoder_layer(x, layer, cfg, key_padding_mask,
                                use_flash=use_flash,
                                want_cls_row=use_flash and (i == n - 1),
                                interpret=interpret)
    return x, attn


def encoder_init(key: jax.Array, cfg: TemporalConfig) -> Params:
    """Init mirroring torch defaults: xavier-uniform MHA in_proj, kaiming-ish
    linear layers; zero biases for in_proj."""
    d, f = cfg.rep_dim, cfg.ffn_dim
    layers = []
    keys = jax.random.split(key, cfg.num_layers)
    for lk in keys:
        k1, k2, k3, k4 = jax.random.split(lk, 4)
        limit_in = (6.0 / (d + 3 * d)) ** 0.5
        layers.append({
            "mha": {
                "in_w": jax.random.uniform(k1, (d, 3 * d), minval=-limit_in,
                                           maxval=limit_in),
                "in_b": jnp.zeros((3 * d,)),
                "out_w": jax.random.uniform(k2, (d, d),
                                            minval=-(1 / d) ** 0.5,
                                            maxval=(1 / d) ** 0.5),
                "out_b": jnp.zeros((d,)),
            },
            "ff1_w": jax.random.uniform(k3, (d, f), minval=-(1 / d) ** 0.5,
                                        maxval=(1 / d) ** 0.5),
            "ff1_b": jnp.zeros((f,)),
            "ff2_w": jax.random.uniform(k4, (f, d), minval=-(1 / f) ** 0.5,
                                        maxval=(1 / f) ** 0.5),
            "ff2_b": jnp.zeros((d,)),
            "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
            "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        })
    return {"layers": layers}
