"""DINO Vision Transformer (ViT-S/16) — TPU-native JAX implementation.

Functional re-design of the spatial encoder used by the reference for
per-frame feature extraction (reference: dino-main/vision_transformer.py:
PatchEmbed :116-131, Attention :68-92, Block :95-113, VisionTransformer
:134-233, vit_small :243-247).  Differences from the PyTorch original are
deliberate and TPU-first:

- parameters are a plain pytree (nested dict), so the whole model jits,
  shards with jax.sharding, and donates cleanly;
- the strided conv patch embedding is expressed as patch-reshape + matmul,
  which maps directly onto the MXU instead of relying on conv lowering;
- compute dtype is a parameter (bfloat16 on TPU); layernorm/softmax run in
  float32 for stability;
- attention of the last block is returned on demand (reference
  `get_last_selfattention`, vision_transformer.py:216-223) without a second
  forward pass.

Weight parity with the reference checkpoints is provided by
`sais_tpu.port.torch_port.vit_params_from_torch`, tested against a golden
functional PyTorch implementation to <=1e-5.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sais_tpu.config import ViTConfig

Params = Dict[str, Any]


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in float32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def _linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/p * W/p, p*p*C) with (kh, kw, c) pixel order.

    The pixel order inside each patch is chosen so a reshaped torch conv
    kernel (O, C, kh, kw) -> (kh, kw, C, O) multiplies to the identical
    result as the reference's strided Conv2d patch embedding.
    """
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, kh, kw, c)
    return x.reshape(b, gh * gw, patch * patch * c)


def attention(x: jnp.ndarray, p: Params, num_heads: int,
              return_weights: bool = False
              ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Pre-norm ViT attention (vision_transformer.py:80-92).

    x: (B, N, D).  Returns (out, attn) where attn is (B, heads, N, N)
    post-softmax weights (only materialized when requested).

    TPU notes: q/k/v stay in (B, N, h, dh) layout and the score einsum
    contracts directly from it (no materialized head transposes), and in
    bf16 the (B, h, N, N) score/weight tensors are stored in bf16 — halving
    the dominant HBM traffic of the layer (softmax math still runs in f32
    inside the fused reduction).  f32 inputs keep full-f32 scores, which is
    the torch-parity path.
    """
    b, n, d = x.shape
    h = num_heads
    dh = d // h
    qkv = _linear(x, p["qkv_w"], p.get("qkv_b"))  # (B, N, 3D)
    qkv = qkv.reshape(b, n, 3, h, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = dh ** -0.5
    score_dtype = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=score_dtype) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", weights.astype(x.dtype), v,
                     preferred_element_type=x.dtype)
    out = out.reshape(b, n, d)
    out = _linear(out, p["proj_w"], p["proj_b"])
    return out, (weights if return_weights else None)


def _mlp(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Transformer MLP with exact (erf) GELU, matching torch nn.GELU."""
    y = _linear(x, p["fc1_w"], p["fc1_b"])
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
    return _linear(y, p["fc2_w"], p["fc2_b"])


def drop_path_scales(rng: jax.Array, keep: float, b: int) -> jnp.ndarray:
    """Per-image survivor scales in {0, 1/keep}: floor(keep + U[0,1)) /
    keep, the reference's binarize (vision_transformer.py:27-35) —
    identical in distribution to a Bernoulli(keep) draw.  Always drawn in
    f32: a bf16 U[0,1) has only 128 distinct values, which quantizes the
    realized drop probability to multiples of 1/128 (up to ~15% off a
    linspace schedule) and biases the 1/keep scale; callers cast the
    RESULT to the compute dtype."""
    mask = jnp.floor(keep + jax.random.uniform(rng, (b,), jnp.float32))
    return mask / keep


def _drop_path(x: jnp.ndarray, prob: float, rng: jax.Array) -> jnp.ndarray:
    """Stochastic depth on one residual branch (vision_transformer.py:27-35):
    per-SAMPLE Bernoulli(1 - prob) mask, surviving branches scaled by
    1/keep_prob."""
    s = drop_path_scales(rng, 1.0 - prob, x.shape[0])
    return x * s.reshape((x.shape[0],) + (1,) * (x.ndim - 1)).astype(x.dtype)


def block(x: jnp.ndarray, p: Params, cfg: ViTConfig,
          return_weights: bool = False, drop_path_prob: float = 0.0,
          rng: Optional[jax.Array] = None
          ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Pre-norm transformer block (vision_transformer.py:95-113).

    drop_path_prob + rng enable training-time stochastic depth on both
    residual branches (independent draws, like the reference's two
    self.drop_path calls at :111-112)."""
    y, w = attention(_layer_norm(x, p["ln1_s"], p["ln1_b"], cfg.layernorm_eps),
                     p["attn"], cfg.num_heads, return_weights)
    if drop_path_prob > 0.0 and rng is not None:
        r1, r2 = jax.random.split(rng)
        x = x + _drop_path(y, drop_path_prob, r1)
        x = x + _drop_path(
            _mlp(_layer_norm(x, p["ln2_s"], p["ln2_b"], cfg.layernorm_eps),
                 p["mlp"]), drop_path_prob, r2)
        return x, w
    x = x + y
    x = x + _mlp(_layer_norm(x, p["ln2_s"], p["ln2_b"], cfg.layernorm_eps),
                 p["mlp"])
    return x, w


def _cubic_kernel(x: "np.ndarray", a: float = -0.75) -> "np.ndarray":
    """Cubic convolution kernel — torch's bicubic uses a = -0.75 (vs the
    Keys a = -0.5 of jax.image.resize)."""
    import numpy as np
    ax = np.abs(x)
    w = np.where(ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
                 np.where(ax < 2,
                          a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a,
                          0.0))
    return w


def _torch_bicubic_matrix(in_size: int, out_size: int, scale: float
                          ) -> "np.ndarray":
    """(out, in) interpolation matrix replicating F.interpolate(mode=
    'bicubic', align_corners=False) with an EXPLICIT scale_factor: the
    source coordinate is (i + 0.5) / scale - 0.5 using the GIVEN scale
    (this is why DINO's +0.1 fudge changes the result), 4 taps with the
    a=-0.75 kernel, border-clamped indices."""
    import numpy as np
    m = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        src = (i + 0.5) / scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        taps = np.arange(i0 - 1, i0 + 3)
        w = _cubic_kernel(taps - src)
        taps = np.clip(taps, 0, in_size - 1)
        for tp, wt in zip(taps, w):
            m[i, tp] += wt
    return m.astype(np.float32)


def interpolate_pos_embed(pos_embed: jnp.ndarray, npatch: int, gh: int,
                          gw: int) -> jnp.ndarray:
    """Bicubic pos-embedding interpolation for non-224 inputs
    (vision_transformer.py:174-194).  pos_embed: (1, N+1, D).

    Torch-exact: F.interpolate(mode='bicubic') semantics (a=-0.75 kernel,
    coordinate transform from the EXPLICIT scale factor) including DINO's
    (g + 0.1) / sqrt(N) fudge (issue #8) — precomputed as two static
    (out, in) weight matrices applied as matmuls, which is also the
    MXU-friendly formulation."""
    import numpy as np
    n = pos_embed.shape[1] - 1
    if npatch == n and gh == gw:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    dim = pos_embed.shape[-1]
    side = int(math.sqrt(n))
    grid = patch_pe.reshape(side, side, dim)
    mh = jnp.asarray(_torch_bicubic_matrix(side, gh, (gh + 0.1) / side))
    mw = jnp.asarray(_torch_bicubic_matrix(side, gw, (gw + 0.1) / side))
    out = jnp.einsum("oh,hwd->owd", mh.astype(jnp.float32),
                     grid.astype(jnp.float32))
    out = jnp.einsum("pw,hwd->hpd", mw.astype(jnp.float32), out)
    out = out.astype(pos_embed.dtype)
    return jnp.concatenate([cls_pe, out.reshape(1, gh * gw, dim)], axis=1)


def prepare_tokens(params: Params, images: jnp.ndarray,
                   cfg: ViTConfig) -> jnp.ndarray:
    """Patch-embed + CLS token + positional embedding
    (vision_transformer.py:196-207).  images: (B, H, W, C) normalized."""
    b, h, w, _ = images.shape
    patches = patchify(images, cfg.patch_size)
    x = _linear(patches, params["patch_embed"]["w"], params["patch_embed"]["b"])
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    pe = interpolate_pos_embed(params["pos_embed"], gh * gw, gh, gw)
    return x + pe.astype(x.dtype)


def _fused_geometry(b: int, l: int) -> Tuple[int, int]:
    """(Lp, imgs_per_program) for the fused path.

    Rows are the sublane dimension: padding to a multiple of 16 (bf16
    sublane tile) is enough — Lp=208 for L=197 wastes 5% of matmul rows
    vs 30% at the naive lane-multiple 256.  Batching 4 images per program
    feeds the MXU taller qkv/proj/MLP operands.  Measured on v5e
    (batch 1024): Lp 256/imgs 1 -> 11.2k f/s; Lp 208/imgs 4 -> 14.2k f/s.
    """
    lp = max(l + ((-l) % 16), 32)
    for imgs in (4, 2, 1):
        if b % imgs == 0 and imgs * lp <= 1024:
            return lp, imgs
    return lp, 1


def _vit_forward_fused(params: Params, images: jnp.ndarray,
                       cfg: ViTConfig, quant: Optional[str] = None
                       ) -> jnp.ndarray:
    """bf16 TPU fast path: every transformer block runs as one Pallas
    program over a small group of images (kernels/fused_mha.
    fused_vit_block) — only the (B, L, D) activations touch HBM between
    layers.  >2x the XLA path on v5e; within bf16 noise of it (~0.08 max
    on CLS features).

    quant='int8' additionally runs the qkv/proj/MLP matmuls W8A8 on the
    MXU's 2x int8 path (per-channel weight scales, per-token dynamic
    activation scales; attention stays bf16)."""
    from sais_tpu.kernels.fused_mha import (fused_vit_block,
                                            fused_vit_block_int8)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = prepare_tokens(params, images.astype(jnp.bfloat16), cfg)
    b, l, d = x.shape
    lp, imgs = _fused_geometry(b, l)
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    block = fused_vit_block_int8 if quant == "int8" else fused_vit_block
    zero_b = jnp.zeros((3 * d,), x.dtype)   # qkv_bias=False -> zero bias
    for p in params["blocks"]:
        x = block(
            x, p["attn"]["qkv_w"],
            p["attn"]["qkv_b"] if p["attn"].get("qkv_b") is not None
            else zero_b, p["attn"]["proj_w"],
            p["attn"]["proj_b"], p["mlp"]["fc1_w"], p["mlp"]["fc1_b"],
            p["mlp"]["fc2_w"], p["mlp"]["fc2_b"], p["ln1_s"], p["ln1_b"],
            p["ln2_s"], p["ln2_b"], num_heads=cfg.num_heads, valid_len=l,
            eps=cfg.layernorm_eps, imgs=imgs)
    x = _layer_norm(x[:, :l], params["ln_s"], params["ln_b"],
                    cfg.layernorm_eps)
    return x[:, 0].astype(jnp.float32)


def vit_features_trainable_fused(params: Params, images: jnp.ndarray,
                                 cfg: ViTConfig,
                                 interpret: bool = False,
                                 backward: str = "pallas",
                                 drop_path_rate: float = 0.0,
                                 rng: Optional[jax.Array] = None,
                                 packed=None) -> jnp.ndarray:
    """Differentiable fused path for training loops (DINO).

    backward='pallas' (default): forward AND backward run as VMEM-resident
    Pallas kernels (make_pallas_trainable_fused_block) — the backward
    streams activations once and accumulates f32 weight grads on chip.
    backward='xla': Pallas forward with an XLA-recompute backward (the
    round-1 fallback, kept for comparison).

    drop_path_rate + rng enable stochastic depth WITHOUT leaving the fused
    path: the per-image Bernoulli masks (linspace-decayed probabilities,
    two independent draws per block like vision_transformer.py:111-112)
    become per-row branch scales 0 or 1/keep fed to the scaled kernels.
    Requires backward='pallas'.

    packed: attention sub-group override for short sequences (None =
    auto, bool, or images per score matmul — see fused_mha._auto_packed;
    used by tools/packed_sub_sweep.py and fixed tests)."""
    from sais_tpu.kernels.fused_mha import (
        make_pallas_trainable_fused_block, make_trainable_fused_block)
    use_drop = drop_path_rate > 0.0 and rng is not None
    if use_drop and backward != "pallas":
        raise ValueError("drop_path on the fused path requires "
                         "backward='pallas'")
    if packed is not None and backward != "pallas":
        raise ValueError("the packed sub-group override requires "
                         "backward='pallas' (the XLA-backward block has "
                         "no packed attention path)")
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = prepare_tokens(params, images.astype(jnp.bfloat16), cfg)
    b, l, d = x.shape
    lp = max(l + ((-l) % 16), 32)
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    maker = (make_pallas_trainable_fused_block if backward == "pallas"
             else make_trainable_fused_block)
    if backward == "pallas":
        block_op = maker(cfg.num_heads, l, cfg.layernorm_eps,
                         interpret=interpret, scaled=use_drop,
                         packed=packed)
    else:
        block_op = maker(cfg.num_heads, l, cfg.layernorm_eps,
                         interpret=interpret)
    depth = len(params["blocks"])
    zero_b = jnp.zeros((3 * d,), x.dtype)   # qkv_bias=False -> zero bias
    if use_drop:
        dpr = [drop_path_rate * i / max(depth - 1, 1) for i in range(depth)]
        rngs = jax.random.split(rng, 2 * depth)
    for i, blk in enumerate(params["blocks"]):
        p = dict(blk, attn=(blk["attn"] if blk["attn"].get("qkv_b")
                            is not None
                            else dict(blk["attn"], qkv_b=zero_b)))
        if use_drop:
            keep1 = 1.0 - dpr[i]
            keep2 = 1.0 - dpr[i]
            def draw(key, keep):
                s = drop_path_scales(key, keep, b).astype(jnp.bfloat16)
                return jnp.broadcast_to(s[:, None, None], (b, lp, 1))
            s1 = draw(rngs[2 * i], keep1)
            s2 = draw(rngs[2 * i + 1], keep2)
            x = block_op(x, s1, s2, p["attn"]["qkv_w"], p["attn"]["qkv_b"],
                         p["attn"]["proj_w"], p["attn"]["proj_b"],
                         p["mlp"]["fc1_w"], p["mlp"]["fc1_b"],
                         p["mlp"]["fc2_w"], p["mlp"]["fc2_b"], p["ln1_s"],
                         p["ln1_b"], p["ln2_s"], p["ln2_b"])
            continue
        x = block_op(x, p["attn"]["qkv_w"], p["attn"]["qkv_b"],
                     p["attn"]["proj_w"], p["attn"]["proj_b"],
                     p["mlp"]["fc1_w"], p["mlp"]["fc1_b"],
                     p["mlp"]["fc2_w"], p["mlp"]["fc2_b"], p["ln1_s"],
                     p["ln1_b"], p["ln2_s"], p["ln2_b"])
    x = _layer_norm(x[:, :l], params["ln_s"], params["ln_b"],
                    cfg.layernorm_eps)
    return x[:, 0].astype(jnp.float32)


def vit_forward(params: Params, images: jnp.ndarray, cfg: ViTConfig,
                *, return_last_attention: bool = False,
                compute_dtype: jnp.dtype = jnp.float32,
                allow_fused: bool = False,
                quant: Optional[str] = None,
                drop_path_rate: float = 0.0,
                rng: Optional[jax.Array] = None
                ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Full ViT forward: returns (cls_features (B, D), last_attn or None).

    Equivalent to VisionTransformer.forward returning x[:, 0]
    (vision_transformer.py:209-214); with `return_last_attention` it also
    yields the final block's post-softmax weights (B, heads, N+1, N+1),
    the quantity exposed by get_last_selfattention (:216-223).

    With allow_fused=True, on TPU with bf16 compute (and no attention
    output requested) the whole network runs through fused per-image Pallas
    blocks.  Opt-in because the Pallas path defines no VJP — training
    (DINO) differentiates through the XLA path.

    drop_path_rate + rng enable training-time stochastic depth: per-block
    probabilities follow the linspace(0, rate, depth) decay rule of the
    reference (vision_transformer.py:150), XLA path only (the fused
    kernels compute whole residual blocks internally).
    """
    use_drop = drop_path_rate > 0.0 and rng is not None
    if (allow_fused and compute_dtype == jnp.bfloat16
            and not return_last_attention and not use_drop
            and jax.default_backend() == "tpu"):
        return _vit_forward_fused(params, images, cfg, quant=quant), None
    if quant is not None:
        # W8A8 only exists in the fused Pallas blocks; a caller asking for
        # it off that path would silently get plain XLA otherwise
        import warnings
        warnings.warn(
            f"quant={quant!r} ignored: the fused TPU path is not taken "
            "(requires allow_fused=True, bf16 compute, no attention output, "
            "TPU backend)", stacklevel=2)
    x = prepare_tokens(params, images.astype(compute_dtype), cfg)
    last_attn = None
    depth = len(params["blocks"])
    dpr = [drop_path_rate * i / max(depth - 1, 1) for i in range(depth)]
    rngs = jax.random.split(rng, depth) if use_drop else [None] * depth
    for i in range(depth):
        want = return_last_attention and (i == depth - 1)
        x, w = block(x, params["blocks"][i], cfg, return_weights=want,
                     drop_path_prob=dpr[i] if use_drop else 0.0,
                     rng=rngs[i])
        if want:
            last_attn = w
    x = _layer_norm(x, params["ln_s"], params["ln_b"], cfg.layernorm_eps)
    return x[:, 0].astype(jnp.float32), last_attn


def vit_tokens(params: Params, images: jnp.ndarray, cfg: ViTConfig,
               compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Full normalized token sequence (B, 1+N, D) — the quantity
    `get_intermediate_layers(x, n=1)[0]` exposes
    (vision_transformer.py:225-233), consumed by the copy-detection /
    retrieval / video-segmentation evals."""
    return vit_intermediate_layers(params, images, cfg, n=1,
                                   compute_dtype=compute_dtype)[-1]


def vit_intermediate_layers(params: Params, images: jnp.ndarray,
                            cfg: ViTConfig, n: int = 1,
                            compute_dtype: jnp.dtype = jnp.float32
                            ) -> list:
    """Token sequences of the n LAST blocks, each passed through the FINAL
    LayerNorm — exactly `get_intermediate_layers(x, n)`
    (vision_transformer.py:224-232: `self.norm(x)` applied to every
    collected block output).  Returns a list of n (B, 1+N, D) f32 arrays,
    earliest block first.  This is the feature source for the reference
    linear-probe protocol (eval_linear.py:166-170)."""
    x = prepare_tokens(params, images.astype(compute_dtype), cfg)
    depth = len(params["blocks"])
    out = []
    for i, p in enumerate(params["blocks"]):
        x, _ = block(x, p, cfg)
        if depth - i <= n:
            out.append(_layer_norm(x, params["ln_s"], params["ln_b"],
                                   cfg.layernorm_eps).astype(jnp.float32))
    return out


def vit_features(params: Params, images: jnp.ndarray, cfg: ViTConfig,
                 compute_dtype: jnp.dtype = jnp.float32,
                 allow_fused: bool = False,
                 quant: Optional[str] = None,
                 drop_path_rate: float = 0.0,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """CLS feature extraction — the hot loop of the reference pipeline
    (extract_representations.py:351-378, batch 1024).  Inference callers
    pass allow_fused=True for the Pallas fast path (2x on v5e); quant='int8'
    additionally runs the block matmuls W8A8 (opt-in throughput mode).
    Training callers pass drop_path_rate + rng for stochastic depth."""
    return vit_forward(params, images, cfg, compute_dtype=compute_dtype,
                       allow_fused=allow_fused, quant=quant,
                       drop_path_rate=drop_path_rate, rng=rng)[0]


def _trunc_normal(key: jax.Array, shape: Tuple[int, ...],
                  std: float = 0.02) -> jnp.ndarray:
    """Truncated normal matching dino-main/utils.py trunc_normal_: the
    reference bounds a=-2, b=2 are ABSOLUTE, i.e. +/-(2/std) sigmas — at
    std=0.02 effectively untruncated (truncating at +/-2 sigma instead
    shrinks the effective std by ~12%)."""
    lim = 2.0 / std
    return std * jax.random.truncated_normal(key, -lim, lim, shape,
                                             jnp.float32)


def vit_init(key: jax.Array, cfg: ViTConfig) -> Params:
    """Random initialization mirroring the reference scheme
    (vision_transformer.py:161-172): trunc-normal(0.02) linear weights and
    pos/cls embeddings, zero biases, unit layernorm."""
    keys = iter(jax.random.split(key, 6 + 8 * cfg.depth))
    d, md = cfg.embed_dim, cfg.mlp_dim
    pdim = cfg.patch_size * cfg.patch_size * cfg.in_channels

    def lin(kw, fan_in, fan_out):
        return _trunc_normal(kw, (fan_in, fan_out))

    blocks = []
    for _ in range(cfg.depth):
        blocks.append({
            "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
            "attn": {
                "qkv_w": lin(next(keys), d, 3 * d),
                "qkv_b": jnp.zeros((3 * d,)) if cfg.qkv_bias else None,
                "proj_w": lin(next(keys), d, d),
                "proj_b": jnp.zeros((d,)),
            },
            "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
            "mlp": {
                "fc1_w": lin(next(keys), d, md), "fc1_b": jnp.zeros((md,)),
                "fc2_w": lin(next(keys), md, d), "fc2_b": jnp.zeros((d,)),
            },
        })
    return {
        "patch_embed": {"w": lin(next(keys), pdim, d), "b": jnp.zeros((d,))},
        "cls_token": _trunc_normal(next(keys), (1, 1, d)),
        "pos_embed": _trunc_normal(next(keys), (1, cfg.num_patches + 1, d)),
        "blocks": blocks,
        "ln_s": jnp.ones((d,)), "ln_b": jnp.zeros((d,)),
    }
