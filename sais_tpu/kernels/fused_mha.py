"""Fully-fused ViT transformer blocks for short sequences (ViT-S/16:
L=197 globals, L=37 local crops) — forward, W8A8, and training
forward/backward Pallas kernels.

XLA's attention path materializes per-head transposes of q/k/v and the
(B, h, L, L) score/weight tensors in HBM — at ViT scale that traffic is
~60% of block time.  These kernels keep a whole pre-norm block (LN ->
qkv -> attention -> proj -> residual -> LN -> MLP -> residual) for a
group of `imgs` images in VMEM: only the block input and output (plus
the x1 residual on the training path) ever touch HBM.

Entry points: `fused_vit_block` (inference), `fused_vit_block_int8`
(W8A8 experiment), `make_trainable_fused_block` (XLA backward) and
`make_pallas_trainable_fused_block` (custom-VJP Pallas backward, with
optional stochastic-depth branch scales and packed block-diagonal
attention for the local-crop regime).

The attention context math lives in exactly two helpers shared by every
forward kernel — `_packed_attn_ctx` (one masked (rows, rows) matmul per
head) and `_attn_ctx` (sub-grouped / per-image loop) — plus the interleaved
recompute inside `_attn_bwd_kernel`; test_fused_backward's agreement
assertions guard the pair.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _layer_norm_f32(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale.astype(
        jnp.float32) + bias.astype(jnp.float32)


def _packed_mask(rows: int, lp: int, valid_len: int):
    """(rows, rows) additive mask for block-diagonal attention over a
    group of rows//lp images packed along the row axis: key j is visible
    to query i iff both sit in the same image AND j's in-image position is
    < valid_len.  Short sequences (local crops, lp=48) starve per-image
    (lp x dh) matmuls on the MXU; packing `sub` images per score matmul
    trades wasted cross-image FLOPs (the key axis covers sub*lp columns
    of which lp are useful per query) for fuller tiles — the sweet spot
    is a TUNED sub-group size (see _auto_packed), not the whole group.
    Swept on v5e at lp=48/valid=37, 512 images fwd+bwd
    (tools/packed_sub_sweep.py): sub=1 44.1 ms, sub=2 37.5, sub=4
    35.3 (fastest), sub=8 37.2 — full-group packing pays 8x the useful
    score FLOPs, per-image starves the MXU, 192 rows balances the
    two."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    same_img = (row_ids // lp) == (col_ids // lp)
    col_valid = (col_ids % lp) < valid_len
    return jnp.where(same_img & col_valid, 0.0, _NEG_INF)


def _packed_attn_ctx(qkv, d: int, num_heads: int, head_dim: int,
                     mask, dtype):
    """Block-diagonal attention context over packed rows.

    qkv: (rows, 3d).  Returns ctx (rows, d).  Cross-image scores are
    killed by the additive mask before the softmax, so the result equals
    the per-image loop exactly (softmax rows renormalize over the
    surviving block)."""
    scale = head_dim ** -0.5
    ctx_heads = []
    for h in range(num_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, d + h * head_dim:d + (h + 1) * head_dim]
        v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
        s = jax.lax.dot_general(q.astype(jnp.float32) * scale,
                                k.astype(jnp.float32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + mask, axis=-1)
        ctx_heads.append(jax.lax.dot_general(
            p.astype(dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype))
    return jnp.concatenate(ctx_heads, axis=-1)


def _sub_mask(sub: int, lp: int, valid_len: int):
    """Additive attention mask for a sub-group of `sub` images: (1, lp)
    broadcast key mask when sub == 1, block-diagonal (sub*lp, sub*lp)
    otherwise."""
    if sub <= 1:
        key_ids = jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1)
        return (key_ids >= valid_len) * _NEG_INF
    return _packed_mask(sub * lp, lp, valid_len)


def _attn_ctx(qkv, d: int, num_heads: int, head_dim: int, dtype,
              lp: int, imgs: int, sub: int, valid_len: int):
    """Attention context over `imgs` packed images, computed in
    sub-groups of `sub` images per score matmul (block-diagonal masked
    within a sub-group).  sub=1 is the per-image loop; sub=imgs the
    fully-packed form; in between trades cross-image score waste for
    tile fullness (see _packed_mask)."""
    mask = _sub_mask(sub, lp, valid_len)
    cr = sub * lp
    chunks = [_packed_attn_ctx(qkv[c * cr:(c + 1) * cr], d, num_heads,
                               head_dim, mask, dtype)
              for c in range(imgs // max(sub, 1))]
    return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]


def _block_kernel(x_ref, qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b,
                  fc2_w, fc2_b, ln1_s, ln1_b, ln2_s, ln2_b, o_ref, *,
                  num_heads: int, head_dim: int, valid_len: int,
                  eps: float, imgs: int = 1):
    """One full pre-norm ViT block for `imgs` images, entirely in VMEM.

    Attention context comes from the shared _attn_ctx / _packed_attn_ctx
    helpers (per-image loop = sub=1); the only other copy of the
    attention math is the interleaved recompute in _attn_bwd_kernel,
    guarded by test_fused_backward's forward/gradient agreement
    assertions.

    With imgs > 1 the qkv / proj / MLP matmuls run over all images' rows at
    once ((imgs*Lp, D) operands feed the MXU with taller tiles) while the
    O(L^2) attention still runs per image, per head.
    """
    rows, d = x_ref.shape
    lp = rows // imgs
    x = x_ref[:]
    dtype = x.dtype

    y = _layer_norm_f32(x, ln1_s[:], ln1_b[:], eps).astype(dtype)
    qkv = (jax.lax.dot_general(y, qkv_w[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           .astype(dtype) + qkv_b[:])
    ctx = _attn_ctx(qkv, d, num_heads, head_dim, dtype, lp, imgs, 1,
                    valid_len)
    o = (jax.lax.dot_general(ctx, proj_w[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         .astype(dtype) + proj_b[:])
    x = x + o

    y = _layer_norm_f32(x, ln2_s[:], ln2_b[:], eps).astype(dtype)
    hdn = (jax.lax.dot_general(y, fc1_w[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           .astype(dtype) + fc1_b[:])
    # Mosaic has no erf/erfc lowering; tanh-approx GELU differs from the
    # exact torch GELU by <=3e-3 in activation units — below bf16 noise on
    # this (bf16-only) fast path.  The f32 parity path uses exact GELU.
    hdn = jax.nn.gelu(hdn.astype(jnp.float32),
                      approximate=True).astype(dtype)
    o = (jax.lax.dot_general(hdn, fc2_w[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         .astype(dtype) + fc2_b[:])
    o_ref[:] = x + o


def _quant_rows(y32: jnp.ndarray):
    """Per-row symmetric int8 quantization: f32 (rows, d) -> (int8, scale).

    Per-row (per-token) scaling bounds the quantization error by each
    token's own dynamic range — the standard W8A8 dynamic-activation
    recipe (e.g. LLM.int8 / SmoothQuant lineage)."""
    amax = jnp.max(jnp.abs(y32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(y32 / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _int8_mm(q, row_scale, wq_ref, ws_ref, b_ref):
    """int8 x int8 -> int32 MXU matmul, dequantized to f32.

    q: (rows, K) int8; row_scale: (rows, 1) f32; wq: (K, N) int8 with
    per-output-channel scales ws: (1, N) f32; bias b: (N,) f32."""
    acc = jax.lax.dot_general(q, wq_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * row_scale * ws_ref[:] + b_ref[:]


def _block_kernel_int8(x_ref, qkv_wq, qkv_ws, qkv_b, proj_wq, proj_ws,
                       proj_b, fc1_wq, fc1_ws, fc1_b, fc2_wq, fc2_ws, fc2_b,
                       ln1_s, ln1_b, ln2_s, ln2_b, o_ref, *, num_heads: int,
                       head_dim: int, valid_len: int, eps: float,
                       imgs: int = 1):
    """W8A8 variant of _block_kernel: the qkv/proj/fc1/fc2 matmuls (92% of
    block MACs at ViT-S) run int8 x int8 -> int32 on the MXU at 2x the bf16
    rate; activations are quantized per token on the fly in VMEM.  The
    O(L^2) attention stays bf16 (8% of MACs, and softmax wants f32 scores
    anyway)."""
    rows, d = x_ref.shape
    lp = rows // imgs
    x = x_ref[:]
    dtype = x.dtype

    yq, rs = _quant_rows(_layer_norm_f32(x, ln1_s[:], ln1_b[:], eps))
    qkv = _int8_mm(yq, rs, qkv_wq, qkv_ws, qkv_b).astype(dtype)
    ctx = _attn_ctx(qkv, d, num_heads, head_dim, dtype, lp, imgs, 1,
                    valid_len)
    cq, cs = _quant_rows(ctx.astype(jnp.float32))
    x = x + _int8_mm(cq, cs, proj_wq, proj_ws, proj_b).astype(dtype)

    yq, rs = _quant_rows(_layer_norm_f32(x, ln2_s[:], ln2_b[:], eps))
    hdn = _int8_mm(yq, rs, fc1_wq, fc1_ws, fc1_b)
    hdn = jax.nn.gelu(hdn, approximate=True)
    hq, hs = _quant_rows(hdn)
    o_ref[:] = x + _int8_mm(hq, hs, fc2_wq, fc2_ws, fc2_b).astype(dtype)


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8: (K, N) f32/bf16 -> int8 + (1, N)
    f32 scales."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    ws = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    wq = jnp.clip(jnp.round(w32 / ws), -127.0, 127.0).astype(jnp.int8)
    return wq, ws


@functools.partial(jax.jit, static_argnames=("num_heads", "valid_len", "eps",
                                             "imgs", "interpret"))
def fused_vit_block_int8(x: jnp.ndarray, qkv_w, qkv_b, proj_w, proj_b,
                         fc1_w, fc1_b, fc2_w, fc2_b, ln1_s, ln1_b, ln2_s,
                         ln2_b, num_heads: int, valid_len: int,
                         eps: float = 1e-6, imgs: int = 1,
                         interpret: bool = False) -> jnp.ndarray:
    """fused_vit_block with W8A8 matmuls.

    Weights are quantized INSIDE the traced function (params are jit
    arguments in every call path, so the abs-max/round/clip runs each
    call).  That costs ~88 MFLOP across all 12 ViT-S blocks — noise next
    to the ~4.6 TFLOP forward at extraction batch 1024 — so the recurring
    quantization is not what limits this mode to +3.8%; the int8 dot
    itself doesn't reach the MXU's nominal 2x rate (see PERFORMANCE.md)."""
    b, lp, d = x.shape
    head_dim = d // num_heads
    groups = b // imgs
    xg = x.reshape(groups, imgs * lp, d)

    qkv_wq, qkv_ws = quantize_weight(qkv_w)
    proj_wq, proj_ws = quantize_weight(proj_w)
    fc1_wq, fc1_ws = quantize_weight(fc1_w)
    fc2_wq, fc2_ws = quantize_weight(fc2_w)
    f32 = jnp.float32

    weights = (qkv_wq, qkv_ws, qkv_b.astype(f32), proj_wq, proj_ws,
               proj_b.astype(f32), fc1_wq, fc1_ws, fc1_b.astype(f32),
               fc2_wq, fc2_ws, fc2_b.astype(f32), ln1_s, ln1_b, ln2_s,
               ln2_b)
    out = pl.pallas_call(
        functools.partial(_block_kernel_int8, num_heads=num_heads,
                          head_dim=head_dim, valid_len=valid_len, eps=eps,
                          imgs=imgs),
        grid=(groups,),
        in_specs=[_img_spec(imgs * lp, d)] +
                 [_const_spec(w.shape) for w in weights],
        out_specs=_img_spec(imgs * lp, d),
        out_shape=jax.ShapeDtypeStruct((groups, imgs * lp, d), x.dtype),
        interpret=interpret,
    )(xg, *weights)
    return out.reshape(b, lp, d)


@functools.partial(jax.jit, static_argnames=("num_heads", "valid_len", "eps",
                                             "imgs", "interpret"))
def fused_vit_block(x: jnp.ndarray, qkv_w, qkv_b, proj_w, proj_b, fc1_w,
                    fc1_b, fc2_w, fc2_b, ln1_s, ln1_b, ln2_s, ln2_b,
                    num_heads: int, valid_len: int, eps: float = 1e-6,
                    imgs: int = 1, interpret: bool = False) -> jnp.ndarray:
    """Entire pre-norm transformer block fused, `imgs` images per program.

    x: (B, Lp, D) with Lp sublane-aligned and rows >= valid_len zero-padded;
    B must divide by imgs.  Only x and the output touch HBM per layer;
    weights are VMEM-resident across the grid (constant index maps).
    Measured on v5e at ViT-S/224 batch 1024: imgs=4 with Lp=224 reaches
    ~13.4k f/s vs 11.2k for imgs=1/Lp=256 (+19%).
    """
    b, lp, d = x.shape
    head_dim = d // num_heads
    groups = b // imgs
    xg = x.reshape(groups, imgs * lp, d)

    weights = (qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b, fc2_w, fc2_b,
               ln1_s, ln1_b, ln2_s, ln2_b)
    out = pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads,
                          head_dim=head_dim, valid_len=valid_len, eps=eps,
                          imgs=imgs),
        grid=(groups,),
        in_specs=[_img_spec(imgs * lp, d)] +
                 [_const_spec(w.shape) for w in weights],
        out_specs=_img_spec(imgs * lp, d),
        out_shape=jax.ShapeDtypeStruct((groups, imgs * lp, d), x.dtype),
        interpret=interpret,
    )(xg, *weights)
    return out.reshape(b, lp, d)


def _xla_block_tanh(x, qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b, fc2_w,
                    fc2_b, ln1_s, ln1_b, ln2_s, ln2_b, num_heads: int,
                    valid_len: int, eps: float, s1=None, s2=None):
    """Differentiable XLA twin of _block_kernel: identical math (incl. the
    tanh GELU and padded-key masking), batch-major.  Used as the backward
    function for the trainable fused block.  s1/s2: optional (B, Lp, 1)
    residual-branch scales (stochastic depth), matching the scaled Pallas
    kernels."""
    b, lp, d = x.shape
    dh = d // num_heads
    dtype = x.dtype
    key_mask = (jnp.arange(lp) >= valid_len)[None, None, None, :] * _NEG_INF

    y = _layer_norm_f32(x, ln1_s, ln1_b, eps).astype(dtype)
    qkv = (jnp.einsum("bld,de->ble", y, qkv_w,
                      preferred_element_type=jnp.float32).astype(dtype)
           + qkv_b)
    qkv = qkv.reshape(b, lp, 3, num_heads, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32) * dh ** -0.5,
                   k.astype(jnp.float32), preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s + key_mask, axis=-1)
    ctx = jnp.einsum("bhlm,bmhd->blhd", p.astype(dtype), v,
                     preferred_element_type=jnp.float32).astype(dtype)
    o = (jnp.einsum("bld,de->ble", ctx.reshape(b, lp, d), proj_w,
                    preferred_element_type=jnp.float32).astype(dtype)
         + proj_b)
    if s1 is not None:
        o = o * s1
    x = x + o

    y = _layer_norm_f32(x, ln2_s, ln2_b, eps).astype(dtype)
    hdn = (jnp.einsum("bld,de->ble", y, fc1_w,
                      preferred_element_type=jnp.float32).astype(dtype)
           + fc1_b)
    hdn = jax.nn.gelu(hdn.astype(jnp.float32), approximate=True).astype(dtype)
    o = (jnp.einsum("bld,de->ble", hdn, fc2_w,
                    preferred_element_type=jnp.float32).astype(dtype)
         + fc2_b)
    if s2 is not None:
        o = o * s2
    return x + o


def make_trainable_fused_block(num_heads: int, valid_len: int,
                               eps: float = 1e-6, interpret: bool = False):
    """Trainable fused block: Pallas forward, exact XLA backward.

    The backward pass is the VJP of `_xla_block_tanh`, which computes the
    SAME function as the kernel (tanh GELU, f32 softmax/LN), so gradients
    correspond to the forward function up to bf16 kernel-fusion noise —
    the standard recompute-in-backward pattern (pallas guide, custom VJP).
    """

    @jax.custom_vjp
    def block_op(x, *weights):
        return fused_vit_block(x, *weights, num_heads=num_heads,
                               valid_len=valid_len, eps=eps,
                               interpret=interpret)

    def fwd(x, *weights):
        return block_op(x, *weights), (x, weights)

    def bwd(res, g):
        x, weights = res
        _, vjp = jax.vjp(
            lambda x, *w: _xla_block_tanh(x, *w, num_heads=num_heads,
                                          valid_len=valid_len, eps=eps),
            x, *weights)
        return vjp(g)

    block_op.defvjp(fwd, bwd)
    return block_op


# ---------------------------------------------------------------------------
# Fully-fused training path: Pallas forward AND Pallas backward
# ---------------------------------------------------------------------------
#
# The block backward is split into two kernels so each fits VMEM with f32
# weight-gradient accumulators:
#   - MLP half:  (x1, dout)  -> dx1, dW1, db1, dW2, db2, dln2_{s,b}
#   - attn half: (x, dx1)    -> dx,  dWqkv, dbqkv, dWp, dbp, dln1_{s,b}
# where x1 = x + attn_out is saved by the training forward (one extra bf16
# (B, Lp, D) residual to HBM).  Weight grads accumulate across the batch
# grid in f32 VMEM outputs with constant index maps — TPU grids execute
# sequentially, so read-modify-write accumulation is safe (pallas guide,
# 'Patterns: Custom VJP' + reduction outputs).


def _gelu_tanh_and_grad(h32):
    """tanh-approx GELU value and d/dh, f32."""
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.044715
    u = c * (h32 + a * h32 ** 3)
    t = jnp.tanh(u)
    g = 0.5 * h32 * (1.0 + t)
    dg = 0.5 * (1.0 + t) + 0.5 * h32 * (1.0 - t * t) * c * (1.0 + 3 * a * h32 ** 2)
    return g, dg


def _ln_fwd_stats(x32, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    return xhat, rstd


def _ln_bwd(dy32, xhat, rstd, scale32):
    """dx for y = xhat*scale + bias given upstream dy (all f32)."""
    dxh = dy32 * scale32
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return rstd * (dxh - m1 - xhat * m2)


def _block_fwd_train_kernel(x_ref, qkv_w, qkv_b, proj_w, proj_b, fc1_w,
                            fc1_b, fc2_w, fc2_b, ln1_s, ln1_b, ln2_s, ln2_b,
                            *rest, num_heads: int, head_dim: int,
                            valid_len: int, eps: float, imgs: int = 1,
                            scaled: bool = False, sub: int = 1):
    """Same math as _block_kernel but also emits the post-attention
    residual x1 (needed by the split backward).

    scaled=True adds two per-row (rows, 1) branch-scale inputs s1/s2 —
    stochastic-depth masks 0 or 1/keep, constant within an image — so the
    block computes x1 = x + s1*attn_branch, out = x1 + s2*mlp_branch
    (vision_transformer.py:111-112's two self.drop_path calls) without
    leaving the fused path.

    sub > 1 computes the group's attention in block-diagonal masked
    sub-groups of `sub` images per score matmul (_attn_ctx) instead of
    an imgs-loop — the short-sequence (local-crop) regime where
    per-image matmuls starve the MXU."""
    if scaled:
        s1_ref, s2_ref, o_ref, x1_ref = rest
    else:
        o_ref, x1_ref = rest
    rows, d = x_ref.shape
    lp = rows // imgs
    x = x_ref[:]
    dtype = x.dtype

    y = _layer_norm_f32(x, ln1_s[:], ln1_b[:], eps).astype(dtype)
    qkv = (jax.lax.dot_general(y, qkv_w[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           .astype(dtype) + qkv_b[:])
    ctx = _attn_ctx(qkv, d, num_heads, head_dim, dtype, lp, imgs, sub,
                    valid_len)
    o = (jax.lax.dot_general(ctx, proj_w[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         .astype(dtype) + proj_b[:])
    if scaled:
        o = o * s1_ref[:]
    x1 = x + o
    x1_ref[:] = x1

    y = _layer_norm_f32(x1, ln2_s[:], ln2_b[:], eps).astype(dtype)
    hdn = (jax.lax.dot_general(y, fc1_w[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           .astype(dtype) + fc1_b[:])
    hdn = jax.nn.gelu(hdn.astype(jnp.float32), approximate=True).astype(dtype)
    o = (jax.lax.dot_general(hdn, fc2_w[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         .astype(dtype) + fc2_b[:])
    if scaled:
        o = o * s2_ref[:]
    o_ref[:] = x1 + o


def _mlp_bwd_kernel(x1_ref, dout_ref, *rest, eps: float,
                    scaled: bool = False):
    """Backward through out = x1 + [s2 *] fc2(gelu(fc1(LN2(x1)))).

    With scaled=True an extra (rows, 1) s2 input follows dout; the branch
    chain (weight grads and the LN2 path) sees dout*s2 while the residual
    passthrough into dx1 stays unscaled."""
    if scaled:
        (s2_ref, fc1_w, fc1_b, fc2_w, fc2_b, ln2_s, ln2_b, dx1_ref,
         dfc1_w, dfc1_b, dfc2_w, dfc2_b, dln2_s, dln2_b) = rest
    else:
        (fc1_w, fc1_b, fc2_w, fc2_b, ln2_s, ln2_b, dx1_ref,
         dfc1_w, dfc1_b, dfc2_w, dfc2_b, dln2_s, dln2_b) = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dfc1_w[:] = jnp.zeros_like(dfc1_w)
        dfc1_b[:] = jnp.zeros_like(dfc1_b)
        dfc2_w[:] = jnp.zeros_like(dfc2_w)
        dfc2_b[:] = jnp.zeros_like(dfc2_b)
        dln2_s[:] = jnp.zeros_like(dln2_s)
        dln2_b[:] = jnp.zeros_like(dln2_b)

    x1 = x1_ref[:]
    dtype = x1.dtype
    dout = dout_ref[:]

    # recompute forward intermediates (same casts as the forward kernel)
    xhat, rstd = _ln_fwd_stats(x1.astype(jnp.float32), eps)
    s32 = ln2_s[:].astype(jnp.float32)
    y = (xhat * s32 + ln2_b[:].astype(jnp.float32)).astype(dtype)
    h = (jax.lax.dot_general(y, fc1_w[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         .astype(dtype) + fc1_b[:])
    g32, dg32 = _gelu_tanh_and_grad(h.astype(jnp.float32))
    g = g32.astype(dtype)

    # backward
    do2 = dout * s2_ref[:] if scaled else dout       # bf16 (lp, d)
    dfc2_w[:] += jax.lax.dot_general(g, do2, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dfc2_b[:] += jnp.sum(do2.astype(jnp.float32), axis=0, keepdims=True)
    dg = jax.lax.dot_general(do2, fc2_w[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = (dg * dg32).astype(dtype)                   # (lp, 4d)
    dfc1_w[:] += jax.lax.dot_general(y, dh, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dfc1_b[:] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dy = jax.lax.dot_general(dh, fc1_w[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dln2_s[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dln2_b[:] += jnp.sum(dy, axis=0, keepdims=True)
    dx1 = _ln_bwd(dy, xhat, rstd, s32)
    dx1_ref[:] = (dx1 + dout.astype(jnp.float32)).astype(dtype)


def _attn_bwd_kernel(x_ref, dx1_ref, *rest, num_heads: int, head_dim: int,
                     valid_len: int, eps: float, imgs: int = 1,
                     scaled: bool = False, sub: int = 1):
    """Backward through x1 = x + [s1 *] proj(attn(qkv(LN1(x)))).

    With scaled=True an extra (rows, 1) s1 input follows dx1; the branch
    chain sees dx1*s1 while the residual passthrough into dx stays
    unscaled.

    sub > 1 recomputes and differentiates the attention in
    block-diagonal sub-groups of `sub` images per matmul (see
    _attn_ctx): the softmax's masked probabilities are exactly zero at
    cross-image / invalid keys, so ds vanishes there and dq/dk/dv match
    the per-image loop."""
    if scaled:
        (s1_ref, qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b, dx_ref,
         dqkv_w, dqkv_b, dproj_w, dproj_b, dln1_s, dln1_b) = rest
    else:
        (qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b, dx_ref,
         dqkv_w, dqkv_b, dproj_w, dproj_b, dln1_s, dln1_b) = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dqkv_w[:] = jnp.zeros_like(dqkv_w)
        dqkv_b[:] = jnp.zeros_like(dqkv_b)
        dproj_w[:] = jnp.zeros_like(dproj_w)
        dproj_b[:] = jnp.zeros_like(dproj_b)
        dln1_s[:] = jnp.zeros_like(dln1_s)
        dln1_b[:] = jnp.zeros_like(dln1_b)

    rows, d = x_ref.shape
    lp = rows // imgs
    x = x_ref[:]
    dtype = x.dtype
    dx1 = dx1_ref[:]
    dbr = dx1 * s1_ref[:] if scaled else dx1         # grad into the branch
    scale = head_dim ** -0.5

    # recompute
    xhat, rstd = _ln_fwd_stats(x.astype(jnp.float32), eps)
    s32 = ln1_s[:].astype(jnp.float32)
    y = (xhat * s32 + ln1_b[:].astype(jnp.float32)).astype(dtype)
    qkv = (jax.lax.dot_general(y, qkv_w[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           .astype(dtype) + qkv_b[:])

    # ctx and its grad, sub-group by sub-group, head by head (p recomputed
    # per head, never stored for more than one head at a time)
    dctx = jax.lax.dot_general(dbr, proj_w[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(dtype)
    sub_ = max(sub, 1)
    mask = _sub_mask(sub_, lp, valid_len)
    cr = sub_ * lp
    chunk_ctx, chunk_dqkv = [], []
    for c in range(rows // cr):
        sl = slice(c * cr, (c + 1) * cr)
        ctx_heads = []
        dq_heads, dk_heads, dv_heads = [], [], []
        for h in range(num_heads):
            q = qkv[sl, h * head_dim:(h + 1) * head_dim]
            k = qkv[sl, d + h * head_dim:d + (h + 1) * head_dim]
            v = qkv[sl, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
            s = jax.lax.dot_general(q.astype(jnp.float32) * scale,
                                    k.astype(jnp.float32),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s + mask, axis=-1)
            pb = p.astype(dtype)
            ctx_heads.append(jax.lax.dot_general(
                pb, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype))
            dc = dctx[sl, h * head_dim:(h + 1) * head_dim]
            dv = jax.lax.dot_general(pb, dc, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(dc, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # p == 0 at cross-image / invalid keys -> ds vanishes there,
            # so sub-group matmuls reproduce the per-image grads exactly
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = ds.astype(dtype)
            dq_heads.append((jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale).astype(dtype))
            dk_heads.append((jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale).astype(dtype))
            dv_heads.append(dv.astype(dtype))
        chunk_ctx.append(jnp.concatenate(ctx_heads, axis=-1))
        chunk_dqkv.append(jnp.concatenate(
            dq_heads + dk_heads + dv_heads, axis=-1))
    ctx = (jnp.concatenate(chunk_ctx, axis=0) if len(chunk_ctx) > 1
           else chunk_ctx[0])
    dqkv = (jnp.concatenate(chunk_dqkv, axis=0) if len(chunk_dqkv) > 1
            else chunk_dqkv[0])                        # (rows, 3d)
    _attn_bwd_tail(x, xhat, rstd, s32, y, ctx, dqkv, dbr, dx1, qkv_w,
                   dx_ref, dqkv_w, dqkv_b, dproj_w, dproj_b, dln1_s,
                   dln1_b)


def _attn_bwd_tail(x, xhat, rstd, s32, y, ctx, dqkv, dbr, dx1, qkv_w,
                   dx_ref, dqkv_w, dqkv_b, dproj_w, dproj_b, dln1_s,
                   dln1_b):
    """Shared weight-grad accumulation + LN1 backward of _attn_bwd_kernel
    (identical for the per-image-loop and packed attention recomputes)."""
    dtype = x.dtype
    dproj_w[:] += jax.lax.dot_general(ctx, dbr, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dproj_b[:] += jnp.sum(dbr.astype(jnp.float32), axis=0, keepdims=True)
    dqkv_w[:] += jax.lax.dot_general(y, dqkv, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dqkv_b[:] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dy = jax.lax.dot_general(dqkv, qkv_w[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dln1_s[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dln1_b[:] += jnp.sum(dy, axis=0, keepdims=True)
    dx = _ln_bwd(dy, xhat, rstd, s32)
    dx_ref[:] = (dx + dx1.astype(jnp.float32)).astype(dtype)


def _img_spec(lp, d):
    return pl.BlockSpec((None, lp, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pick_imgs(b: int, lp: int, want: int, row_cap: int) -> int:
    """Largest group size <= want that divides b within the row budget."""
    for imgs in range(want, 0, -1):
        if b % imgs == 0 and imgs * lp <= row_cap:
            return imgs
    return 1


def _largest_divisor(n: int, want: int) -> int:
    for s in range(min(want, n), 0, -1):
        if n % s == 0:
            return s
    return 1


# Images per attention sub-group for short packed sequences, expressed as
# a target ROW count (sub = _PACKED_SUB_ROWS // lp).  Swept on v5e at
# lp=48/valid=37/512 imgs (tools/packed_sub_sweep.py, fwd+bwd):
# sub=1 44.1 ms, sub=2 37.5, sub=4 (192 rows) 35.3, sub=8 37.2 —
# sub-grouping keeps most of the tile-fullness win at half the
# cross-image score waste.  See the sweep table in PERFORMANCE.md.
_PACKED_SUB_ROWS = 192


def _auto_packed(packed, lp: int, imgs: int) -> int:
    """Images per attention sub-group inside one fused-block program:
    1 = per-image loop (long sequences, lp > 64, where (lp, dh) matmuls
    already fill the MXU); > 1 = block-diagonal packing of short
    sequences.  `packed` may be None (auto), a bool (False -> 1,
    True -> the whole group), or an explicit int sub-group size (clamped
    to a divisor of imgs so chunks tile the row axis exactly)."""
    if packed is None:
        if lp <= 64 and imgs > 1:
            return _largest_divisor(imgs, max(1, _PACKED_SUB_ROWS // lp))
        return 1
    if packed is True:
        return imgs
    if packed is False:
        return 1
    return _largest_divisor(imgs, max(1, int(packed)))


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "valid_len", "eps",
                                    "interpret", "packed"))
def _fused_block_fwd_train(x, qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b,
                           fc2_w, fc2_b, ln1_s, ln1_b, ln2_s, ln2_b,
                           num_heads: int, valid_len: int, eps: float,
                           interpret: bool, s1=None, s2=None, packed=None):
    b, lp, d = x.shape
    head_dim = d // num_heads
    # measured fastest at 2 for L~208 (x1 doubles IO); SHORT sequences
    # (e.g. 96px local crops, lp=48) starve the qkv/proj/MLP row dimension
    # at 2, so the target grows to keep ~416 rows per program
    imgs = _pick_imgs(b, lp, max(2, 416 // lp), 1024)
    groups = b // imgs
    xg = x.reshape(groups, imgs * lp, d)
    weights = (qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b, fc2_w, fc2_b,
               ln1_s, ln1_b, ln2_s, ln2_b)
    scaled = s1 is not None
    extra = ((s1.reshape(groups, imgs * lp, 1),
              s2.reshape(groups, imgs * lp, 1)) if scaled else ())
    out, x1 = pl.pallas_call(
        functools.partial(_block_fwd_train_kernel, num_heads=num_heads,
                          head_dim=head_dim, valid_len=valid_len, eps=eps,
                          imgs=imgs, scaled=scaled,
                          sub=_auto_packed(packed, lp, imgs)),
        grid=(groups,),
        in_specs=[_img_spec(imgs * lp, d)] + [_const_spec(w.shape)
                                              for w in weights]
                 + [_img_spec(imgs * lp, 1)] * len(extra),
        out_specs=(_img_spec(imgs * lp, d), _img_spec(imgs * lp, d)),
        out_shape=(jax.ShapeDtypeStruct((groups, imgs * lp, d), x.dtype),
                   jax.ShapeDtypeStruct((groups, imgs * lp, d), x.dtype)),
        interpret=interpret,
    )(xg, *weights, *extra)
    return out.reshape(b, lp, d), x1.reshape(b, lp, d)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_block_bwd_mlp(x1, dout, fc1_w, fc1_b, fc2_w, fc2_b, ln2_s, ln2_b,
                         eps: float, interpret: bool, s2=None):
    b, lp, d = x1.shape
    dff = fc1_w.shape[1]
    # the MLP backward is fully row-independent; one image per program at
    # L~208 (the f32 dW accumulators leave little VMEM headroom), but
    # short sequences group up to ~208 rows for taller dW operands
    # (384 rows OOMs scoped vmem at 20.2M: the f32 (rows, 4d) GELU
    # intermediates dominate)
    imgs = _pick_imgs(b, lp, max(1, 208 // lp), 512)
    groups = b // imgs
    weights = (fc1_w, fc1_b, fc2_w, fc2_b, ln2_s, ln2_b)
    scaled = s2 is not None
    extra = (s2.reshape(groups, imgs * lp, 1),) if scaled else ()
    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps, scaled=scaled),
        grid=(groups,),
        in_specs=[_img_spec(imgs * lp, d)] * 2
                 + [_img_spec(imgs * lp, 1)] * len(extra)
                 + [_const_spec(w.shape) for w in weights],
        out_specs=(_img_spec(imgs * lp, d),
                   _const_spec((d, dff)), _const_spec((1, dff)),
                   _const_spec((dff, d)), _const_spec((1, d)),
                   _const_spec((1, d)), _const_spec((1, d))),
        out_shape=(jax.ShapeDtypeStruct((groups, imgs * lp, d), x1.dtype),
                   jax.ShapeDtypeStruct((d, dff), jnp.float32),
                   jax.ShapeDtypeStruct((1, dff), jnp.float32),
                   jax.ShapeDtypeStruct((dff, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=interpret,
    )(x1.reshape(groups, imgs * lp, d), dout.reshape(groups, imgs * lp, d),
      *extra, *weights)
    return (outs[0].reshape(b, lp, d),) + tuple(outs[1:])


@functools.partial(jax.jit, static_argnames=("num_heads", "valid_len", "eps",
                                             "interpret", "packed"))
def _fused_block_bwd_attn(x, dx1, qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b,
                          num_heads: int, valid_len: int, eps: float,
                          interpret: bool, s1=None, packed=None):
    b, lp, d = x.shape
    head_dim = d // num_heads
    # fastest at 1 img/program for L~208; short PACKED sequences group to
    # ~416 rows so the block-diagonal matmuls get full tiles
    imgs = _pick_imgs(b, lp, max(1, (416 if lp <= 64 else 208) // lp), 512)
    groups = b // imgs
    weights = (qkv_w, qkv_b, proj_w, proj_b, ln1_s, ln1_b)
    scaled = s1 is not None
    extra = (s1.reshape(groups, imgs * lp, 1),) if scaled else ()
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                          head_dim=head_dim, valid_len=valid_len, eps=eps,
                          imgs=imgs, scaled=scaled,
                          sub=_auto_packed(packed, lp, imgs)),
        grid=(groups,),
        in_specs=[_img_spec(imgs * lp, d)] * 2
                 + [_img_spec(imgs * lp, 1)] * len(extra)
                 + [_const_spec(w.shape) for w in weights],
        out_specs=(_img_spec(imgs * lp, d),
                   _const_spec((d, 3 * d)), _const_spec((1, 3 * d)),
                   _const_spec((d, d)), _const_spec((1, d)),
                   _const_spec((1, d)), _const_spec((1, d))),
        out_shape=(jax.ShapeDtypeStruct((groups, imgs * lp, d), x.dtype),
                   jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
                   jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
                   jax.ShapeDtypeStruct((d, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=interpret,
    )(x.reshape(groups, imgs * lp, d), dx1.reshape(groups, imgs * lp, d),
      *extra, *weights)
    return (outs[0].reshape(b, lp, d),) + tuple(outs[1:])


def make_pallas_trainable_fused_block(num_heads: int, valid_len: int,
                                      eps: float = 1e-6,
                                      interpret: bool = False,
                                      scaled: bool = False,
                                      packed=None):
    """Fully-fused trainable block: Pallas forward AND Pallas backward.

    Unlike make_trainable_fused_block (XLA recompute backward), both
    directions run as VMEM-resident kernels — the backward streams x / x1
    / dout once from HBM and accumulates f32 weight grads on chip.
    Gradients match the XLA twin to bf16 tolerance (tested).

    scaled=True returns `block_op(x, s1, s2, *weights)` where s1/s2 are
    (B, Lp, 1) per-row residual-branch scales (stochastic-depth masks,
    constant within an image; vision_transformer.py:111-112).  The scales
    are treated as constants by the VJP (zero cotangent) — they are
    Bernoulli draws, not parameters.

    Gradient-free forwards should use the inference kernels instead
    (vit_features / fused_vit_block): even outside jax.grad this primal
    runs the training kernel, which writes the x1 residual to HBM — one
    wasted (B, Lp, D) store per block (the DINO teacher routes around it
    via backbone_infer, train/dino.py)."""

    @jax.custom_vjp
    def block_op(x, *rest):
        s1, s2, weights = ((rest[0], rest[1], rest[2:]) if scaled
                           else (None, None, rest))
        out, _ = _fused_block_fwd_train(x, *weights, num_heads=num_heads,
                                        valid_len=valid_len, eps=eps,
                                        interpret=interpret, s1=s1, s2=s2,
                                        packed=packed)
        return out

    def fwd(x, *rest):
        s1, s2, weights = ((rest[0], rest[1], rest[2:]) if scaled
                           else (None, None, rest))
        out, x1 = _fused_block_fwd_train(x, *weights, num_heads=num_heads,
                                         valid_len=valid_len, eps=eps,
                                         interpret=interpret, s1=s1, s2=s2,
                                         packed=packed)
        return out, (x, x1, s1, s2, weights)

    def bwd(res, g):
        x, x1, s1, s2, weights = res
        (qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b, fc2_w, fc2_b,
         ln1_s, ln1_b, ln2_s, ln2_b) = weights
        (dx1, dfc1_w, dfc1_b, dfc2_w, dfc2_b, dln2_s, dln2_b) = \
            _fused_block_bwd_mlp(x1, g, fc1_w, fc1_b, fc2_w, fc2_b, ln2_s,
                                 ln2_b, eps=eps, interpret=interpret, s2=s2)
        (dx, dqkv_w, dqkv_b, dproj_w, dproj_b, dln1_s, dln1_b) = \
            _fused_block_bwd_attn(x, dx1, qkv_w, qkv_b, proj_w, proj_b,
                                  ln1_s, ln1_b, num_heads=num_heads,
                                  valid_len=valid_len, eps=eps,
                                  interpret=interpret, s1=s1,
                                  packed=packed)

        def cast(gw, w):
            gw = gw.reshape(w.shape)
            return gw.astype(w.dtype)

        dw = (cast(dqkv_w, qkv_w), cast(dqkv_b, qkv_b),
              cast(dproj_w, proj_w), cast(dproj_b, proj_b),
              cast(dfc1_w, fc1_w), cast(dfc1_b, fc1_b),
              cast(dfc2_w, fc2_w), cast(dfc2_b, fc2_b),
              cast(dln1_s, ln1_s), cast(dln1_b, ln1_b),
              cast(dln2_s, ln2_s), cast(dln2_b, ln2_b))
        if scaled:
            return (dx, jnp.zeros_like(s1), jnp.zeros_like(s2)) + dw
        return (dx,) + dw

    block_op.defvjp(fwd, bwd)
    return block_op

