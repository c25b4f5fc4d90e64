"""Fused multi-head attention for short sequences (ViT-S/16: L=197).

XLA's attention path materializes per-head transposes of q/k/v and the
(B, h, L, L) score/weight tensors in HBM — at ViT scale that traffic is
~60% of block time.  This kernel keeps one image's entire attention in
VMEM: it reads the qkv projection output (B, L, 3D) directly, loops over
heads with static slices, runs the f32 softmax in VMEM, and writes only the
(B, L, D) context — no intermediate ever touches HBM.

Grid: one program per batch element (L and D are small: q/k/v/out plus one
(L, L) f32 score block fit comfortably in 16 MB VMEM).  The sequence is
padded to a lane-friendly length outside; padded keys are masked with -inf
via iota comparison inside.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _mha_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int,
                valid_len: int):
    lp = qkv_ref.shape[0]
    d = num_heads * head_dim
    scale = head_dim ** -0.5
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1)
    key_mask = (key_ids >= valid_len) * _NEG_INF          # (1, Lp) f32

    for h in range(num_heads):
        q = qkv_ref[:, h * head_dim:(h + 1) * head_dim]
        k = qkv_ref[:, d + h * head_dim:d + (h + 1) * head_dim]
        v = qkv_ref[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
        s = jax.lax.dot_general(q.astype(jnp.float32) * scale,
                                k.astype(jnp.float32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + key_mask
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:, h * head_dim:(h + 1) * head_dim] = o.astype(o_ref.dtype)


def _layer_norm_f32(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale.astype(
        jnp.float32) + bias.astype(jnp.float32)


def _block_kernel(x_ref, qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b,
                  fc2_w, fc2_b, ln1_s, ln1_b, ln2_s, ln2_b, o_ref, *,
                  num_heads: int, head_dim: int, valid_len: int,
                  eps: float):
    """One full pre-norm ViT block for one image, entirely in VMEM."""
    lp, d = x_ref.shape
    x = x_ref[:]
    dtype = x.dtype
    scale = head_dim ** -0.5
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1)
    key_mask = (key_ids >= valid_len) * _NEG_INF

    y = _layer_norm_f32(x, ln1_s[:], ln1_b[:], eps).astype(dtype)
    qkv = (jax.lax.dot_general(y, qkv_w[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           .astype(dtype) + qkv_b[:])
    ctx_heads = []
    for h in range(num_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, d + h * head_dim:d + (h + 1) * head_dim]
        v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
        s = jax.lax.dot_general(q.astype(jnp.float32) * scale,
                                k.astype(jnp.float32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s + key_mask, axis=-1)
        ctx_heads.append(jax.lax.dot_general(
            p.astype(dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype))
    ctx = jnp.concatenate(ctx_heads, axis=-1)
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


@functools.partial(jax.jit, static_argnames=("num_heads", "valid_len", "eps",
                                             "interpret"))
def fused_vit_block(x: jnp.ndarray, qkv_w, qkv_b, proj_w, proj_b, fc1_w,
                    fc1_b, fc2_w, fc2_b, ln1_s, ln1_b, ln2_s, ln2_b,
                    num_heads: int, valid_len: int, eps: float = 1e-6,
                    interpret: bool = False) -> jnp.ndarray:
    """Entire pre-norm transformer block fused per image.

    x: (B, Lp, D) with Lp lane-aligned and rows >= valid_len zero-padded.
    Only x and the output touch HBM per layer; weights are VMEM-resident
    across the grid (constant index maps).
    """
    b, lp, d = x.shape
    head_dim = d // num_heads

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    weights = (qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b, fc2_w, fc2_b,
               ln1_s, ln1_b, ln2_s, ln2_b)
    return pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads,
                          head_dim=head_dim, valid_len=valid_len, eps=eps),
        grid=(b,),
        in_specs=[pl.BlockSpec((None, lp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [const_spec(w) for w in weights],
        out_specs=pl.BlockSpec((None, lp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, d), x.dtype),
        interpret=interpret,
    )(x, *weights)


def _xla_block_tanh(x, qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b, fc2_w,
                    fc2_b, ln1_s, ln1_b, ln2_s, ln2_b, num_heads: int,
                    valid_len: int, eps: float):
    """Differentiable XLA twin of _block_kernel: identical math (incl. the
    tanh GELU and padded-key masking), batch-major.  Used as the backward
    function for the trainable fused block."""
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
    x = x + o

    y = _layer_norm_f32(x, ln2_s, ln2_b, eps).astype(dtype)
    hdn = (jnp.einsum("bld,de->ble", y, fc1_w,
                      preferred_element_type=jnp.float32).astype(dtype)
           + fc1_b)
    hdn = jax.nn.gelu(hdn.astype(jnp.float32), approximate=True).astype(dtype)
    o = (jnp.einsum("bld,de->ble", hdn, fc2_w,
                    preferred_element_type=jnp.float32).astype(dtype)
         + fc2_b)
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


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_mha_short(qkv: jnp.ndarray, num_heads: int,
                    interpret: bool = False) -> jnp.ndarray:
    """qkv: (B, L, 3D) packed projection output -> (B, L, D) context.

    Unmasked self-attention (all L positions valid), q scaled by
    head_dim**-0.5 — the ViT convention (vision_transformer.py:85-89).
    """
    b, l, three_d = qkv.shape
    d = three_d // 3
    head_dim = d // num_heads
    lp = l + ((-l) % 128)
    if lp != l:
        qkv = jnp.pad(qkv, ((0, 0), (0, lp - l), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mha_kernel, num_heads=num_heads,
                          head_dim=head_dim, valid_len=l),
        grid=(b,),
        in_specs=[pl.BlockSpec((None, lp, three_d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, lp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, d), qkv.dtype),
        interpret=interpret,
    )(qkv)
    return out[:, :l, :]
