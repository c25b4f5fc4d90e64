"""Fused flash attention with key-padding masking — Pallas TPU kernel.

Motivation (SURVEY.md section 5.7): the reference caps sequences at 2000
frames and runs O(L^2) vanilla attention in the 4-layer temporal encoder,
materializing full (L, L) weight matrices because a hand-patched torch
module must return them (README.md:43-48).  For long-video step recognition
we instead fuse QK^T -> masked online softmax -> @V in VMEM (no HBM weight
materialization).  The only attention row SAIS actually *exports* is the
CLS query's (frame-importance attribution), which `cls_attention_row`
computes separately for O(L) cost.

Kernel layout: grid over (batch*heads, query blocks); K/V live in VMEM per
(batch, head) program; inner fori_loop walks key blocks with the standard
online-softmax recurrence (running max/denominator + rescaled accumulator).
Head dim is zero-padded to the 128-lane boundary outside the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int,
                  scale: float):
    """One (batch*head, q-block) program.

    q_ref: (block_q, dh); k_ref/v_ref: (L, dh); mask_ref: (1, L) int32
    (1 = masked key); o_ref: (block_q, dh).
    """
    q = q_ref[:].astype(jnp.float32) * scale
    seq_len = k_ref.shape[0]
    num_kb = seq_len // block_k
    bq, dh = q_ref.shape

    def body(kb, carry):
        acc, m, l = carry
        start = kb * block_k
        k = k_ref[pl.ds(start, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(start, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = mask_ref[0, pl.ds(start, block_k)]
        s = jnp.where(mask[None, :] != 0, _NEG_INF, s)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, dh), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, mult, value=0.0):
    n = x.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_padding_mask: Optional[jnp.ndarray] = None,
                    *, block_q: int = 512, block_k: int = 512,
                    interpret: bool = False) -> jnp.ndarray:
    """Masked multi-head attention without materializing (L, L) weights.

    q, k, v: (B, H, L, Dh); key_padding_mask: (B, L) bool, True = pad.
    Query is pre-scaled by Dh**-0.5 inside (torch MultiheadAttention
    convention).  Returns (B, H, L, Dh) in q's dtype.
    """
    b, h, l, dh = q.shape
    scale = dh ** -0.5
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, l), bool)

    # pad L to a multiple of BOTH blocks (floor-dividing the key loop by
    # block_k would silently drop trailing keys otherwise) and Dh to the
    # 128-lane boundary
    import math as _math
    step = _math.lcm(block_q, block_k)
    lp = l + ((-l) % step)
    q = _pad_to(q, 2, step)
    k = _pad_to(k, 2, step)
    v = _pad_to(v, 2, step)
    mask = _pad_to(key_padding_mask.astype(jnp.int32), 1, step, value=1)
    dhp = dh + ((-dh) % 128)
    q = _pad_to(q, 3, 128)
    k = _pad_to(k, 3, 128)
    v = _pad_to(v, 3, 128)

    bh = b * h
    qf = q.reshape(bh, lp, dhp)
    kf = k.reshape(bh, lp, dhp)
    vf = v.reshape(bh, lp, dhp)
    mask3 = mask.reshape(b, 1, lp)

    grid = (bh, lp // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, dhp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lp, dhp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lp, dhp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, lp), lambda i, j: (i // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, dhp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lp, dhp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, mask3)
    return out.reshape(b, h, lp, dhp)[:, :, :l, :dh]


def cls_attention_row(q: jnp.ndarray, k: jnp.ndarray,
                      key_padding_mask: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """Head-averaged attention of the CLS query (row 0) — the quantity SAIS
    exports for attribution (prepare_model.py:221 'how cls token attends to
    all other frames').  q, k: (B, H, L, Dh) -> (B, L)."""
    dh = q.shape[-1]
    q0 = q[:, :, 0, :].astype(jnp.float32) * dh ** -0.5     # (B, H, Dh)
    logits = jnp.einsum("bhd,bhld->bhl", q0, k.astype(jnp.float32))
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, :], _NEG_INF, logits)
    return jnp.mean(jax.nn.softmax(logits, axis=-1), axis=1)
