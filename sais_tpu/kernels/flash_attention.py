"""Fused flash attention with key-padding masking — Pallas TPU kernels,
forward AND backward (custom VJP).

Motivation (SURVEY.md section 5.7): the reference caps sequences at 2000
frames and runs O(L^2) vanilla attention in the 4-layer temporal encoder,
materializing full (L, L) weight matrices because a hand-patched torch
module must return them (README.md:43-48).  For long-video step recognition
we instead fuse QK^T -> masked online softmax -> @V in VMEM (no HBM weight
materialization).  The only attention row SAIS actually *exports* is the
CLS query's (frame-importance attribution), which `cls_attention_row`
computes separately for O(L) cost.

Forward kernel layout: grid over (batch*heads, query blocks); K/V live in
VMEM per (batch, head) program; inner fori_loop walks key blocks with the
standard online-softmax recurrence (running max/denominator + rescaled
accumulator), also emitting the row logsumexp for the backward.

Backward: the standard two-kernel flash backward — dq over query blocks,
(dk, dv) over key blocks — recomputing p = exp(s - lse) from the saved
logsumexp instead of storing (L, L) weights.  The key-padding mask enters
as an ADDITIVE f32 bias (0 / -1e30) so the custom_vjp signature stays
fully differentiable (the bias cotangent is zero).

Head dim is zero-padded to the 128-lane boundary outside the kernels;
sequence length to lcm(block_q, block_k).

Long sequences: the plain kernels keep full-length K/V (forward) and Q/dO
(backward) VMEM-resident, which caps one program near 4k tokens at
f32/Dh<=128 (measured Lp=8704 overflow on v5e with double buffering).
flash_attention transparently switches to a CHUNKED core past that: K/V
split into VMEM-sized slices merged by the online-softmax recurrence, the
backward tiled over (query chunk, key chunk) pairs from the global row
logsumexp — no length ceiling, K/V still read once forward.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                      block_k: int, scale: float):
    """One (batch*head, q-block) program.

    q_ref: (block_q, dh); k_ref/v_ref: (L, dh); bias_ref: (1, L) f32
    additive key bias (-1e30 = masked); o_ref: (block_q, dh);
    lse_ref: (1, block_q) row logsumexp of the scaled+biased scores.
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
        s = s + bias_ref[0, pl.ds(start, block_k)][None, :]
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
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[:] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, :] = (m + jnp.log(l_safe))[:, 0]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         bias_ref, dq_ref, *, block_k: int, scale: float):
    """dq for one (batch*head, q-block): dq = sum_k ds @ k * scale with
    ds = p * (do v^T - delta)."""
    q = q_ref[:].astype(jnp.float32) * scale
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[0, :][:, None]                       # (block_q, 1)
    delta = delta_ref[0, :][:, None]
    seq_len = k_ref.shape[0]
    num_kb = seq_len // block_k
    bq, dh = q_ref.shape

    def body(kb, acc):
        start = kb * block_k
        k = k_ref[pl.ds(start, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(start, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[0, pl.ds(start, block_k)][None, :]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, num_kb,
                            body, jnp.zeros((bq, dh), jnp.float32))
    dq_ref[:] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          bias_ref, dk_ref, dv_ref, *, block_q: int,
                          scale: float):
    """(dk, dv) for one (batch*head, k-block): dv = sum_q p^T do;
    dk = sum_q ds^T q * scale."""
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    bias = bias_ref[0, :][None, :]                     # (1, block_k)
    seq_len = q_ref.shape[0]
    num_qb = seq_len // block_q
    bk, dh = k_ref.shape

    def body(qb, carry):
        dk, dv = carry
        start = qb * block_q
        q = q_ref[pl.ds(start, block_q), :].astype(jnp.float32) * scale
        do = do_ref[pl.ds(start, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(start, block_q)][:, None]
        delta = delta_ref[0, pl.ds(start, block_q)][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(s + bias - lse)                    # (block_q, block_k)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk0 = jnp.zeros((bk, dh), jnp.float32)
    dv0 = jnp.zeros((bk, dh), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    # q was pre-scaled, so dk already carries one factor of `scale`
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _pad_to(x, axis, mult, value=0.0):
    n = x.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


def _run_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    """q: (B, H, Lq, Dhp); k/v: (B, H, Lk, Dhp); bias: (B, Lk).  Lq and Lk
    may differ (the chunked long-sequence path feeds K/V slices against
    the full query)."""
    b, h, lq, dhp = q.shape
    lk = k.shape[2]
    bh = b * h
    qf = q.reshape(bh, lq, dhp)
    kf = k.reshape(bh, lk, dhp)
    vf = v.reshape(bh, lk, dhp)
    bias3 = bias.reshape(b, 1, lk)
    hpb = bh // b                                   # heads per batch row
    grid = (bh, lq // block_q)
    o, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, dhp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk, dhp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk, dhp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, lk), lambda i, j: (i // hpb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, dhp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, dhp), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, bias3)
    return o.reshape(b, h, lq, dhp), lse.reshape(b, h, lq)


def _run_bwd(q, k, v, bias, o, lse, do, scale, block_q, block_k, interpret):
    """Backward over one (Lq query x Lk key) tile pair; lse must be the
    GLOBAL row logsumexp so p = exp(s + bias - lse) is the true softmax
    even when k/v are a chunk of a longer sequence (the chunked path sums
    dq over key chunks and dk/dv over query chunks — each term here)."""
    b, h, lq, dhp = q.shape
    lk = k.shape[2]
    bh = b * h
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                                    # (B, H, Lq)
    qf = q.reshape(bh, lq, dhp)
    kf = k.reshape(bh, lk, dhp)
    vf = v.reshape(bh, lk, dhp)
    dof = do.reshape(bh, lq, dhp)
    lsef = lse.reshape(bh, 1, lq)
    deltaf = delta.reshape(bh, 1, lq)
    bias3 = bias.reshape(b, 1, lk)
    hpb = bh // b                                    # heads per batch row

    full = lambda i, j: (i, 0, 0)
    blocked_q = lambda i, j: (i, j, 0)
    row_q = lambda i, j: (i, 0, j)
    bias_full = lambda i, j: (i // hpb, 0, 0)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k,
                          scale=scale),
        grid=(bh, lq // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, dhp), blocked_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk, dhp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lk, dhp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, dhp), blocked_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_q), row_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_q), row_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, lk), bias_full,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, dhp), blocked_q,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, dhp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, deltaf, bias3)

    blocked_k = lambda i, j: (i, j, 0)
    bias_k = lambda i, j: (i // hpb, 0, j)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                          scale=scale),
        grid=(bh, lk // block_k),
        in_specs=[
            pl.BlockSpec((None, lq, dhp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, dhp), blocked_k,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, dhp), blocked_k,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lq, dhp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, lq), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, lq), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k), bias_k,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, dhp), blocked_k,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, dhp), blocked_k,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk, dhp), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, dhp), v.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, deltaf, bias3)
    return (dq.reshape(b, h, lq, dhp), dk.reshape(b, h, lk, dhp),
            dv.reshape(b, h, lk, dhp))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_core(q, k, v, bias, scale, block_q, block_k, interpret):
    """Padded-shape flash attention with a differentiable signature.
    q/k/v: (B, H, Lp, Dhp); bias: (B, Lp) f32 additive key bias."""
    o, _ = _run_fwd(q, k, v, bias, scale, block_q, block_k, interpret)
    return o


def _flash_core_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    o, lse = _run_fwd(q, k, v, bias, scale, block_q, block_k, interpret)
    return o, (q, k, v, bias, o, lse)


def _flash_core_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, bias, o, lse = res
    dq, dk, dv = _run_bwd(q, k, v, bias, o, lse, do, scale, block_q,
                          block_k, interpret)
    return dq, dk, dv, jnp.zeros_like(bias)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# Chunked long-sequence path: lifts the single-program VMEM ceiling.
#
# The plain kernels hold the FULL (Lp, Dhp) K/V (forward, double-buffered
# across grid rows) and the full Q/dO (backward dkv program) in VMEM, which
# caps Lp around 8k at f32/Dh<=128 on a 16 MB-VMEM v5e (measured: Lp=8704
# overflows by 1.5 MB).  For longer sequences the sequence axis is split
# into VMEM-sized chunks OUTSIDE the kernels:
#   forward:  one _run_fwd per K/V chunk against the full (grid-blocked)
#             query, merged by the online-softmax/logsumexp recurrence —
#             the same math the ring uses across devices
#             (parallel/sequence._flash_ring_fwd_impl), here across local
#             HBM slices.  K/V are still read exactly once.
#   backward: one _run_bwd per (query chunk, key chunk) tile pair; with
#             the GLOBAL row logsumexp saved from the forward, chunkwise
#             p = exp(s + bias - lse) is the true softmax, so dq sums over
#             key chunks and dk/dv over query chunks exactly.
# HBM overhead vs the unchunked path: the (B, H, Lp, Dhp) f32 merge
# accumulators forward (read+write per chunk) and re-reading Q/dO once per
# key chunk backward — O(L * nchunks * Dh), negligible next to the O(L^2)
# score work the kernels do.
# ---------------------------------------------------------------------------

def _chunk_slices(lp: int, chunk: int):
    """Sequence split points: full chunks plus a ragged tail (the tail is
    still a block multiple because the caller pads lp to one)."""
    return [slice(s, min(s + chunk, lp)) for s in range(0, lp, chunk)]


def _chunked_fwd_impl(q, k, v, bias, scale, block_q, block_k, interpret,
                      chunk):
    b, h, lp, dhp = q.shape
    m = jnp.full((b, h, lp, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, lp, 1), jnp.float32)
    acc = jnp.zeros((b, h, lp, dhp), jnp.float32)
    for sl in _chunk_slices(lp, chunk):
        o_c, lse_c = _run_fwd(q, k[:, :, sl], v[:, :, sl], bias[:, sl],
                              scale, block_q, block_k, interpret)
        lse_c = lse_c[..., None]                          # (B, H, Lp, 1)
        m_new = jnp.maximum(m, lse_c)
        alpha = jnp.exp(m - m_new)
        w_c = jnp.exp(lse_c - m_new)
        l = l * alpha + w_c
        acc = acc * alpha + o_c.astype(jnp.float32) * w_c
        m = m_new
    l_safe = jnp.maximum(l, 1e-30)
    out = (acc / l_safe).astype(q.dtype)
    lse = (m + jnp.log(l_safe))[..., 0]                   # (B, H, Lp) global
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_core_chunked(q, k, v, bias, scale, block_q, block_k, interpret,
                        chunk):
    out, _ = _chunked_fwd_impl(q, k, v, bias, scale, block_q, block_k,
                               interpret, chunk)
    return out


def _flash_core_chunked_fwd(q, k, v, bias, scale, block_q, block_k,
                            interpret, chunk):
    out, lse = _chunked_fwd_impl(q, k, v, bias, scale, block_q, block_k,
                                 interpret, chunk)
    return out, (q, k, v, bias, out, lse)


def _tiled_bwd(q, k, v, bias, o, lse, do, scale, block_q, block_k,
               interpret, chunk):
    """Flash backward tiled over (query chunk, key chunk) pairs so no
    single kernel program holds more than `chunk` tokens of K/V (dq pass)
    or Q/dO (dkv pass) in VMEM.  `lse` is the GLOBAL row logsumexp over
    the full key axis of `k` — with it, chunkwise p = exp(s + bias - lse)
    is the true softmax and the partial sums are exact.  Shared by the
    chunked single-device core and the ring's beyond-VMEM local chunks
    (parallel/sequence._flash_ring_bwd)."""
    slices_q = _chunk_slices(q.shape[2], chunk)
    slices_k = _chunk_slices(k.shape[2], chunk)
    nc = len(slices_k)
    dq_parts = []
    dk_parts = [None] * nc
    dv_parts = [None] * nc
    for sq in slices_q:                                   # query chunks
        dq_c = None
        for ci, sk in enumerate(slices_k):                # key chunks
            dq_p, dk_p, dv_p = _run_bwd(
                q[:, :, sq], k[:, :, sk], v[:, :, sk], bias[:, sk],
                o[:, :, sq], lse[:, :, sq], do[:, :, sq],
                scale, block_q, block_k, interpret)
            dq_c = (dq_p.astype(jnp.float32) if dq_c is None
                    else dq_c + dq_p.astype(jnp.float32))
            dk_parts[ci] = (dk_p.astype(jnp.float32) if dk_parts[ci] is None
                            else dk_parts[ci] + dk_p.astype(jnp.float32))
            dv_parts[ci] = (dv_p.astype(jnp.float32) if dv_parts[ci] is None
                            else dv_parts[ci] + dv_p.astype(jnp.float32))
        dq_parts.append(dq_c)
    dq = (jnp.concatenate(dq_parts, axis=2) if len(dq_parts) > 1
          else dq_parts[0]).astype(q.dtype)
    dk = (jnp.concatenate(dk_parts, axis=2) if nc > 1
          else dk_parts[0]).astype(k.dtype)
    dv = (jnp.concatenate(dv_parts, axis=2) if nc > 1
          else dv_parts[0]).astype(v.dtype)
    return dq, dk, dv


def _flash_core_chunked_bwd(scale, block_q, block_k, interpret, chunk, res,
                            do):
    q, k, v, bias, o, lse = res
    dq, dk, dv = _tiled_bwd(q, k, v, bias, o, lse, do, scale, block_q,
                            block_k, interpret, chunk)
    return dq, dk, dv, jnp.zeros_like(bias)


_flash_core_chunked.defvjp(_flash_core_chunked_fwd, _flash_core_chunked_bwd)


def _vmem_chunk_tokens(dhp: int, itemsize: int, block_step: int) -> int:
    """Largest per-chunk token count whose kernel working set fits VMEM.

    The binding buffers are the forward's double-buffered K+V (4 x chunk x
    dhp x itemsize) and the backward dkv program's full Q+dO at the same
    chunk length; budget ~8 MB of the 16 MB VMEM for them, leaving room
    for score blocks, bias rows and the output pipeline."""
    budget = 8 * 1024 * 1024
    tokens = budget // (4 * dhp * itemsize)
    return max((tokens // block_step) * block_step, block_step)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_padding_mask: Optional[jnp.ndarray] = None,
                    *, block_q: int = 512, block_k: int = 512,
                    interpret: bool = False) -> jnp.ndarray:
    """Masked multi-head attention without materializing (L, L) weights.

    q, k, v: (B, H, L, Dh); key_padding_mask: (B, L) bool, True = pad.
    Query is pre-scaled by Dh**-0.5 inside (torch MultiheadAttention
    convention).  Returns (B, H, L, Dh) in q's dtype.  Differentiable:
    the backward runs the two-kernel Pallas flash backward (dq over query
    blocks; dk/dv over key blocks) from the saved row logsumexp.
    """
    b, h, l, dh = q.shape
    scale = dh ** -0.5
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, l), bool)
    bias = jnp.where(key_padding_mask, _NEG_INF, 0.0).astype(jnp.float32)

    # clamp blocks to the (128-aligned) sequence so a forced-flash SHORT
    # sequence doesn't pad all the way to the default 512-block
    lmax = max(l + ((-l) % 128), 128)
    block_q = min(block_q, lmax)
    block_k = min(block_k, lmax)

    # pad L to a multiple of BOTH blocks (floor-dividing the key loop by
    # block_k would silently drop trailing keys otherwise) and Dh to the
    # 128-lane boundary
    step = math.lcm(block_q, block_k)
    dhp = dh + ((-dh) % 128)

    # VMEM ceiling: the plain kernels hold full (Lp, Dhp) K/V (forward,
    # double-buffered) and full Q/dO (backward dkv program) in VMEM —
    # measured overflow at Lp=8704 f32/Dhp=128 on v5e.  Past the fitting
    # length, split the sequence into VMEM-sized chunks and merge by the
    # online-softmax recurrence (_flash_core_chunked) — same math, no
    # length ceiling, K/V still read once.
    chunk = _vmem_chunk_tokens(dhp, q.dtype.itemsize, step)
    q = _pad_to(q, 2, step)
    k = _pad_to(k, 2, step)
    v = _pad_to(v, 2, step)
    bias = _pad_to(bias, 1, step, value=_NEG_INF)
    q = _pad_to(q, 3, 128)
    k = _pad_to(k, 3, 128)
    v = _pad_to(v, 3, 128)

    if q.shape[2] <= chunk:
        out = _flash_core(q, k, v, bias, scale, block_q, block_k, interpret)
    else:
        out = _flash_core_chunked(q, k, v, bias, scale, block_q, block_k,
                                  interpret, chunk)
    # A batch element whose keys are ALL masked has no valid softmax: the
    # additive -1e30 bias cancels inside exp(s + bias - lse) and the
    # kernels would return an unmasked-softmax average (and the backward
    # O(L)-magnitude garbage dk/dv).  Define the output as zeros instead;
    # the multiply also zeroes the cotangent flowing into the core for
    # those rows, so dq/dk/dv stay zero.  (Unreachable from the production
    # model — the CLS slot is never padded — but ragged callers exist.)
    any_valid = ~jnp.all(key_padding_mask, axis=-1)          # (B,)
    out = out * any_valid[:, None, None, None].astype(out.dtype)
    return out[:, :, :l, :dh]


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
