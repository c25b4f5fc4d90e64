"""Fused DINO last-layer + loss: weight-normed prototype matmul,
log-softmax, pair-summed cross-entropy AND its gradients in two Pallas
passes over prototype tiles — the (rows, out_dim) logits tensor never
touches HBM.

Reference semantics (dino-main/main_dino.py:581-634 DINOLoss +
vision_transformer.py:257-291 DINOHead.last_layer): student logits
l = h_s @ (v/||v||) (columns unit-normalized, g applied only when
norm_last_layer=False), teacher probabilities
q = softmax((l_t - center)/temp_t) with stop_gradient, loss = mean over
pairs (iq, v), v != iq, of -q_iq . log_softmax(l_v / temp_s).

Why fuse: at out_dim 65536 and 640 student rows the XLA pipeline
materializes the f32 logits (168 MB), its log_softmax, the loss
elementwise passes AND the backward's dlogits — ~0.7 GB of HBM round
trips for ~90 GFLOP of matmul (measured 8.5 ms of the 89 ms DINO step on
v5e).  Here the out_dim axis is tiled (grid over K/block):

  pass 1 (_stats_kernel):  per-tile logits for student and teacher merged
      into running row (max, sumexp) — the online-softmax recurrence —
      plus the teacher-logit column means (the DINOLoss batch center).
  pass 2 (_grad_kernel):   logits recomputed per tile; with the GLOBAL
      row logsumexps the tile's softmax terms are exact, so the kernel
      emits the loss, dL/dh_s and dL/dv (through the column norm) in one
      sweep.  dlogits lives only as a (rows, block) VMEM temporary.

The pair structure (which teacher crop pairs with which student row, the
v != iq exclusion) is encoded OUTSIDE as a constant selection matrix
S (rows_s, rows_t): qbar = S @ q gives each student row its summed
teacher target and c = S @ 1 its pair count — the reference's double
crop loop becomes one small matmul per tile.

Gradient math (loss wrt raw student logits L_v, p = softmax(L/temp_s)):
  dL   = (c * p - qbar) / (temp_s * B * n_terms)
  dh_s = dL @ w^T;  dw = h_s^T @ dL
  dv   = (dw' - u (u . dw')) / ||v||  with u = v/||v||,
         dw' = dw * g and dg = u . dw when norm_last_layer=False
Teacher tensors receive no gradient (stop_gradient + EMA update).

HBM traffic per step: v read twice (f32), dv written once, everything
else O(rows * bottleneck) — vs ~10 full logits-sized passes unfused.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def build_pair_structure(batch: int, n_global: int,
                         n_local: int) -> Tuple[np.ndarray, np.ndarray]:
    """Selection matrix S (rows_s, rows_t) and pair counts c (rows_s, 1).

    Rows are IMAGE-major ([img0crop0, img0crop1, ...] — the layout
    ops/augment.multi_crop_batch produces and train/dino.forward's
    regroup assumes): student row r of the global group is (img, crop) =
    divmod(r, n_global), of the local group (img, n_global + crop) =
    divmod(r - n_global*batch, n_local).  S[r, t] = 1 iff teacher row t
    shares r's image and its crop index differs (the v != iq exclusion,
    main_dino.py:610-612)."""
    rows_s = (n_global + n_local) * batch
    rows_t = n_global * batch
    s = np.zeros((rows_s, rows_t), np.float32)
    for r in range(rows_s):
        if r < n_global * batch:
            img, v = divmod(r, n_global)
        else:
            img, v = divmod(r - n_global * batch, n_local)
            v += n_global
        for iq in range(n_global):
            if iq != v:
                s[r, img * n_global + iq] = 1.0
    return s, s.sum(axis=1, keepdims=True).astype(np.float32)


def _normed_w(v, g_ref, use_g: bool):
    """w = v / ||v||_col [* g], plus (u, n) for the backward.

    The column norm clamps at 1e-12 like F.normalize's eps — a collapsed
    column yields zeros, not NaNs (same guard as dino_head_forward)."""
    n = jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)), 1e-12)
    u = v / n
    w = u * g_ref[:] if use_g else u
    return w, u, n


def _stats_kernel(hs_ref, ht_ref, vs_ref, vt_ref, gs_ref, gt_ref,
                  center_ref, tt_ref, ms_ref, ls_ref, mt_ref, lt_ref,
                  bc_ref, *, inv_ts: float, use_g: bool):
    """Running row (max, sumexp) of student logits/temp_s and teacher
    (logits - center)/temp_t across prototype tiles, + teacher column
    means (the batch center) per tile."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ms_ref[:] = jnp.full_like(ms_ref, _NEG_INF)
        ls_ref[:] = jnp.zeros_like(ls_ref)
        mt_ref[:] = jnp.full_like(mt_ref, _NEG_INF)
        lt_ref[:] = jnp.zeros_like(lt_ref)

    dtype = hs_ref.dtype
    ws, _, _ = _normed_w(vs_ref[:], gs_ref, use_g)
    s = jax.lax.dot_general(hs_ref[:], ws.astype(dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * inv_ts
    m_new = jnp.maximum(ms_ref[:], jnp.max(s, axis=-1, keepdims=True))
    ls_ref[:] = (ls_ref[:] * jnp.exp(ms_ref[:] - m_new)
                 + jnp.sum(jnp.exp(s - m_new), axis=-1, keepdims=True))
    ms_ref[:] = m_new

    wt, _, _ = _normed_w(vt_ref[:], gt_ref, use_g)
    tl = jax.lax.dot_general(ht_ref[:], wt.astype(dtype),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    bc_ref[:] = jnp.mean(tl, axis=0, keepdims=True)
    ts = (tl - center_ref[:]) * (1.0 / tt_ref[0, 0])
    m_new = jnp.maximum(mt_ref[:], jnp.max(ts, axis=-1, keepdims=True))
    lt_ref[:] = (lt_ref[:] * jnp.exp(mt_ref[:] - m_new)
                 + jnp.sum(jnp.exp(ts - m_new), axis=-1, keepdims=True))
    mt_ref[:] = m_new


def _grad_kernel(hs_ref, ht_ref, vs_ref, vt_ref, gs_ref, gt_ref,
                 center_ref, tt_ref, lse_s_ref, lse_t_ref, sel_ref, c_ref,
                 loss_ref, dhs_ref, dvs_ref, dgs_ref, *, inv_ts: float,
                 inv_norm: float, use_g: bool):
    """Per tile: recompute logits, form exact softmax terms from the
    global row logsumexps, accumulate loss + dh_s, emit dv (and dg)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[:] = jnp.zeros_like(loss_ref)
        dhs_ref[:] = jnp.zeros_like(dhs_ref)

    dtype = hs_ref.dtype
    hs = hs_ref[:]
    ws, us, ns = _normed_w(vs_ref[:], gs_ref, use_g)
    wsb = ws.astype(dtype)
    s = jax.lax.dot_general(hs, wsb, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * inv_ts
    p = jnp.exp(s - lse_s_ref[:])

    wt, _, _ = _normed_w(vt_ref[:], gt_ref, use_g)
    tl = jax.lax.dot_general(ht_ref[:], wt.astype(dtype),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ts = (tl - center_ref[:]) * (1.0 / tt_ref[0, 0])
    q = jnp.exp(ts - lse_t_ref[:])
    qbar = jax.lax.dot_general(sel_ref[:], q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    # loss contribution: -qbar . logp with logp = s - lse; the -lse half
    # is analytic (sum_k qbar_rk = c_r) and added once outside the kernel
    # (Mosaic cannot store scalars to VMEM — keep the (1, 1) shape)
    loss_ref[:] += jnp.sum(-qbar * s).reshape(1, 1)

    dl = ((c_ref[:] * p - qbar) * (inv_ts * inv_norm)).astype(dtype)
    dhs_ref[:] += jax.lax.dot_general(dl, wsb, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dw = jax.lax.dot_general(hs, dl, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if use_g:
        dgs_ref[:] = jnp.sum(us * dw, axis=0, keepdims=True)
        du = dw * gs_ref[:]
    else:
        dgs_ref[:] = jnp.zeros_like(dgs_ref)
        du = dw
    dvs_ref[:] = (du - us * jnp.sum(us * du, axis=0, keepdims=True)) / ns


def _pick_block(k: int) -> int:
    # 512 keeps the grad pass's working set (~8 MB: two (rows, blk) f32
    # score/target tiles + two (db, blk) f32 weight tiles + accumulators)
    # comfortably under VMEM with input double buffering; 1024 measured
    # within 1 MB of the 16 MB ceiling
    for blk in (512, 256, 128):
        if k % blk == 0:
            return blk
    raise ValueError(f"out_dim {k} must be a multiple of 128 for the "
                     "fused DINO loss (use the XLA path otherwise)")


def _round_up(n: int, mult: int) -> int:
    return n + ((-n) % mult)


@functools.partial(jax.jit, static_argnames=("student_temp", "inv_norm",
                                             "use_g", "interpret"))
def _fused_loss_and_grads(hs, ht, vs, vt, gs, gt, center, temp_t, sel, c,
                          *, student_temp: float, inv_norm: float,
                          use_g: bool, interpret: bool = False):
    """(loss, batch_center, dhs, dvs, dgs): loss + gradients wrt
    (hs, vs, gs); teacher inputs receive none (stop_gradient semantics).

    inv_norm = 1 / (B * n_terms) — the reference's per-pair batch mean
    over the row-sum form (each (iq, v) pair appears once per image)."""
    rs, db = hs.shape
    rt = ht.shape[0]
    k = vs.shape[1]
    blk = _pick_block(k)
    # rows pad to the f32 sublane tile; padded STUDENT rows carry c=0 and
    # S=0 so their loss terms and dlogits vanish identically; padded
    # TEACHER rows are excluded by S's zero columns and corrected out of
    # the batch-center mean below
    rsp, rtp = max(_round_up(rs, 8), 8), max(_round_up(rt, 8), 8)
    if rsp != rs:
        hs = jnp.pad(hs, ((0, rsp - rs), (0, 0)))
        sel = jnp.pad(sel, ((0, rsp - rs), (0, 0)))
        c = jnp.pad(c, ((0, rsp - rs), (0, 0)))
    if rtp != rt:
        ht = jnp.pad(ht, ((0, rtp - rt), (0, 0)))
        sel = jnp.pad(sel, ((0, 0), (0, rtp - rt)))

    hs = hs.astype(jnp.bfloat16)
    ht = ht.astype(jnp.bfloat16)
    vs32 = vs.astype(jnp.float32)
    vt32 = vt.astype(jnp.float32)
    gs2 = gs.reshape(1, k).astype(jnp.float32)
    gt2 = gt.reshape(1, k).astype(jnp.float32)
    center2 = center.reshape(1, k).astype(jnp.float32)
    tt = jnp.asarray(temp_t, jnp.float32).reshape(1, 1)
    sel = sel.astype(jnp.float32)
    c = c.astype(jnp.float32)

    grid = (k // blk,)
    tile = lambda shape: pl.BlockSpec(shape, lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    inv_ts = 1.0 / student_temp

    ms, ls, mt, lt, bc = pl.pallas_call(
        functools.partial(_stats_kernel, inv_ts=inv_ts, use_g=use_g),
        grid=grid,
        in_specs=[const((rsp, db)), const((rtp, db)),
                  tile((db, blk)), tile((db, blk)),
                  tile((1, blk)), tile((1, blk)), tile((1, blk)),
                  const((1, 1))],
        out_specs=[const((rsp, 1)), const((rsp, 1)),
                   const((rtp, 1)), const((rtp, 1)), tile((1, blk))],
        out_shape=[jax.ShapeDtypeStruct((rsp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rsp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rtp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rtp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, k), jnp.float32)],
        interpret=interpret,
    )(hs, ht, vs32, vt32, gs2, gt2, center2, tt)

    lse_s = ms + jnp.log(jnp.maximum(ls, 1e-30))
    lse_t = mt + jnp.log(jnp.maximum(lt, 1e-30))
    # the kernel means over rtp rows incl. zero padding; rescale to rt
    batch_center = bc[0] * (rtp / rt)

    loss_acc, dhs, dvs, dgs = pl.pallas_call(
        functools.partial(_grad_kernel, inv_ts=inv_ts, inv_norm=inv_norm,
                          use_g=use_g),
        grid=grid,
        in_specs=[const((rsp, db)), const((rtp, db)),
                  tile((db, blk)), tile((db, blk)),
                  tile((1, blk)), tile((1, blk)), tile((1, blk)),
                  const((1, 1)), const((rsp, 1)), const((rtp, 1)),
                  const((rsp, rtp)), const((rsp, 1))],
        out_specs=[const((1, 1)), const((rsp, db)),
                   tile((db, blk)), tile((1, blk))],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rsp, db), jnp.float32),
                   jax.ShapeDtypeStruct((db, k), jnp.float32),
                   jax.ShapeDtypeStruct((1, k), jnp.float32)],
        interpret=interpret,
    )(hs, ht, vs32, vt32, gs2, gt2, center2, tt, lse_s, lse_t, sel, c)

    # loss = (sum_rows -qbar.s  +  sum_rows c*lse) / (B * n_terms)
    loss = (loss_acc[0, 0] + jnp.sum(c * lse_s)) * inv_norm
    return loss, batch_center, dhs[:rs], dvs, dgs[0]


def make_fused_dino_loss(student_temp: float, batch: int, n_global: int,
                         n_crops: int, norm_last_layer: bool = True,
                         interpret=None):
    """Factory: fused last-layer + DINO loss with a custom VJP.

    Returns fn(hs, vs, gs, ht, vt, gt, center, temp_t, sel, c)
    -> (loss, batch_center) where hs/ht are the L2-normalized bottleneck
    outputs (dino_head_bottleneck), vs/gs the student last layer, vt/gt
    the teacher's, and (sel, c) come from build_pair_structure.
    Gradients flow to hs, vs (and gs when norm_last_layer=False) only —
    the backward is FREE: the grad pass already ran in the forward and
    the VJP just scales the stashed tensors by the loss cotangent."""
    n_terms = n_global * (n_crops - 1)
    inv_norm = 1.0 / (batch * n_terms)
    use_g = not norm_last_layer
    if interpret is None:       # auto: interpret off-TPU (CPU tests)
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def op(hs, vs, gs, ht, vt, gt, center, temp_t, sel, c):
        loss, bc, *_ = _fused_loss_and_grads(
            hs, ht, vs, vt, gs, gt, center, temp_t, sel, c,
            student_temp=student_temp, inv_norm=inv_norm, use_g=use_g,
            interpret=interpret)
        return loss, bc

    def fwd(hs, vs, gs, ht, vt, gt, center, temp_t, sel, c):
        loss, bc, dhs, dvs, dgs = _fused_loss_and_grads(
            hs, ht, vs, vt, gs, gt, center, temp_t, sel, c,
            student_temp=student_temp, inv_norm=inv_norm, use_g=use_g,
            interpret=interpret)
        # the teacher-side primals ride along only so bwd can emit
        # correctly-shaped/dtyped zero cotangents (stop_gradient
        # semantics); inside one jit step they are the same buffers
        res = (dhs.astype(hs.dtype), dvs.astype(vs.dtype),
               dgs.astype(gs.dtype), (ht, vt, gt, center, temp_t, sel, c))
        return (loss, bc), res

    def bwd(res, cts):
        gl, _ = cts       # batch_center is consumed via has_aux: no grad
        dhs, dvs, dgs, others = res
        zs = tuple(jnp.zeros_like(x) for x in others)
        return (gl * dhs, gl * dvs, gl * dgs) + zs

    op.defvjp(fwd, bwd)
    return op


def make_fused_dino_loss_dp(student_temp: float, local_batch: int,
                            n_global: int, n_crops: int, mesh,
                            axes: Tuple[str, ...] = ("data",),
                            norm_last_layer: bool = True, interpret=None):
    """Data-parallel fused last-layer + DINO loss over a device mesh.

    The loss is a sum over student rows and rows are batch-sharded, so
    the kernel runs PER SHARD under shard_map and three psums over the
    data axes stitch the shards together — exactly the reference's own
    distributed pattern (DDP gradient all-reduce + the DINOLoss center
    dist.all_reduce, main_dino.py:630-631), moved inside one jit step:

      loss   = psum(local pair-CE sums) / (global_B * n_terms)
      center = psum(local teacher-logit column means) / n_shards
      dv, dg = psum(local last-layer grad contributions)

    dh_s stays sharded (each row's gradient lives on its own shard).
    The per-shard pair structure is IDENTICAL on every shard (pairing is
    per-image and shards hold whole images), so sel/c are baked in as
    constants for local_batch images instead of being sharded on both
    axes of one global matrix.

    Returns fn(hs_g, hs_l, vs, gs, ht, vt, gt, center, temp_t)
    -> (loss, batch_center): hs_g (n_global*B, db) and hs_l
    (n_local*B, db) are the student bottleneck rows per resolution group
    (kept separate so a contiguous row shard = one image subset's
    image-major rows; the concatenated layout happens inside the body),
    ht the teacher rows, all batch-sharded on `axes`; vs/gs/vt/gt/center
    replicated.  Gradients flow to hs_g, hs_l, vs (and gs when
    norm_last_layer=False) only.
    """
    from jax.sharding import PartitionSpec as P

    n_local = n_crops - n_global
    n_terms = n_global * (n_crops - 1)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    global_batch = local_batch * n_shards
    inv_norm = 1.0 / (global_batch * n_terms)
    use_g = not norm_last_layer
    if interpret is None:       # auto: interpret off-TPU (CPU tests)
        interpret = jax.default_backend() != "tpu"
    sel_np, c_np = build_pair_structure(local_batch, n_global, n_local)
    sel_c, cnt_c = jnp.asarray(sel_np), jnp.asarray(c_np)
    n_gr = n_global * local_batch   # local global-crop student rows

    def body(hs_g, hs_l, vs, gs, ht, vt, gt, center, temp_t):
        hs = (jnp.concatenate([hs_g, hs_l], 0) if hs_l.shape[0]
              else hs_g)
        loss, bc, dhs, dvs, dgs = _fused_loss_and_grads(
            hs, ht, vs, vt, gs, gt, center, temp_t, sel_c, cnt_c,
            student_temp=student_temp, inv_norm=inv_norm, use_g=use_g,
            interpret=interpret)
        loss = jax.lax.psum(loss, axes)
        bc = jax.lax.psum(bc, axes) / n_shards  # mean of equal-size shards
        dvs = jax.lax.psum(dvs, axes)
        dgs = jax.lax.psum(dgs, axes)
        return loss, bc, dhs[:n_gr], dhs[n_gr:], dvs, dgs

    pd, pr = P(axes), P()
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pd, pd, pr, pr, pd, pr, pr, pr, pr),
        out_specs=(pr, pr, pd, pd, pr, pr), check_vma=False)

    @jax.custom_vjp
    def op(hs_g, hs_l, vs, gs, ht, vt, gt, center, temp_t):
        loss, bc, *_ = sharded(hs_g, hs_l, vs, gs, ht, vt, gt, center,
                               temp_t)
        return loss, bc

    def fwd(hs_g, hs_l, vs, gs, ht, vt, gt, center, temp_t):
        loss, bc, dhs_g, dhs_l, dvs, dgs = sharded(
            hs_g, hs_l, vs, gs, ht, vt, gt, center, temp_t)
        res = (dhs_g.astype(hs_g.dtype), dhs_l.astype(hs_l.dtype),
               dvs.astype(vs.dtype), dgs.astype(gs.dtype),
               (ht, vt, gt, center, temp_t))
        return (loss, bc), res

    def bwd(res, cts):
        gl, _ = cts       # batch_center is consumed via has_aux: no grad
        dhs_g, dhs_l, dvs, dgs, others = res
        zs = tuple(jnp.zeros_like(x) for x in others)
        return (gl * dhs_g, gl * dhs_l, gl * dvs, gl * dgs) + zs

    op.defvjp(fwd, bwd)
    return op


__all__ = ["build_pair_structure", "make_fused_dino_loss",
           "make_fused_dino_loss_dp"]
