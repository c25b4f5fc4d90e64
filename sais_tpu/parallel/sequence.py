"""Sequence (context) parallelism: ring attention over a mesh 'seq' axis.

The reference handles long videos purely by SUBSAMPLING — a hard
2000-frame cap (prepare_dataset.py:2437) matched to a 2000-slot learned
pos-emb table (prepare_model.py:65-71) and O(F^2) vanilla attention in the
4-layer temporal encoder; there is no sequence parallelism of any kind
(SURVEY.md §5.7).  The single-chip Pallas flash path (kernels/
flash_attention.py) already removes the (L, L) HBM materialization at any
length (VMEM-chunked past ~4k f32 tokens).  This module removes the
*single-chip* FLOP/HBM ceiling: the time axis is sharded over a mesh axis
and attention runs as a
RING — each device holds one K/V chunk, chunks rotate around the ring via
`ppermute` (neighbor ICI hops, never DCN), and every device folds each
visiting chunk into a running online-softmax state.  Per-device memory is
O(L/n) activations + one O((L/n)^2) score block per step; no device ever
sees the full sequence.

Contracts preserved from the dense/flash paths (models/temporal.py):
- math identical to torch nn.MultiheadAttention eval semantics (q scaled
  by Dh**-0.5, key-padding mask -> -inf before softmax, f32 softmax);
- the export artifact is the LAST layer's head-averaged CLS-query
  attention row (prepare_model.py:213,221) — computed here with a
  collective softmax (pmax/psum of the row stats), exactly matching
  `kernels.flash_attention.cls_attention_row`;
- fully differentiable: plain jax ops + ppermute, so the VJP is another
  ring (reverse permutation), enabling sequence-parallel TRAINING.

Layout: shard_map over a ('seq',) axis (composable with a leading data
axis — see `seq_mesh`).  Inputs are global (B, L, D) arrays; L is padded
to a multiple of the axis size with masked keys.  Position 0 (the CLS
slot, never padded) lives on ring rank 0.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sais_tpu.config import TemporalConfig

Params = Dict[str, Any]

SEQ_AXIS = "seq"

_NEG_INF = -1e30


def seq_mesh(n_seq: int, n_data: int = 1,
             devices=None) -> Mesh:
    """('data', 'seq') mesh: batch splits over 'data', time over 'seq'.

    Sequence shards are ICI neighbors (innermost axis) so the ring's
    ppermute hops ride the fastest links; with n_data=1 this is a pure
    sequence-parallel mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_seq * n_data != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_seq} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, ("data", SEQ_AXIS))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_ring_core(q, k, v, bias, axis_name, axis_size, scale, blk,
                     interpret):
    """Ring attention over flash-kernel chunks, differentiable.

    q/k/v: (B, H, Lp, Dhp) padded local shards; bias: (B, Lp) f32 additive
    key bias for THIS device's chunk.  Lp is a multiple of `blk`, Dhp of
    128 (the caller pads).  Returns (B, H, Lp, Dhp) in q's dtype.

    Forward: each visiting K/V chunk runs through the Pallas flash forward
    (`_run_fwd`); chunks merge by logsumexp (see _ring_attention_local).
    Backward: a second ring.  With the GLOBAL row logsumexp saved from the
    forward, the per-chunk probabilities p_c = exp(s_c - lse) are the true
    softmax values, so the standard two-kernel flash backward applies
    chunkwise: ds_c = p_c*(do v_c^T - delta), dq += ds_c k_c * scale,
    dk_c = ds_c^T q * scale, dv_c = p_c^T do.  dk_c/dv_c accumulate in f32
    carried WITH the chunk around the ring; after axis_size
    process+permute steps every chunk (and its gradient) is back on its
    home device.  No (Lloc, Lloc) block is ever materialized in HBM in
    either direction.
    """
    out, _ = _flash_ring_fwd_impl(q, k, v, bias, axis_name, axis_size,
                                  scale, blk, interpret)
    return out


def _ring_local_chunk(lp: int, dhp: int, itemsize: int, blk: int) -> int:
    """VMEM-safe per-kernel token count for the ring's LOCAL chunk.

    A device's shard can itself exceed the plain flash kernels' VMEM
    working set (full K/V forward, full Q/dO in the backward dkv
    program) — e.g. a 1-device 'ring' over L=8192 f32 (Lp 8704) overflows
    scoped vmem by 1.5 MB.  Past the fitting length the per-step kernel
    calls run the CHUNKED core (the same online-softmax merge, applied to
    local HBM slices inside each ring step).  Returns the chunk length,
    or 0 when the plain kernels fit."""
    from sais_tpu.kernels.flash_attention import _vmem_chunk_tokens
    chunk = _vmem_chunk_tokens(dhp, itemsize, blk)
    return chunk if lp > chunk else 0


def _flash_ring_fwd_impl(q, k, v, bias, axis_name, axis_size, scale, blk,
                         interpret):
    from sais_tpu.kernels.flash_attention import _chunked_fwd_impl, _run_fwd
    b, h, lp, dhp = q.shape
    chunk = _ring_local_chunk(lp, dhp, q.dtype.itemsize, blk)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    m = jnp.full((b, h, lp, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, lp, 1), jnp.float32)
    acc = jnp.zeros((b, h, lp, dhp), jnp.float32)
    kc, vc, bc = k, v, bias
    for step in range(axis_size):
        if step + 1 < axis_size:
            k_nxt = jax.lax.ppermute(kc, axis_name, perm)
            v_nxt = jax.lax.ppermute(vc, axis_name, perm)
            bias_nxt = jax.lax.ppermute(bc, axis_name, perm)
        if chunk:
            # (out, lse) of the visiting chunk, assembled from VMEM-sized
            # slices — the same (o_c, lse_c) contract _run_fwd returns
            o_c, lse_c = _chunked_fwd_impl(q, kc, vc, bc, scale, blk, blk,
                                           interpret, chunk)
        else:
            o_c, lse_c = _run_fwd(q, kc, vc, bc, scale, blk, blk, interpret)
        lse_c = lse_c[..., None]                          # (B, H, Lp, 1)
        m_new = jnp.maximum(m, lse_c)
        alpha = jnp.exp(m - m_new)
        w_c = jnp.exp(lse_c - m_new)
        l = l * alpha + w_c
        acc = acc * alpha + o_c.astype(jnp.float32) * w_c
        m = m_new
        if step + 1 < axis_size:
            kc, vc, bc = k_nxt, v_nxt, bias_nxt
    l_safe = jnp.maximum(l, 1e-30)
    out = (acc / l_safe).astype(q.dtype)
    lse = (m + jnp.log(l_safe))[..., 0]                   # (B, H, Lp) global
    return out, lse


def _flash_ring_fwd(q, k, v, bias, axis_name, axis_size, scale, blk,
                    interpret):
    out, lse = _flash_ring_fwd_impl(q, k, v, bias, axis_name, axis_size,
                                    scale, blk, interpret)
    return out, (q, k, v, bias, out, lse)


def _flash_ring_bwd(axis_name, axis_size, scale, blk, interpret, res, do):
    from sais_tpu.kernels.flash_attention import _run_bwd, _tiled_bwd
    q, k, v, bias, out, lse = res
    b, h, lp, dhp = q.shape
    chunk = _ring_local_chunk(lp, dhp, q.dtype.itemsize, blk)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    dq = jnp.zeros(q.shape, jnp.float32)
    # the chunk's gradients ride the ring with it (f32 accumulators);
    # after axis_size process+permute rounds they land back home
    kc, vc, bc = k, v, bias
    dkc = jnp.zeros(k.shape, jnp.float32)
    dvc = jnp.zeros(v.shape, jnp.float32)
    for _ in range(axis_size):
        if chunk:
            # lse is the ring-global row logsumexp, so the tiled partial
            # sums are exact (same argument as the chunked local core)
            dq_c, dk_c, dv_c = _tiled_bwd(q, kc, vc, bc, out, lse, do,
                                          scale, blk, blk, interpret,
                                          chunk)
        else:
            dq_c, dk_c, dv_c = _run_bwd(q, kc, vc, bc, out, lse, do, scale,
                                        blk, blk, interpret)
        dq = dq + dq_c.astype(jnp.float32)
        dkc = dkc + dk_c.astype(jnp.float32)
        dvc = dvc + dv_c.astype(jnp.float32)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        bc = jax.lax.ppermute(bc, axis_name, perm)
        dkc = jax.lax.ppermute(dkc, axis_name, perm)
        dvc = jax.lax.ppermute(dvc, axis_name, perm)
    return (dq.astype(q.dtype), dkc.astype(k.dtype), dvc.astype(v.dtype),
            jnp.zeros_like(bias))


_flash_ring_core.defvjp(_flash_ring_fwd, _flash_ring_bwd)


def _ring_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: jnp.ndarray, axis_name: str,
                          axis_size: int, chunk_flash: bool = False,
                          interpret: bool = False) -> jnp.ndarray:
    """Ring attention on local shards (inside shard_map).

    q, k, v: (B, H, Lloc, Dh) — this device's query block and its CURRENT
    K/V chunk; bias: (B, Lloc) f32 additive key bias (0 valid / -1e30 pad)
    for the chunk, which travels around the ring WITH the chunk.
    Returns (B, H, Lloc, Dh) in q's dtype.

    Online-softmax merge (the flash recurrence, chunk granularity = one
    device's shard): running max m, denominator l, rescaled accumulator.
    The next chunk's ppermute is issued BEFORE the current chunk's math so
    XLA's latency-hiding scheduler can overlap the ICI hop with compute.

    chunk_flash: run each chunk through the fused Pallas flash kernels
    (kernels/flash_attention) instead of an explicit score einsum.  The
    kernel's row logsumexp makes the merge exact: unnormalized chunk sums
    are o_i*exp(lse_i) with denominator exp(lse_i), so acc +=
    o_i*exp(lse_i - M), l += exp(lse_i - M).  This avoids materializing
    the (B, H, Lloc, Lloc) score block per ring step — at the beyond-VMEM
    lengths sequence parallelism targets, that block is the dominant HBM
    cost.  Differentiable: `_flash_ring_core` carries a custom VJP whose
    backward is a second ring (see its docstring), so training takes this
    path too.
    """
    b, h, lloc, dh = q.shape
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    if chunk_flash:
        from sais_tpu.kernels.flash_attention import _pad_to
        blk = min(512, max(128, lloc + ((-lloc) % 128)))
        qp = _pad_to(q, 2, blk)
        kp = _pad_to(k, 2, blk)
        vp = _pad_to(v, 2, blk)
        biasp = _pad_to(bias, 1, blk, value=_NEG_INF)
        qp = _pad_to(qp, 3, 128)
        kp = _pad_to(kp, 3, 128)
        vp = _pad_to(vp, 3, 128)
        out = _flash_ring_core(qp, kp, vp, biasp, axis_name, axis_size,
                               dh ** -0.5, blk, interpret)
        out = out[:, :, :lloc, :dh]
    else:
        qf = q.astype(jnp.float32) * (dh ** -0.5)
        m = jnp.full((b, h, lloc, 1), _NEG_INF, jnp.float32)
        l = jnp.zeros((b, h, lloc, 1), jnp.float32)
        acc = jnp.zeros((b, h, lloc, dh), jnp.float32)
        for step in range(axis_size):
            if step + 1 < axis_size:
                k_nxt = jax.lax.ppermute(k, axis_name, perm)
                v_nxt = jax.lax.ppermute(v, axis_name, perm)
                bias_nxt = jax.lax.ppermute(bias, axis_name, perm)
            s = jnp.einsum("bhld,bhmd->bhlm", qf, k.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            s = s + bias[:, None, None, :]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bhlm,bhmd->bhld", p, v.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            m = m_new
            if step + 1 < axis_size:
                k, v, bias = k_nxt, v_nxt, bias_nxt
        out = acc / jnp.maximum(l, 1e-30)

    # a GLOBALLY all-masked batch row has s = -1e30 at every key, so the
    # recurrence degenerates to an unmasked average (same hazard the flash
    # kernel guards, flash_attention.py:356-364): define those rows as 0.
    # Unreachable from the production model (CLS is never padded).
    valid_local = jnp.any(bias > _NEG_INF * 0.5, axis=-1)        # (B,)
    any_valid = jax.lax.psum(valid_local.astype(jnp.float32), axis_name) > 0
    out = out * any_valid[:, None, None, None].astype(out.dtype)
    return out.astype(q.dtype)


def _ring_cls_row_local(q: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray,
                        axis_name: str) -> jnp.ndarray:
    """Head-averaged CLS-query attention row, sequence-sharded.

    The CLS query (global position 0) lives on ring rank 0; it is
    broadcast with one psum, each device scores it against its LOCAL keys,
    and the softmax normalizer is assembled with pmax/psum collectives.
    Returns the (B, Lloc) local shard of the (B, L) row — identical math
    to kernels.flash_attention.cls_attention_row.
    """
    dh = q.shape[-1]
    idx = jax.lax.axis_index(axis_name)
    q0 = jnp.where(idx == 0, q[:, :, 0, :], 0).astype(jnp.float32)
    q0 = jax.lax.psum(q0, axis_name) * (dh ** -0.5)              # (B, H, Dh)
    logits = jnp.einsum("bhd,bhmd->bhm", q0, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    logits = logits + bias[:, None, :]                           # (B, H, Lloc)
    # pmax has no differentiation rule, but the softmax max-subtraction is
    # gradient-neutral (any constant shift cancels in p/denom), so a
    # stop_gradient keeps the row exactly differentiable through psum
    m = jax.lax.pmax(jax.lax.stop_gradient(jnp.max(logits, axis=-1)),
                     axis_name)                                  # (B, H)
    p = jnp.exp(logits - m[..., None])
    denom = jax.lax.psum(jnp.sum(p, axis=-1), axis_name)         # (B, H)
    return jnp.mean(p / denom[..., None], axis=1)                # (B, Lloc)


def _qkv_heads(x: jnp.ndarray, p: Params, num_heads: int):
    b, lloc, d = x.shape
    dh = d // num_heads
    qkv = jnp.dot(x, p["in_w"].astype(x.dtype),
                  preferred_element_type=x.dtype) + p["in_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    to_heads = lambda a: a.reshape(b, lloc, num_heads, dh).transpose(0, 2, 1, 3)
    return to_heads(q), to_heads(k), to_heads(v)


def _encoder_local(params: Params, x: jnp.ndarray, bias: jnp.ndarray,
                   cfg: TemporalConfig, axis_name: str, axis_size: int,
                   chunk_flash: bool = False, interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Post-norm encoder stack on local sequence shards.

    Everything except attention is position-local (QKV/out projections,
    LayerNorms, the ReLU FFN all act per-token), so only the ring runs
    collectives.  x: (B, Lloc, D); bias: (B, Lloc) f32.
    Returns (x (B, Lloc, D), last layer's CLS row shard (B, Lloc)).
    """
    from sais_tpu.models.vit import _layer_norm
    n = len(params["layers"])
    cls_row = None
    for i, p in enumerate(params["layers"]):
        q, k, v = _qkv_heads(x, p["mha"], cfg.num_heads)
        y = _ring_attention_local(q, k, v, bias, axis_name, axis_size,
                                  chunk_flash=chunk_flash,
                                  interpret=interpret)
        b, h, lloc, dh = y.shape
        y = y.transpose(0, 2, 1, 3).reshape(b, lloc, h * dh)
        y = jnp.dot(y, p["mha"]["out_w"].astype(x.dtype),
                    preferred_element_type=x.dtype) \
            + p["mha"]["out_b"].astype(x.dtype)
        if i == n - 1:
            cls_row = _ring_cls_row_local(q, k, bias, axis_name)
        x = _layer_norm(x + y, p["ln1_s"], p["ln1_b"], cfg.layernorm_eps)
        hdn = jnp.dot(x, p["ff1_w"].astype(x.dtype),
                      preferred_element_type=x.dtype) \
            + p["ff1_b"].astype(x.dtype)
        hdn = jax.nn.relu(hdn)
        hdn = jnp.dot(hdn, p["ff2_w"].astype(x.dtype),
                      preferred_element_type=x.dtype) \
            + p["ff2_b"].astype(x.dtype)
        x = _layer_norm(x + hdn, p["ln2_s"], p["ln2_b"], cfg.layernorm_eps)
    return x, cls_row


def encoder_forward_seq_parallel(
        params: Params, x: jnp.ndarray, cfg: TemporalConfig,
        key_padding_mask: Optional[jnp.ndarray], mesh: Mesh,
        axis_name: str = SEQ_AXIS, chunk_flash: Optional[bool] = None,
        interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence-parallel twin of models.temporal.encoder_forward.

    x: (B, L, D) global; key_padding_mask: (B, L) bool (True = pad).  The
    time axis is padded to a multiple of mesh.shape[axis_name] (as masked
    keys) and sharded; per-token math runs locally, attention as a ring.

    chunk_flash: per-chunk fused Pallas flash attention inside the ring
    (no O((L/n)^2) score block per step, forward OR backward — the custom
    VJP runs a second ring over the flash backward kernels).  None =
    auto: on for TPU (the kernel is TPU-only unless interpret=True).

    Returns (output (B, L, D), last layer's head-averaged CLS attention
    row (B, L)) — the flash-path export contract (the full (L, L) matrix
    is exactly what sequence parallelism exists to never materialize).

    seq x data composition: when the mesh carries a 'data' axis of size
    > 1 and B divides by it, the batch dim is sharded over 'data' while
    time shards over 'seq' — each data group runs an independent ring
    over its batch shard (all ring collectives are seq-axis-only), which
    is how PrototypeTrainer trains 2x4 / 4x2 on a v5e-8.  A non-divisible
    B falls back to a replicated batch (correct, just not data-parallel).
    """
    if chunk_flash is None:
        chunk_flash = jax.default_backend() == "tpu" or interpret
    b, l, d = x.shape
    n = mesh.shape[axis_name]
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, l), bool)
    pad = (-l) % n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        key_padding_mask = jnp.pad(key_padding_mask, ((0, 0), (0, pad)),
                                   constant_values=True)
    bias = jnp.where(key_padding_mask, _NEG_INF, 0.0).astype(jnp.float32)

    n_data = dict(mesh.shape).get("data", 1)
    batch_axis = "data" if (n_data > 1 and b % n_data == 0) else None

    fn = jax.shard_map(
        functools.partial(_encoder_local, cfg=cfg, axis_name=axis_name,
                          axis_size=n, chunk_flash=chunk_flash,
                          interpret=interpret),
        mesh=mesh,
        in_specs=(P(), P(batch_axis, axis_name, None),
                  P(batch_axis, axis_name)),
        out_specs=(P(batch_axis, axis_name, None), P(batch_axis, axis_name)),
        # pallas_call (the flash-chunk path) has no varying-mesh-axes
        # annotations; skip the vma check like the pipeline's other
        # shard_map+Pallas programs (infer/pipeline.py check_vma=False)
        check_vma=False,
    )
    out, cls_row = fn(params, x, bias)
    return out[:, :l], cls_row[:, :l]


def _ring_encoder_fn(cfg, mesh: Mesh, axis_name: str,
                     chunk_flash: Optional[bool] = None):
    """temporal_features-compatible encoder override (full_model.py's
    `encoder_fn` hook) that runs the ring instead of the dense/flash
    encoder — head/pooling logic stays in full_model, so the seq-parallel
    path can never diverge from the dense one."""
    return lambda ep, x, mask: encoder_forward_seq_parallel(
        ep, x, cfg.temporal, mask, mesh, axis_name,
        chunk_flash=chunk_flash)


def seq_parallel_temporal_features(params: Params, reps: jnp.ndarray,
                                   pad_mask: Optional[jnp.ndarray],
                                   cfg, mesh: Mesh,
                                   axis_name: str = SEQ_AXIS):
    """Sequence-parallel twin of models.full_model.temporal_features:
    same function, ring encoder.  The attention artifact is the CLS row
    (B*S, F+1), matching the flash path's TemporalOutput contract
    (full_model.py:41-48)."""
    from sais_tpu.models.full_model import temporal_features
    return temporal_features(params, reps, pad_mask, cfg,
                             encoder_fn=_ring_encoder_fn(cfg, mesh,
                                                         axis_name))


def seq_parallel_prototypes_forward(params: Params, cfg,
                                    rgb: Optional[jnp.ndarray] = None,
                                    rgb_mask: Optional[jnp.ndarray] = None,
                                    flow: Optional[jnp.ndarray] = None,
                                    flow_mask: Optional[jnp.ndarray] = None,
                                    primary_domain=None,
                                    *, mesh: Mesh,
                                    axis_name: str = SEQ_AXIS):
    """Prototypes-task forward with the frame encoder sequence-sharded:
    delegates to models.full_model.prototypes_forward with the ring as
    `encoder_fn`, so every head behavior (RGB+Flow sum, multi-task
    linearB routing + its params-mismatch guard, importance head) is
    inherited rather than duplicated.  attn in the output is the CLS row.
    """
    from sais_tpu.models.full_model import prototypes_forward
    return prototypes_forward(params, cfg, rgb, rgb_mask, flow, flow_mask,
                              primary_domain=primary_domain,
                              encoder_fn=_ring_encoder_fn(cfg, mesh,
                                                          axis_name))
