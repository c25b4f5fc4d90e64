"""RAFT optical-flow estimator — TPU-native JAX implementation.

The reference computes optical flow with ptlflow's RAFT ('things'
checkpoint) over frame pairs 15 frames apart, one CPU batch of 2 at a time
(extract_representations.py:33,264-288).  This is a from-scratch JAX
implementation of the RAFT architecture (Teed & Deng, ECCV 2020; the
ptlflow module mirrors princeton-vl/RAFT's parameter naming, which the
converter below consumes):

- feature encoder (instance-norm residual CNN, 1/8 resolution, 256-d)
  shared across both frames — batched as a single 2B conv pass;
- context encoder (batch-norm, split into 128-d GRU state + 128-d input);
- all-pairs 4-level correlation pyramid with radius-4 bilinear lookup;
- separable ConvGRU update block iterated with lax.scan (static iteration
  count -> a single compiled program, no python loop);
- convex upsampling of the 1/8-res flow with the learned 9-way mask.

TPU-first choices: NHWC layout throughout, a gather-free correlation lookup
(static-shift cross-correlation with per-query bilinear weight vectors —
pure VPU streaming, see _lookup_level_shift; >100x faster than gathers on
TPU), scan instead of unrolled python, and bf16-friendly matmuls with f32
normalization statistics.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import RAFTConfig

Params = Dict[str, Any]

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, p, stride=1):
    # torch-style symmetric k//2 padding (XLA 'SAME' pads asymmetrically for
    # strided convs, which would break checkpoint parity)
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=_DN)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def _instance_norm(x, eps=1e-5):
    """torch nn.InstanceNorm2d default: affine=False, per-sample stats."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _batch_norm(x, p, eps=1e-5):
    """Eval-mode BatchNorm2d with running statistics."""
    scale = (p["w"] * jax.lax.rsqrt(p["rv"] + eps)).astype(x.dtype)
    bias = (p["b"] - p["rm"] * p["w"] * jax.lax.rsqrt(p["rv"] + eps)).astype(x.dtype)
    return x * scale + bias


def _norm(x, p, kind):
    if kind == "instance":
        return _instance_norm(x)
    if kind == "batch":
        return _batch_norm(x, p)
    return x  # 'none'


def _fold_bn(conv_p, bn_p, eps=1e-5):
    """Fold eval-mode BatchNorm2d into the preceding conv.

    BN(conv(x, w) + b) == conv(x, w*s) + (b - rm)*s + beta with
    s = gamma * rsqrt(rv + eps): running statistics are constants at
    inference, so the whole norm collapses into the conv's weights —
    the context encoder's norm passes disappear entirely.  Exact up to
    float reassociation (folding happens in the params' f32)."""
    s = bn_p["w"] * jax.lax.rsqrt(bn_p["rv"] + eps)
    w = conv_p["w"] * s
    b = conv_p["b"] if conv_p.get("b") is not None else jnp.zeros_like(s)
    return {"w": w, "b": (b - bn_p["rm"]) * s + bn_p["b"]}


def _conv_norm(x, conv_p, norm_p, kind, stride=1):
    """conv followed by norm, with eval-mode BatchNorm folded into the
    conv's weights instead of running as separate HBM passes."""
    if kind == "batch" and norm_p is not None:
        return _conv(x, _fold_bn(conv_p, norm_p), stride)
    return _norm(_conv(x, conv_p, stride), norm_p, kind)


def _space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (ph_i, ph_j, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _fold_stem_s2d(wt):
    """Fold an odd-k stride-2 conv kernel into its space-to-depth form.

    A stride-2 conv consumes every input pixel exactly once per output, so
    it is EXACTLY a stride-1 conv over the space-to-depth'd input with the
    kernel's taps regrouped by (block offset, phase): pad k=7 to 8 with one
    leading zero row/col (tap u = 2*bi + pi, u in [-4, 3]) and reshape.
    (7, 7, C, O) -> (4, 4, 4C, O), matching _space_to_depth's channel order.
    """
    k = wt.shape[0]
    wt_p = jnp.pad(wt, ((1, 0), (1, 0), (0, 0), (0, 0)))
    kb = (k + 1) // 2
    w2 = wt_p.reshape(kb, 2, kb, 2, wt.shape[2], wt.shape[3])
    return w2.transpose(0, 2, 1, 3, 4, 5).reshape(kb, kb, 4 * wt.shape[2],
                                                  wt.shape[3])


def _stem_conv_s2d(x, p):
    """Stride-2 stem conv as a space-to-depth matmul-friendly conv.

    The direct (B, 240, 320, 3) 7x7/2 conv runs at ~3.7 TFLOP/s on v5e
    (C_in=3 starves the MXU's contraction axis); the identical math over
    the s2d input (12 channels, 4x4 taps, K=192) runs >10x faster.  Exact
    up to float reassociation.  Requires even H, W (guaranteed by
    pad_to_multiple_of_8).
    """
    kb = (p["w"].shape[0] + 1) // 2        # k in {3, 7} -> kb in {2, 4}
    pad = (kb // 2, kb // 2 - 1)           # block taps bi in [-kb/2, kb/2-1]
    y = jax.lax.conv_general_dilated(
        _space_to_depth(x), _fold_stem_s2d(p["w"]).astype(x.dtype),
        (1, 1), (pad, pad), dimension_numbers=_DN)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def _residual_block(x, p, kind, stride):
    y = jax.nn.relu(_conv_norm(x, p["conv1"], p.get("norm1"), kind, stride))
    y = jax.nn.relu(_conv_norm(y, p["conv2"], p.get("norm2"), kind))
    if "down" in p:
        x = _conv_norm(x, p["down"], p.get("norm3"), kind, stride)
    return jax.nn.relu(x + y)


def basic_encoder(x, p, kind):
    """BasicEncoder: conv7x7/2 + 3 residual stages + 1x1 projection.
    x: (B, H, W, 3) in [-1, 1] -> (B, H/8, W/8, out)."""
    if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        stem_p = (_fold_bn(p["conv1"], p["norm1"])
                  if kind == "batch" and p.get("norm1") is not None
                  else p["conv1"])
        x = _stem_conv_s2d(x, stem_p)
        if kind != "batch":
            x = _norm(x, p.get("norm1"), kind)
        x = jax.nn.relu(x)
    else:
        x = jax.nn.relu(_conv_norm(x, p["conv1"], p.get("norm1"), kind, 2))
    for i, stride in ((1, 1), (2, 2), (3, 2)):
        blocks = p[f"layer{i}"]
        x = _residual_block(x, blocks[0], kind, stride)
        x = _residual_block(x, blocks[1], kind, 1)
    return _conv(x, p["conv2"])


# ---------------------------------------------------------------------------
# Correlation pyramid + lookup
# ---------------------------------------------------------------------------

def corr_pyramid(f1: jnp.ndarray, f2: jnp.ndarray, levels: int):
    """All-pairs correlation (B, H*W, H, W)/sqrt(D) + avg-pool pyramid."""
    b, h, w, d = f1.shape
    corr = jnp.einsum("bxd,byd->bxy", f1.reshape(b, h * w, d),
                      f2.reshape(b, h * w, d),
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(b, h * w, h, w)
    pyramid = [corr]
    for _ in range(levels - 1):
        c = pyramid[-1]
        # avg_pool2d(k=2, s=2) with floor semantics for odd dims
        c = jax.lax.reduce_window(c, 0.0, jax.lax.add,
                                  (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4.0
        pyramid.append(c)
    return pyramid


def _lookup_level(corr: jnp.ndarray, coords: jnp.ndarray,
                  radius: int) -> jnp.ndarray:
    """Bilinear radius lookup on one pyramid level.

    corr: (B, N, Hl, Wl); coords: (B, N, 2) xy in level-pixel units.
    Returns (B, N, (2r+1)^2) with zero padding outside the level, matching
    grid_sample(align_corners=True, padding_mode='zeros').
    """
    b, n, hl, wl = corr.shape
    r = radius
    k = 2 * r + 1
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # Match the official CorrBlock ordering quirk exactly: delta is stacked
    # as meshgrid(dy, dx) but added to (x, y) coords, so the ROW offset
    # lands on x and the COLUMN offset on y.  The trained weights of
    # convc1 depend on this channel ordering.
    off = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), -1)  # (k, k, 2)
    offx = off[..., 0].reshape(-1)
    offy = off[..., 1].reshape(-1)
    px = coords[..., 0:1] + offx[None, None]   # (B, N, K)
    py = coords[..., 1:2] + offy[None, None]

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wy1 = py - y0
    flat = corr.reshape(b, n, hl * wl)

    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= wl - 1) & (yi >= 0) & (yi <= hl - 1)
        xi_c = jnp.clip(xi, 0, wl - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, hl - 1).astype(jnp.int32)
        idx = yi_c * wl + xi_c
        vals = jnp.take_along_axis(flat, idx, axis=2)
        return vals * (wgt * valid.astype(jnp.float32))

    out = (corner(x0, y0, (1 - wx1) * (1 - wy1)) +
           corner(x0 + 1, y0, wx1 * (1 - wy1)) +
           corner(x0, y0 + 1, (1 - wx1) * wy1) +
           corner(x0 + 1, y0 + 1, wx1 * wy1))
    return out


def _interp_matrix(centers: jnp.ndarray, size: int, radius: int
                   ) -> jnp.ndarray:
    """Banded bilinear-sampling matrix for one axis.

    centers: (B, N) continuous coordinates.  Returns M (B, N, 2r+1, size)
    with M[..., k, j] the bilinear weight of grid point j for the sample at
    centers + (k - r), zero outside [0, size-1] (grid_sample zero padding).
    """
    k = 2 * radius + 1
    pos = centers[..., None] + jnp.arange(-radius, radius + 1,
                                          dtype=jnp.float32)  # (B, N, k)
    lo = jnp.floor(pos)
    frac = pos - lo
    grid = jnp.arange(size, dtype=jnp.float32)               # (j,)
    lo_e = lo[..., None]
    valid_lo = (lo_e >= 0) & (lo_e <= size - 1)
    valid_hi = (lo_e + 1 >= 0) & (lo_e + 1 <= size - 1)
    m = ((grid == lo_e) * (1.0 - frac[..., None]) * valid_lo +
         (grid == lo_e + 1) * frac[..., None] * valid_hi)
    return m  # (B, N, k, size)


def _weight_vec(centers: jnp.ndarray, size: int, radius: int) -> jnp.ndarray:
    """Bilinear row weights on an extended grid.

    centers: (B, N) continuous coordinates.  Returns (B, N, size + 2r + 2)
    where entry j carries the weight of row (j - r - 1): (1 - frac) at
    floor(center), frac at floor(center) + 1.  No validity masking — rows
    outside [0, size) land in the zero-padded margin of the volume, which
    reproduces grid_sample's zero padding exactly.
    """
    ext = size + 2 * radius + 2
    lo = jnp.floor(centers)
    frac = centers - lo
    grid = jnp.arange(ext, dtype=jnp.float32) - (radius + 1)
    lo_e = lo[..., None]
    return ((grid == lo_e) * (1.0 - frac[..., None]) +
            (grid == lo_e + 1) * frac[..., None])


def _lookup_level_shift(corr: jnp.ndarray, coords: jnp.ndarray,
                        radius: int) -> jnp.ndarray:
    """Static-shift bilinear radius lookup — the TPU-fast default.

    Key identity: the (2r+1) offset samples along one axis share a single
    fractional part, so the whole banded interpolation collapses to ONE
    weight vector per query (two nonzeros) cross-correlated with the volume
    at 2r+1 STATIC shifts.  Each shift is a fused multiply-reduce over a
    static slice of the zero-padded volume: pure VPU streaming, no
    per-pixel matmuls.  ~3.4x faster than the banded-matmul form on v5e
    (whose f32 batched GEMMs also run at default-bf16 MXU precision; this
    path matches the exact gather semantics to ~5e-7 on TPU).

    corr: (B, N, Hl, Wl); coords: (B, N, 2) xy in level units.
    Matches the official CorrBlock ordering quirk: output[k=(a,c)] samples
    (x + a - r, y + c - r).
    """
    b, n, hl, wl = corr.shape
    r = radius
    k = 2 * r + 1
    pad_top = 2 * r + 2                    # shifted index = j + kc + 1
    ext_y = hl + 2 * r + 2
    hp = hl + 4 * r + 3
    cp = jnp.pad(corr, ((0, 0), (0, 0), (pad_top, hp - hl - pad_top),
                        (0, 0)))
    gy = _weight_vec(coords[..., 1], hl, r).astype(corr.dtype)
    sy = jnp.stack(
        [jnp.sum(gy[..., None] * cp[:, :, kc + 1:kc + 1 + ext_y, :],
                 axis=2, dtype=jnp.float32)
         for kc in range(k)], axis=2)      # (B, N, kc, Wl)
    ext_x = wl + 2 * r + 2
    wp = wl + 4 * r + 3
    syp = jnp.pad(sy, ((0, 0), (0, 0), (0, 0), (pad_top, wp - wl - pad_top)))
    gx = _weight_vec(coords[..., 0], wl, r)
    out = jnp.stack(
        [jnp.sum(gx[:, :, None, :] * syp[:, :, :, ka + 1:ka + 1 + ext_x],
                 axis=3, dtype=jnp.float32)
         for ka in range(k)], axis=2)      # (B, N, ka, kc)
    return out.reshape(b, n, k * k)


def _lookup_level_matmul(corr: jnp.ndarray, coords: jnp.ndarray,
                         radius: int) -> jnp.ndarray:
    """Gather-free radius lookup: the bilinear sample at 81 integer offsets
    around each query is two banded matmuls (y then x) — MXU work instead
    of scalar gathers, which dominate RAFT runtime on TPU otherwise.
    Superseded by _lookup_level_shift (faster AND full f32 precision — the
    batched tiny GEMMs here run at the MXU's default bf16 input precision).

    corr: (B, N, Hl, Wl); coords: (B, N, 2) xy in level units.
    Matches the official ordering quirk: output[k=(a,b)] samples
    (x + a - r, y + b - r).
    """
    b, n, hl, wl = corr.shape
    my = _interp_matrix(coords[..., 1], hl, radius)          # (B, N, k, Hl)
    mx = _interp_matrix(coords[..., 0], wl, radius)          # (B, N, k, Wl)
    # the banded matmuls contract in the CORR VOLUME's dtype (bf16 halves
    # the per-iteration HBM read of the level-0 volume, the scan's largest
    # stream) with f32 accumulation
    sy = jnp.einsum("bnkh,bnhw->bnkw", my.astype(corr.dtype), corr,
                    preferred_element_type=jnp.float32)      # (B, N, k, Wl)
    out = jnp.einsum("bnaw,bncw->bnac", mx.astype(sy.dtype), sy,
                     preferred_element_type=jnp.float32)     # (B, N, a, c=b)
    k = 2 * radius + 1
    return out.astype(jnp.float32).reshape(b, n, k * k)


def corr_pyramid_lanes(f1: jnp.ndarray, f2: jnp.ndarray, levels: int):
    """Correlation pyramid in lanes-major layout: (B, Hl, Wl, N).

    The query-pixel axis N (= H*W of frame 1, e.g. 1200 at 240x320) sits in
    the TPU lane dimension, so the per-level shift lookup's multiply-reduces
    run at full 128-lane width.  The query-major layout (B, N, Hl, Wl) puts
    Wl (e.g. 40) in lanes and wastes >2/3 of every vector register AND 3x
    the HBM footprint/traffic to lane padding.
    """
    b, h, w, d = f1.shape
    corr = jnp.einsum("bhwd,bnd->bhwn", f2.reshape(b, h, w, d),
                      f1.reshape(b, h * w, d),
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(d))
    pyramid = [corr]
    for _ in range(levels - 1):
        c = pyramid[-1]
        hh, ww = c.shape[1] // 2 * 2, c.shape[2] // 2 * 2  # floor semantics
        c = c[:, :hh, :ww].reshape(b, hh // 2, 2, ww // 2, 2, h * w)
        pyramid.append(c.mean(axis=(2, 4)))
    return pyramid


def _lookup_level_shift_lanes(corr_t: jnp.ndarray, coords: jnp.ndarray,
                              radius: int) -> jnp.ndarray:
    """Shift lookup on a lanes-major level: corr_t (B, Hl, Wl, N),
    coords (B, N, 2) -> (B, (2r+1)^2, N), offsets x-major like the
    query-major variants."""
    b, hl, wl, n = corr_t.shape
    r = radius
    k = 2 * r + 1
    pad_top = 2 * r + 2
    ext_y = hl + 2 * r + 2
    hp = hl + 4 * r + 3
    cp = jnp.pad(corr_t, ((0, 0), (pad_top, hp - hl - pad_top), (0, 0),
                          (0, 0)))
    gy = _weight_vec(coords[..., 1], hl, r).transpose(0, 2, 1)  # (B, ext, N)
    gy = gy[:, :, None, :].astype(corr_t.dtype)
    sy = jnp.stack(
        [jnp.sum(gy * cp[:, kc + 1:kc + 1 + ext_y], axis=1,
                 dtype=jnp.float32)
         for kc in range(k)], axis=1)            # (B, kc, Wl, N)
    ext_x = wl + 2 * r + 2
    wp = wl + 4 * r + 3
    syp = jnp.pad(sy, ((0, 0), (0, 0), (pad_top, wp - wl - pad_top),
                       (0, 0)))
    gx = _weight_vec(coords[..., 0], wl, r).transpose(0, 2, 1)
    gx = gx[:, None, :, :]
    out = jnp.stack(
        [jnp.sum(gx * syp[:, :, ka + 1:ka + 1 + ext_x], axis=2,
                 dtype=jnp.float32)
         for ka in range(k)], axis=1)            # (B, ka, kc, N)
    return out.reshape(b, k * k, n)


def corr_lookup_lanes(pyramid, coords: jnp.ndarray, radius: int
                      ) -> jnp.ndarray:
    """Lanes-major lookup over a corr_pyramid_lanes pyramid.

    coords: (B, H, W, 2) xy at 1/8 res -> (B, H, W, levels*(2r+1)^2);
    channel order identical to corr_lookup (level-major, x-major offsets).
    """
    b, h, w, _ = coords.shape
    flat = coords.reshape(b, h * w, 2)
    outs = [_lookup_level_shift_lanes(c, flat / (2 ** i), radius)
            for i, c in enumerate(pyramid)]
    out = jnp.concatenate(outs, axis=1)          # (B, C, N)
    return out.transpose(0, 2, 1).reshape(b, h, w, -1)


def corr_lookup_motion(pyramid, coords: jnp.ndarray, radius: int,
                       convc1: Params) -> jnp.ndarray:
    """Lookup fused with the motion encoder's 1x1 convc1 + ReLU.

    convc1 is a pointwise conv over the level-major offset channels, so it
    splits into one GEMM per level that consumes the lanes-major lookup
    output (B, K, N) DIRECTLY — contracting the offset axis against the
    level's (K, 256) weight block with N staying in MXU rows.  This removes
    the per-iteration (B, levels*K, N) -> (B, H, W, C) transpose (a
    lane->sublane relayout of the whole volume slice) from the scan.
    Returns relu(convc1(corr_features)): (B, H, W, 256).
    """
    b, h, w, _ = coords.shape
    k2 = (2 * radius + 1) ** 2
    flat = coords.reshape(b, h * w, 2)
    # convc1["w"]: (1, 1, levels*K, 256) conv kernel -> per-level GEMM blocks
    wmat = convc1["w"].reshape(len(pyramid), k2, convc1["w"].shape[-1])

    # NOTE: a single-pass Pallas VMEM kernel for this lookup was built
    # and measured EXACTLY the same as this XLA form on v5e (13.6 ms per
    # 32-iteration scan either way) — XLA already schedules the 9 static
    # shifts with sliding-window reuse — so the kernel was removed and
    # the simpler path stays in production (see ROADMAP round 3).
    acc = None
    for i, c in enumerate(pyramid):
        cl = flat / (2 ** i)
        lvl = _lookup_level_shift_lanes(c, cl, radius)
        # (B, K, N) x (K, O) -> (B, N, O)
        part = jax.lax.dot_general(
            lvl, wmat[i].astype(lvl.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    acc = acc + convc1["b"].astype(jnp.float32)
    return jax.nn.relu(acc).reshape(b, h, w, -1)


_LOOKUP_MODES = {"shift": _lookup_level_shift,
                 "matmul": _lookup_level_matmul,
                 "gather": _lookup_level}


def corr_lookup(pyramid, coords: jnp.ndarray, radius: int,
                mode: str = "shift") -> jnp.ndarray:
    """coords: (B, H, W, 2) xy at 1/8 res -> (B, H, W, levels*(2r+1)^2)."""
    b, h, w, _ = coords.shape
    flat = coords.reshape(b, h * w, 2)
    lookup = _LOOKUP_MODES[mode]
    outs = []
    for i, corr in enumerate(pyramid):
        outs.append(lookup(corr, flat / (2 ** i), radius))
    return jnp.concatenate(outs, axis=-1).reshape(b, h, w, -1)


# ---------------------------------------------------------------------------
# Update block
# ---------------------------------------------------------------------------

def motion_encoder(flow, corr, p):
    c = jax.nn.relu(_conv(corr, p["convc1"]))
    return _motion_encoder_tail(flow, c, p)


def _motion_encoder_tail(flow, c1, p):
    """Motion encoder from relu(convc1(corr)) onward (the fused lookup path
    computes c1 inside corr_lookup_motion)."""
    c = jax.nn.relu(_conv(c1, p["convc2"]))
    f = jax.nn.relu(_conv(flow, p["convf1"]))
    f = jax.nn.relu(_conv(f, p["convf2"]))
    out = jax.nn.relu(_conv(jnp.concatenate([c, f], -1), p["conv"]))
    return jnp.concatenate([out, flow], -1)          # 126 + 2 = 128


def sep_conv_gru(h, x, p):
    """Two sequential GRUs with (1,5) then (5,1) separable convolutions.

    The z and r gates share the same [h, x] input, so their convolutions
    run as ONE conv with concatenated output channels (the weight concat
    folds at trace time) — 4 instead of 6 convs per GRU pass."""
    for sfx in ("1", "2"):
        hx = jnp.concatenate([h, x], -1)
        pz, pr = p["convz" + sfx], p["convr" + sfx]
        zr = jax.nn.sigmoid(_conv(hx, {
            "w": jnp.concatenate([pz["w"], pr["w"]], -1),
            "b": jnp.concatenate([pz["b"], pr["b"]], -1)}))
        z, r = jnp.split(zr, 2, axis=-1)
        q = jnp.tanh(_conv(jnp.concatenate([r * h, x], -1), p["convq" + sfx]))
        h = (1 - z) * h + z * q
    return h


def flow_head(x, p):
    return _conv(jax.nn.relu(_conv(x, p["conv1"])), p["conv2"])


def update_block(net, inp, corr, flow, p):
    motion = motion_encoder(flow, corr, p["encoder"])
    net, delta = _update_block_tail(net, inp, motion, p)
    return net, upsample_mask(net, p), delta


def update_block_pre(net, inp, corr_c1, flow, p):
    """update_block taking relu(convc1(corr)) from corr_lookup_motion,
    WITHOUT the upsampling mask: at inference only the final iteration's
    mask is consumed, so raft_forward computes it once after the scan
    (from the same final GRU state — identical values) instead of paying
    the mask convs (~14% of update FLOPs) and a stacked
    (iters, B, H/8, W/8, 576) HBM buffer (~700 MB at b8/32it) per pass."""
    motion = _motion_encoder_tail(flow, corr_c1, p["encoder"])
    return _update_block_tail(net, inp, motion, p)


def upsample_mask(net, p):
    return 0.25 * _conv(jax.nn.relu(_conv(net, p["mask0"])), p["mask2"])


def _update_block_tail(net, inp, motion, p):
    net = sep_conv_gru(net, jnp.concatenate([inp, motion], -1), p["gru"])
    delta = flow_head(net, p["flow_head"])
    return net, delta


def upsample_flow(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex 8x upsampling.  flow: (B, H, W, 2); mask: (B, H, W, 64*9)."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    # 3x3 neighborhood of 8*flow, zero padded (F.unfold semantics)
    f = 8.0 * flow
    fpad = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack([fpad[:, dy:dy + h, dx:dx + w, :]
                         for dy in range(3) for dx in range(3)], axis=3)
    # contract straight into the interleaved (b, h, u, w, v, c) layout so
    # the full-res reshape needs no 6-D transpose pass over HBM
    up = jnp.einsum("bhwkc,bhwkuv->bhuwvc", patches, m)
    return up.reshape(b, 8 * h, 8 * w, 2)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def pad_to_multiple_of_8(img: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """Replicate-pad H/W to multiples of 8, split symmetrically like RAFT's
    InputPadder / ptlflow IOAdapter."""
    b, h, w, c = img.shape
    ph = (8 - h % 8) % 8
    pw = (8 - w % 8) % 8
    pads = (ph // 2, ph - ph // 2, pw // 2, pw - pw // 2)
    img = jnp.pad(img, ((0, 0), (pads[0], pads[1]), (pads[2], pads[3]),
                        (0, 0)), mode="edge")
    return img, pads


def unpad(flow: jnp.ndarray, pads: Tuple[int, ...]) -> jnp.ndarray:
    t, bm, l, r = pads
    h, w = flow.shape[1], flow.shape[2]
    return flow[:, t:h - bm if bm else h, l:w - r if r else w, :]


def raft_forward(params: Params, image1: jnp.ndarray, image2: jnp.ndarray,
                 cfg: RAFTConfig = RAFTConfig(),
                 iters: Optional[int] = None,
                 compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Estimate flow image1 -> image2.

    images: (B, H, W, 3) uint8/float RGB in [0, 255], H and W divisible
    by 8 (use pad_to_multiple_of_8 otherwise).  Returns (B, H, W, 2) flow
    in pixels (x, y).
    """
    iters = cfg.iters if iters is None else iters
    if cfg.small:
        # raft-small (3 corr levels, 96-d features, SmallUpdateBlock) is a
        # different architecture; silently running the big one would
        # produce garbage against a small checkpoint
        raise NotImplementedError(
            "RAFTConfig.small is not implemented — only the 'things' "
            "(large) architecture is; the SAIS reference uses only "
            "raft-things (extract_representations.py:267)")
    if iters < 1:
        # 0 iterations would return the convex upsampling of a zero flow
        # field — garbage with no error (the golden oracle asserts this
        # too, tests/golden/torch_raft.py)
        raise ValueError(f"raft_forward needs iters >= 1, got {iters}")
    x1 = (2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0).astype(compute_dtype)
    x2 = (2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0).astype(compute_dtype)

    # single batched pass over both frames (reference runs fnet([i1, i2]))
    fmap = basic_encoder(jnp.concatenate([x1, x2], 0), params["fnet"],
                         "instance")
    fmap = fmap.astype(jnp.float32)
    f1, f2 = jnp.split(fmap, 2, axis=0)
    pyramid = corr_pyramid_lanes(f1, f2, cfg.corr_levels)
    if cfg.corr_dtype == "bfloat16":
        pyramid = [c.astype(jnp.bfloat16) for c in pyramid]

    cnet = basic_encoder(x1, params["cnet"], "batch")
    # split at hidden_dim, not in half: hidden_dim and context_dim are
    # independent knobs (torch: torch.split(cnet, [hdim, cdim], dim=1))
    net, inp = jnp.split(cnet, [cfg.hidden_dim], axis=-1)
    net = jnp.tanh(net).astype(jnp.float32)
    inp = jax.nn.relu(inp).astype(jnp.float32)

    b, h, w, _ = net.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.stack([gx, gy], -1)[None].repeat(b, 0)  # (B, H, W, 2) xy

    def step(carry, _):
        net, coords1 = carry
        corr_c1 = corr_lookup_motion(pyramid, coords1, cfg.corr_radius,
                                     params["update"]["encoder"]["convc1"])
        flow = coords1 - coords0
        net2, delta = update_block_pre(net, inp, corr_c1, flow,
                                       params["update"])
        return (net2, coords1 + delta), None

    (net, coords1), _ = jax.lax.scan(step, (net, coords0), None,
                                     length=iters)
    # mask from the FINAL GRU state only (see update_block_pre docstring)
    mask = upsample_mask(net, params["update"])
    return upsample_flow(coords1 - coords0, mask)


# ---------------------------------------------------------------------------
# Weight port (princeton-vl / ptlflow naming)
# ---------------------------------------------------------------------------

def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_p(sd, prefix):
    p = {"w": jnp.asarray(_np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[prefix + ".bias"]))
    return p


def _bn_p(sd, prefix):
    return {"w": jnp.asarray(_np(sd[prefix + ".weight"])),
            "b": jnp.asarray(_np(sd[prefix + ".bias"])),
            "rm": jnp.asarray(_np(sd[prefix + ".running_mean"])),
            "rv": jnp.asarray(_np(sd[prefix + ".running_var"]))}


def _encoder_p(sd, enc, kind):
    def block(i, j):
        p = f"{enc}.layer{i}.{j}"
        out = {"conv1": _conv_p(sd, p + ".conv1"),
               "conv2": _conv_p(sd, p + ".conv2")}
        if kind == "batch":
            out["norm1"] = _bn_p(sd, p + ".norm1")
            out["norm2"] = _bn_p(sd, p + ".norm2")
        if p + ".downsample.0.weight" in sd:
            out["down"] = _conv_p(sd, p + ".downsample.0")
            if kind == "batch" and p + ".downsample.1.weight" in sd:
                out["norm3"] = _bn_p(sd, p + ".downsample.1")
            elif kind == "batch":
                out["norm3"] = _bn_p(sd, p + ".norm3")
        return out

    out = {"conv1": _conv_p(sd, enc + ".conv1"),
           "conv2": _conv_p(sd, enc + ".conv2"),
           "layer1": [block(1, 0), block(1, 1)],
           "layer2": [block(2, 0), block(2, 1)],
           "layer3": [block(3, 0), block(3, 1)]}
    if kind == "batch":
        out["norm1"] = _bn_p(sd, enc + ".norm1")
    return out


def raft_params_from_torch(sd: Mapping[str, Any]) -> Params:
    """RAFT state_dict (official/ptlflow naming: fnet.*, cnet.*,
    update_block.*) -> param pytree.  Accepts an optional 'model.' or
    'module.' prefix."""
    sd = { (k.split(".", 1)[1] if k.split(".", 1)[0] in ("model", "module")
            else k): v for k, v in sd.items() }
    u = "update_block"
    return {
        "fnet": _encoder_p(sd, "fnet", "instance"),
        "cnet": _encoder_p(sd, "cnet", "batch"),
        "update": {
            "encoder": {k: _conv_p(sd, f"{u}.encoder.{k}")
                        for k in ("convc1", "convc2", "convf1", "convf2",
                                  "conv")},
            "gru": {k: _conv_p(sd, f"{u}.gru.{k}")
                    for k in ("convz1", "convr1", "convq1",
                              "convz2", "convr2", "convq2")},
            "flow_head": {"conv1": _conv_p(sd, f"{u}.flow_head.conv1"),
                          "conv2": _conv_p(sd, f"{u}.flow_head.conv2")},
            "mask0": _conv_p(sd, f"{u}.mask.0"),
            "mask2": _conv_p(sd, f"{u}.mask.2"),
        },
    }


def raft_init(key: jax.Array, cfg: RAFTConfig = RAFTConfig()) -> Params:
    """Random init with the same shapes as the 'things' checkpoint."""
    ks = list(jax.random.split(key, 64))

    def conv(cin, cout, k, bias=True):
        kk = ks.pop()
        fan = cin * k * k
        p = {"w": jax.random.normal(kk, (k, k, cin, cout)) * (2.0 / fan) ** 0.5}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    def conv_rect(cin, cout, kh, kw):
        kk = ks.pop()
        fan = cin * kh * kw
        return {"w": jax.random.normal(kk, (kh, kw, cin, cout)) * (2.0 / fan) ** 0.5,
                "b": jnp.zeros((cout,))}

    def bn(c):
        return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
                "rm": jnp.zeros((c,)), "rv": jnp.ones((c,))}

    def encoder(kind, out_dim):
        chans = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        enc = {"conv1": conv(3, 64, 7), "conv2": conv(128, out_dim, 1)}
        if kind == "batch":
            enc["norm1"] = bn(64)
        for i, (cin, cout, stride) in enumerate(chans, start=1):
            blocks = []
            for j in range(2):
                bi = cin if j == 0 else cout
                st = stride if j == 0 else 1
                blk = {"conv1": conv(bi, cout, 3), "conv2": conv(cout, cout, 3)}
                if kind == "batch":
                    blk["norm1"] = bn(cout)
                    blk["norm2"] = bn(cout)
                if j == 0 and stride != 1:
                    blk["down"] = conv(bi, cout, 1)
                    if kind == "batch":
                        blk["norm3"] = bn(cout)
                blocks.append(blk)
            enc[f"layer{i}"] = blocks
        return enc

    cor_planes = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    return {
        "fnet": encoder("instance", cfg.feature_dim),
        "cnet": encoder("batch", cfg.hidden_dim + cfg.context_dim),
        "update": {
            "encoder": {
                "convc1": conv(cor_planes, 256, 1),
                "convc2": conv(256, 192, 3),
                "convf1": conv(2, 128, 7),
                "convf2": conv(128, 64, 3),
                "conv": conv(256, 126, 3),
            },
            # GRU gate input = hidden state (hdim) + context (cdim) +
            # motion features (126 + 2); gate width = hdim (torch
            # BasicUpdateBlock: SepConvGRU(hdim, input_dim=cdim+128))
            "gru": {
                "convz1": conv_rect(cfg.hidden_dim + cfg.context_dim + 128, cfg.hidden_dim, 1, 5),
                "convr1": conv_rect(cfg.hidden_dim + cfg.context_dim + 128, cfg.hidden_dim, 1, 5),
                "convq1": conv_rect(cfg.hidden_dim + cfg.context_dim + 128, cfg.hidden_dim, 1, 5),
                "convz2": conv_rect(cfg.hidden_dim + cfg.context_dim + 128, cfg.hidden_dim, 5, 1),
                "convr2": conv_rect(cfg.hidden_dim + cfg.context_dim + 128, cfg.hidden_dim, 5, 1),
                "convq2": conv_rect(cfg.hidden_dim + cfg.context_dim + 128, cfg.hidden_dim, 5, 1),
            },
            "flow_head": {"conv1": conv(cfg.hidden_dim, 256, 3),
                          "conv2": conv(256, 2, 3)},
            "mask0": conv(cfg.hidden_dim, 256, 3),
            "mask2": conv(256, 64 * 9, 1),
        },
    }
