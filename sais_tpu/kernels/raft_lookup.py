"""Pallas kernel for RAFT's shift-based correlation lookup (lanes layout).

The XLA form of `_lookup_level_shift_lanes` (models/raft.py) re-reads the
padded correlation volume from HBM for several of the 9 static shifts per
axis.  This kernel streams each level's volume through VMEM ONCE per
iteration and computes all 81 offset samples in-register:

  grid = (B,); per program the whole (hp, Wl, N) level slab sits in VMEM
  (level 0 at 240x320 inputs: 9.5 MB), the y-pass takes 9 static sublane
  shifts of it, and the x-pass 9 static sublane shifts of the (9, wp, N)
  intermediate — the query-pixel axis N stays in the lane dimension
  throughout, so every multiply-reduce runs at full 128-lane width.

Semantics are identical to the gather reference (zero padding outside the
level, official CorrBlock x-major offset ordering) — asserted against
`_lookup_level_shift_lanes` in tests/test_corr_lookup.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM guard: per-program working-set bytes above which the kernel will
# not compile (the 240x320 level-0 slab at ~15.1 MB estimated compiles on
# v5e; Mosaic reuses buffers, so the estimate is conservative).
_VMEM_SLAB_LIMIT = 16 * 1024 * 1024


def _lookup_kernel(cp_ref, gy_ref, gx_ref, o_ref, *, radius: int,
                   ext_y: int, ext_x: int, pad_w: int):
    r = radius
    k = 2 * r + 1
    cp = cp_ref[:]                       # (hp, Wl, N) — None batch dim
    gy = gy_ref[:]                       # (ext_y, N)    is dropped from
    gx = gx_ref[:]                       # (ext_x, N)    the block refs
    n = cp.shape[-1]
    wl = cp.shape[1]
    sy = jnp.stack(
        [jnp.sum(gy[:, None, :] * cp[kc + 1:kc + 1 + ext_y], axis=0)
         for kc in range(k)], axis=0)    # (k, Wl, N)
    # wp = wl + 4r + 3 exactly (shifted windows read [ka+1, ka+1+ext_x),
    # max index = (2r) + 1 + (wl + 2r + 2) - 1 = wl + 4r + 2)
    zl = jnp.zeros((k, pad_w, n), sy.dtype)
    zr = jnp.zeros((k, 2 * r + 1, n), sy.dtype)
    syp = jnp.concatenate([zl, sy, zr], axis=1)   # (k, wp, N)
    for ka in range(k):
        win = syp[:, ka + 1:ka + 1 + ext_x]       # (k, ext_x, N)
        o_ref[ka * k:(ka + 1) * k] = jnp.sum(gx[None] * win, axis=1)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def lookup_level_lanes_pallas(corr_t: jnp.ndarray, gy: jnp.ndarray,
                              gx: jnp.ndarray, radius: int,
                              interpret: bool = False) -> jnp.ndarray:
    """One level's 81-offset bilinear lookup, volume streamed once.

    corr_t: (B, Hl, Wl, N) lanes-major level; gy/gx: (B, ext, N) extended
    interpolation weight vectors (models/raft._weight_vec, transposed).
    Returns (B, (2r+1)^2, N), x-major offsets.
    """
    b, hl, wl, n = corr_t.shape
    r = radius
    k = 2 * r + 1
    pad_top = 2 * r + 2
    ext_y = hl + 2 * r + 2
    hp = hl + 4 * r + 3
    ext_x = wl + 2 * r + 2
    cp = jnp.pad(corr_t, ((0, 0), (pad_top, hp - hl - pad_top), (0, 0),
                          (0, 0)))
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, radius=r, ext_y=ext_y,
                          ext_x=ext_x, pad_w=pad_top),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, hp, wl, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ext_y, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ext_x, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, k * k, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k * k, n), jnp.float32),
        interpret=interpret,
    )(cp, gy, gx)
    return out


def fits_vmem(hl: int, wl: int, n: int, radius: int,
              itemsize: int = 4) -> bool:
    """Whether one batch element's padded level slab fits the VMEM budget."""
    hp = hl + 4 * radius + 3
    # slab + (k, wp, N) intermediate + output
    k = 2 * radius + 1
    wp = wl + 4 * radius + 3
    need = (hp * wl + 2 * k * wp + k * k) * n * itemsize
    return need <= _VMEM_SLAB_LIMIT
