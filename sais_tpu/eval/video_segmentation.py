"""DAVIS-style video segmentation by label propagation
(reference: dino-main/eval_video_segmentation.py).

Per-frame patch features drive a nearest-neighbor label propagation from a
queue of context frames (the first frame + the n most recent):

- affinity = exp(cos-sim / 0.1) between target-patch queries and context
  keys (label_propagation, eval_video_segmentation.py:113-150);
- optional local-attention restriction to a spatial neighborhood
  (restrict_neighborhood, :85-99);
- top-k sparsification over the source axis, normalization, matmul with
  the context one-hot masks;
- per-channel min-max renormalization (norm_mask, :102-110).

TPU redesign: the whole propagation step (similarity + mask + topk +
normalize + seg matmul) is one jitted program; the neighborhood mask is
built vectorized instead of a 4-deep python loop.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import ViTConfig
from sais_tpu.models.vit import vit_tokens


def patch_features(params, frame: jnp.ndarray, cfg: ViTConfig
                   ) -> Tuple[jnp.ndarray, int, int]:
    """(H, W, 3) normalized frame -> ((h*w, D) patch features, h, w)
    (extract_feature, eval_video_segmentation.py:153-163)."""
    toks = vit_tokens(params, frame[None], cfg)[0, 1:]
    h = frame.shape[0] // cfg.patch_size
    w = frame.shape[1] // cfg.patch_size
    return toks, h, w


def restrict_neighborhood(h: int, w: int, size: int) -> np.ndarray:
    """(h*w, h*w) 0/1 mask allowing source nodes within a (2*size+1)^2
    spatial window of each query node (restrict_neighborhood,
    eval_video_segmentation.py:85-99) — vectorized."""
    qi, qj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    si, sj = qi.reshape(-1), qj.reshape(-1)
    di = np.abs(si[:, None] - si[None, :])
    dj = np.abs(sj[:, None] - sj[None, :])
    return ((di <= size) & (dj <= size)).astype(np.float32)


def norm_mask(mask: np.ndarray) -> np.ndarray:
    """Per-channel min-max renormalization (norm_mask, :102-110)."""
    out = mask.copy()
    for c in range(mask.shape[0]):
        m = out[c]
        if m.max() > 0:
            m = m - m.min()
            out[c] = m / m.max()
    return out


@functools.partial(jax.jit, static_argnames=("topk",))
def _propagate(feat_tar, feat_sources, segs, mask, topk: int,
               temperature: float):
    """One propagation step, fully on device (jitted; `mask` should be a
    device array reused across frames — label_propagation uploads it once).

    feat_tar: (hw, D); feat_sources: (n, hw, D); segs: (n, C, hw);
    mask: (hw, hw) or None.
    """
    ft = feat_tar / jnp.linalg.norm(feat_tar, axis=1, keepdims=True)
    fs = feat_sources / jnp.linalg.norm(feat_sources, axis=2, keepdims=True)
    aff = jnp.exp(jnp.einsum("qd,nkd->nqk", ft, fs) / temperature)
    if mask is not None:
        aff = aff * mask[None]
    n, hw_q, hw_k = aff.shape
    # reference reshapes to (n*hw_k, hw_q) and top-ks over sources
    aff = aff.transpose(0, 2, 1).reshape(n * hw_k, hw_q)
    tk = jax.lax.top_k(aff.T, topk)[0][:, -1]          # per-query k-th value
    aff = jnp.where(aff < tk[None, :], 0.0, aff)
    aff = aff / jnp.sum(aff, axis=0, keepdims=True)
    c = segs.shape[1]
    seg_flat = segs.transpose(0, 2, 1).reshape(n * hw_k, c).T   # (C, n*hw)
    return seg_flat @ aff                                        # (C, hw_q)


def label_propagation(params, cfg: ViTConfig, frame_tar: jnp.ndarray,
                      context_feats: List[jnp.ndarray],
                      context_segs: List[np.ndarray],
                      topk: int = 5, temperature: float = 0.1,
                      neighborhood: int = 12,
                      mask: Optional[np.ndarray] = None
                      ) -> Tuple[np.ndarray, jnp.ndarray, np.ndarray]:
    """Propagate context masks to the target frame
    (label_propagation, eval_video_segmentation.py:113-150).

    context_segs entries: (C, h, w) soft one-hot masks.
    Returns (seg_tar (C, h, w), target patch features, neighborhood mask).
    """
    feat_tar, h, w = patch_features(params, frame_tar, cfg)
    if neighborhood > 0 and mask is None:
        mask = restrict_neighborhood(h, w, neighborhood)
    if mask is not None:
        # device-resident once: the (hw, hw) mask is ~100 MB at DAVIS
        # 480p/patch-8 — re-uploading it per frame would dominate the step
        mask = jnp.asarray(mask)
    fs = jnp.stack(context_feats)
    segs = jnp.stack([jnp.asarray(s.reshape(s.shape[0], -1))
                      for s in context_segs])
    seg = _propagate(feat_tar, fs, segs, mask, topk, temperature)
    return np.asarray(seg).reshape(-1, h, w), feat_tar, mask


def track_video(params, cfg: ViTConfig, frames: np.ndarray,
                first_seg: np.ndarray, n_last_frames: int = 7,
                topk: int = 5, neighborhood: int = 12,
                temperature: float = 0.1) -> List[np.ndarray]:
    """eval_video_tracking_davis queue semantics (:38-82): the first frame
    + the n most recent (frame, seg) pairs form the context; propagated
    masks are renormalized and fed back.

    frames: (T, H, W, 3) normalized; first_seg: (C, h, w) one-hot.
    Returns the list of (C, h, w) soft masks for frames 1..T-1.
    """
    feat0, _, _ = patch_features(params, jnp.asarray(frames[0]), cfg)
    que: List[Tuple[jnp.ndarray, np.ndarray]] = []
    mask = None
    out = []
    for t in range(1, len(frames)):
        used_feats = [feat0] + [f for f, _ in que]
        used_segs = [first_seg] + [s for _, s in que]
        seg, feat_tar, mask = label_propagation(
            params, cfg, jnp.asarray(frames[t]), used_feats, used_segs,
            topk=topk, temperature=temperature, neighborhood=neighborhood,
            mask=mask)
        # the propagation queue stores the RAW propagated mask — the
        # reference deepcopies BEFORE norm_mask (eval_video_segmentation
        # .py:70-75); renormalizing first would feed inflated
        # low-confidence channels back into the next frame's propagation
        que.append((feat_tar, seg))
        if len(que) > n_last_frames:
            que.pop(0)
        out.append(norm_mask(seg))
    return out


def to_one_hot(labels: np.ndarray, n_classes: Optional[int] = None
               ) -> np.ndarray:
    """(h, w) int labels -> (C, h, w) one-hot (to_one_hot, :176-188)."""
    n = int(n_classes if n_classes is not None else labels.max() + 1)
    return np.eye(n, dtype=np.float32)[labels].transpose(2, 0, 1)
