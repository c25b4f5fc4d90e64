"""Copy detection (reference: dino-main/eval_copy_detection.py).

TPU-native re-design of the Copydays evaluation path:

- descriptors = [CLS] token concatenated with GeM(p=4)-pooled patch tokens
  (eval_copy_detection.py:165-175) — one jitted device program per batch;
- PCA whitening (whit=0.5) trained on a held-out image set's covariance
  (eval_copy_detection.py:271-286, utils.py:655-705);
- cosine top-k ranking + the Holidays trapezoid AP
  (score_ap_from_ranks_1, eval_copy_detection.py:97-126).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import ViTConfig
from sais_tpu.models.vit import vit_tokens


def copy_detection_features(params, images: jnp.ndarray, cfg: ViTConfig,
                            gem_p: float = 4.0) -> jnp.ndarray:
    """(B, H, W, 3) normalized images -> (B, 2D) [CLS | GeM-patch] features
    (eval_copy_detection.py:165-175)."""
    toks = vit_tokens(params, images, cfg)          # (B, 1+N, D)
    cls = toks[:, 0]
    patches = jnp.clip(toks[:, 1:], 1e-6, None)
    gem = jnp.mean(patches ** gem_p, axis=1) ** (1.0 / gem_p)
    return jnp.concatenate([cls, gem], axis=-1)


class PCAWhitening:
    """utils.PCA (dino-main/utils.py:655-705): eigendecomposition of the
    feature covariance, eigenvalue power -whit, optional dim reduction."""

    def __init__(self, dim: int, whit: float = 0.5):
        self.dim = dim
        self.whit = whit
        self.dvt: Optional[np.ndarray] = None

    def train(self, feats: np.ndarray) -> "PCAWhitening":
        cov = feats.T @ feats / feats.shape[0]
        d, v = np.linalg.eigh(cov)
        eps = d.max() * 1e-5
        d[d < eps] = eps
        idx = np.argsort(d)[::-1][:self.dim]
        d, v = d[idx], v[:, idx]
        self.dvt = np.diag(1.0 / d ** self.whit) @ v.T
        return self

    def apply(self, x: np.ndarray) -> np.ndarray:
        return (self.dvt @ x.T).T


def whiten_and_normalize(queries: np.ndarray, database: np.ndarray,
                         whitening_feats: Optional[np.ndarray] = None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Center on the whitening set's mean, whiten, l2-normalize
    (eval_copy_detection.py:271-292).

    QUIRK PRESERVED: the reference computes the PCA 'covariance' on the
    UNCENTERED whitening features (cov = W.T @ W / n at :283 — a second
    moment) while centering queries/database on the whitening mean; we
    replicate that exactly rather than centering W first."""
    if whitening_feats is not None:
        mean = whitening_feats.mean(axis=0)
        queries = queries - mean
        database = database - mean
        pca = PCAWhitening(dim=database.shape[-1]).train(whitening_feats)
        queries = pca.apply(queries)
        database = pca.apply(database)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    dn = database / np.linalg.norm(database, axis=1, keepdims=True)
    return qn, dn


_matmul = jax.jit(jnp.matmul)  # module-level: one compile per shape


def rank_copies(queries: np.ndarray, database: np.ndarray,
                topk: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Cosine-similarity ranking (eval_copy_detection.py:294-299); returns
    (similarities, indices), the device matmul jitted.

    Default ranks the FULL database like the reference's untruncated
    argsort — AP integrates every positive's rank, so a topk cutoff
    silently deflates mAP whenever a positive ranks past it; pass topk
    only for qualitative nearest-neighbor dumps."""
    sim = np.asarray(_matmul(jnp.asarray(queries), jnp.asarray(database.T)))
    idx = np.argsort(-sim, axis=1)
    if topk is not None:
        idx = idx[:, :topk]
    return np.take_along_axis(sim, idx, axis=1), idx


def score_ap_from_ranks(ranks: Sequence[int], nres: int) -> float:
    """Holidays AP (score_ap_from_ranks_1, eval_copy_detection.py:97-126)."""
    ap = 0.0
    recall_step = 1.0 / nres
    for ntp, rank in enumerate(ranks):
        precision_0 = 1.0 if rank == 0 else ntp / float(rank)
        precision_1 = (ntp + 1) / float(rank + 1)
        ap += (precision_1 + precision_0) * recall_step / 2.0
    return ap


def copydays_block_map(indices: np.ndarray,
                       positives_per_query: List[List[int]]) -> float:
    """mAP of one Copydays block (eval_result, eval_copy_detection.py
    :63-93): positions of true positives in each ranked list -> AP."""
    total = 0.0
    for qno, row in enumerate(indices):
        positives = positives_per_query[qno]
        ranks = [rank for rank, bno in enumerate(row) if bno in positives]
        total += score_ap_from_ranks(ranks, len(positives))
    return total / len(indices)
