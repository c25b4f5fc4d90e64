"""Image retrieval evaluation (reference: dino-main/eval_image_retrieval.py
+ utils.compute_map / multi_scale).

- multi-scale descriptors: CLS features at scales {1, 1/sqrt(2), 1/2},
  summed / 3 and norm-divided (utils.py multi_scale);
- ranking by cosine similarity of l2-normalized features
  (eval_image_retrieval.py:170-178);
- revisited-Oxford/Paris mAP protocol with junk removal and precision@k
  (utils.compute_ap/compute_map, utils.py:709-812) — the medium protocol
  scores easy+hard positives, the hard protocol scores hard with easy
  junked (eval_image_retrieval.py:180-196).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import ViTConfig
from sais_tpu.models.vit import vit_features


# one jitted matmul + one trapezoid-AP implementation shared with the
# copy-detection protocol (both references carry the identical formula:
# utils.py:709-741 == eval_copy_detection.py:97-126)
from sais_tpu.eval.copy_detection import _matmul, score_ap_from_ranks


def multi_scale_features(params, images: jnp.ndarray,
                         cfg: ViTConfig) -> jnp.ndarray:
    """utils.multi_scale: CLS features at 3 scales, averaged then
    norm-divided.  images: (B, H, W, 3) normalized, H=W."""
    b, h, w, _ = images.shape
    v = None
    for s in (1.0, 2 ** -0.5, 0.5):
        if s == 1.0:
            inp = images
        else:
            nh, nw = int(h * s), int(w * s)
            # match patch-grid divisibility like torch interpolate feeds
            nh -= nh % cfg.patch_size
            nw -= nw % cfg.patch_size
            inp = jax.image.resize(images, (b, nh, nw, images.shape[-1]),
                                   method="bilinear")
        feats = vit_features(params, inp, cfg)
        v = feats if v is None else v + feats
    v = v / 3.0
    # PER-SAMPLE norm: the reference runs batch-size 1, so its v.norm()
    # is the per-image norm; a batch-global Frobenius norm would make
    # each descriptor depend on the rest of the batch
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def retrieval_ranks(db_features: np.ndarray,
                    query_features: np.ndarray) -> np.ndarray:
    """l2-normalize both sides, similarity, descending ranks
    (eval_image_retrieval.py:170-178).  Returns (n_db, n_q) rank matrix."""
    dbn = db_features / np.linalg.norm(db_features, axis=1, keepdims=True)
    qn = query_features / np.linalg.norm(query_features, axis=1,
                                         keepdims=True)
    sim = np.asarray(_matmul(jnp.asarray(dbn), jnp.asarray(qn.T)))
    return np.argsort(-sim, axis=0)


# utils.compute_ap (utils.py:709-741) is the same trapezoid AP as the
# copy-detection score_ap_from_ranks_1; one implementation serves both
compute_ap = score_ap_from_ranks


def compute_map(ranks: np.ndarray, gnd: Sequence[Dict],
                kappas: Sequence[int] = ()) -> Tuple[float, np.ndarray,
                                                     np.ndarray, np.ndarray]:
    """utils.compute_map (utils.py:744-812): junk-corrected mAP + P@k."""
    mean_ap = 0.0
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    for i in range(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        qgndj = np.array(gnd[i].get("junk", []))
        pos = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgndj)]
        if len(junk):
            # shift positive ranks down by the junk appearing before them
            k = 0
            ij = 0
            ip = 0
            while ip < len(pos):
                while ij < len(junk) and pos[ip] > junk[ij]:
                    k += 1
                    ij += 1
                pos[ip] = pos[ip] - k
                ip += 1
        ap = compute_ap(pos, len(qgnd))
        mean_ap += ap
        aps[i] = ap
        pos = pos + 1  # 1-based for P@k
        for j, kappa in enumerate(kappas):
            kq = min(max(pos), kappa)
            prs[i, j] = (pos <= kq).sum() / kq
        pr = pr + prs[i, :]
    denom = max(nq - nempty, 1)
    return mean_ap / denom, aps, pr / denom, prs


def revisited_protocols(gnd: Sequence[Dict]) -> Dict[str, List[Dict]]:
    """Medium / hard ground-truth variants
    (eval_image_retrieval.py:180-193)."""
    medium = [{"ok": np.concatenate([g["easy"], g["hard"]]),
               "junk": np.concatenate([g["junk"]])} for g in gnd]
    hard = [{"ok": np.concatenate([g["hard"]]),
             "junk": np.concatenate([g["junk"], g["easy"]])} for g in gnd]
    return {"medium": medium, "hard": hard}
