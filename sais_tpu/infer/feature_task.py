"""FeatureExtraction task (reference task='FeatureExtraction'):
raw video snippets -> per-snippet encoder features, persisted as the
all_info_dict_<encoder> artifact (single_epoch_feature_extraction,
perform_training.py:15-45; fullModel.extractFeatures,
prepare_model.py:150-177; saved by train.py:100-103).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import ViTConfig


def extract_snippet_features_vit(vit_params, snippets: np.ndarray,
                                 cfg: ViTConfig,
                                 compute_dtype=jnp.bfloat16) -> np.ndarray:
    """ViT path (prepare_model.py:160-175): (B, S, T, H, W, 3) normalized
    snippets -> (B, S, T, D) per-frame features (frames flattened through
    the encoder in one batch per snippet group)."""
    from sais_tpu.models.vit import vit_features
    b, s, t, h, w, c = snippets.shape
    flat = jnp.asarray(snippets.reshape(b * s * t, h, w, c))
    feats = vit_features(vit_params, flat, cfg, compute_dtype=compute_dtype,
                         allow_fused=jax.default_backend() == "tpu")
    return np.asarray(feats).reshape(b, s, t, -1)


def extract_snippet_features_r3d(r3d_params, snippets: np.ndarray
                                 ) -> np.ndarray:
    """R3D path (prepare_model.py:153-159): (B, S, T, H, W, 3) normalized
    clips -> (B, S, 512) pooled snippet features."""
    from sais_tpu.models.r3d import r3d18_features
    b, s, t, h, w, c = snippets.shape
    flat = jnp.asarray(snippets.reshape(b * s, t, h, w, c))
    feats = r3d18_features(r3d_params, flat)
    return np.asarray(feats).reshape(b, s, -1)


def run_feature_extraction(batches: Iterable[Tuple[Sequence[str], np.ndarray,
                                                   np.ndarray]],
                           encoder_params, encoder_type: str = "ViT",
                           vit_cfg: ViTConfig = ViTConfig()
                           ) -> Dict[str, List]:
    """single_epoch_feature_extraction equivalent: iterate (videonames,
    snippets, labels) batches, accumulate the all_info_dict lists."""
    snippets_list: List[np.ndarray] = []
    videoname_list: List[str] = []
    labels_list: List[np.ndarray] = []
    for videonames, snippets, labels in batches:
        if encoder_type == "ViT":
            feats = extract_snippet_features_vit(encoder_params, snippets,
                                                 vit_cfg)
        else:
            feats = extract_snippet_features_r3d(encoder_params, snippets)
        snippets_list.extend(feats)
        videoname_list.extend(videonames)
        labels_list.extend(np.asarray(labels))
    return {"snippets": snippets_list, "videonames": videoname_list,
            "labels": labels_list}


def save_all_info_dict(savepath: str, info: Dict[str, List],
                       encoder_type: str) -> str:
    """all_info_dict_<encoder> artifact (train.py:100-103)."""
    os.makedirs(savepath, exist_ok=True)
    dest = os.path.join(savepath, f"all_info_dict_{encoder_type}.pkl")
    with open(dest, "wb") as f:
        pickle.dump(info, f)
    return dest
