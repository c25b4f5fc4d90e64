"""HDF5 per-video feature store — layout-compatible with the reference.

The reference stores one HDF5 dataset per video key, shape [nframes, 384],
in results/<model>_RepsAndLabels.h5 and ..._FlowRepsAndLabels.h5
(extract_representations.py:389-407); the data layer re-opens them and
gathers rows by frame index (prepare_dataset.py:1702-1703, 2658).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import h5py
import numpy as np

RGB_SUFFIX = "%s_RepsAndLabels.h5"
FLOW_SUFFIX = "%s_FlowRepsAndLabels.h5"
DEFAULT_MODEL_TYPE = "ViT_SelfSupervised_ImageNet"


class FeatureStore:
    """Read/write per-video feature matrices in the reference H5 layout."""

    def __init__(self, path: str, mode: str = "r"):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._h5 = h5py.File(path, mode)
        self.path = path

    def write_video(self, video: str, reps: np.ndarray,
                    attrs: Optional[Dict[str, object]] = None) -> None:
        """attrs: optional per-video metadata stored as HDF5 dataset
        attributes (e.g. the flow-pair stride the extractor ran at, so
        consumers can validate/adopt it instead of trusting the user to
        re-pass the same --flow-jump).  The reference layout has no
        attributes, and h5py readers that ignore attrs see an identical
        file, so compatibility is preserved."""
        if video in self._h5:
            del self._h5[video]
        ds = self._h5.create_dataset(video, data=np.asarray(reps))
        for k, v in (attrs or {}).items():
            ds.attrs[k] = v

    def video_attr(self, video: str, key: str):
        """Per-video metadata (see write_video); None when absent."""
        if video not in self._h5:
            return None
        val = self._h5[video].attrs.get(key)
        return None if val is None else val.item() if hasattr(
            val, "item") else val

    def append_video(self, video: str, reps: np.ndarray) -> None:
        """Append rows to a growing per-video dataset (streaming writes)."""
        reps = np.asarray(reps)
        if video not in self._h5:
            self._h5.create_dataset(video, data=reps,
                                    maxshape=(None, reps.shape[1]),
                                    chunks=(4096, reps.shape[1]))
            return
        ds = self._h5[video]
        n = ds.shape[0]
        ds.resize(n + reps.shape[0], axis=0)
        ds[n:] = reps

    def read_video(self, video: str) -> np.ndarray:
        return np.asarray(self._h5[video])

    def videos(self) -> List[str]:
        return list(self._h5.keys())

    def __contains__(self, video: str) -> bool:
        return video in self._h5

    def close(self) -> None:
        self._h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def rgb_store_path(root: str, model_type: str = DEFAULT_MODEL_TYPE) -> str:
    return os.path.join(root, "results", RGB_SUFFIX % model_type)


def flow_store_path(root: str, model_type: str = DEFAULT_MODEL_TYPE) -> str:
    return os.path.join(root, "results", FLOW_SUFFIX % model_type)
