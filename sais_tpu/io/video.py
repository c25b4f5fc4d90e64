"""Host-side video decode.

The reference shells out to ffmpeg to explode each mp4 into JPEG frames on
disk (video_to_frames.sh:23) and re-reads them one file at a time through
PIL/cv2.  The TPU-native pipeline instead streams decoded frames straight
from the container into batched device arrays (OpenCV's C++ decoder),
eliminating the JPEG round-trip; `dump_frames` is kept for byte-compatible
interop with reference tooling.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class VideoReader:
    """Sequential RGB frame stream over an mp4 (or any OpenCV-decodable
    container)."""

    def __init__(self, path: str):
        if cv2 is None:
            raise RuntimeError("OpenCV is required for video decode")
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {path}")
        self.path = path

    @property
    def fps(self) -> float:
        return float(self._cap.get(cv2.CAP_PROP_FPS))

    @property
    def frame_count(self) -> int:
        return int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))

    @property
    def size(self) -> Tuple[int, int]:
        """(height, width)."""
        return (int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH)))

    def frames(self) -> Iterator[np.ndarray]:
        """Yield (H, W, 3) uint8 RGB frames in order."""
        while True:
            ok, bgr = self._cap.read()
            if not ok:
                return
            yield bgr[:, :, ::-1]

    def batches(self, batch_size: int) -> Iterator[np.ndarray]:
        """Yield (B, H, W, 3) uint8 batches; the final batch may be short."""
        buf = []
        for f in self.frames():
            buf.append(f)
            if len(buf) == batch_size:
                yield np.stack(buf)
                buf = []
        if buf:
            yield np.stack(buf)

    def close(self) -> None:
        self._cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def dump_frames(video_path: str, out_dir: str,
                name_format: str = "frames_%08d.jpg") -> int:
    """Reference-compatible frame explosion (video_to_frames.sh:23):
    images/<video>/frames_%08d.jpg numbered from 1 like ffmpeg."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    with VideoReader(video_path) as r:
        for i, frame in enumerate(r.frames(), start=1):
            cv2.imwrite(os.path.join(out_dir, name_format % i),
                        frame[:, :, ::-1])
            n = i
    return n


def read_frame_dir(frame_dir: str) -> Iterator[np.ndarray]:
    """Iterate a reference-layout JPEG frame directory in sorted order."""
    if cv2 is None:
        raise RuntimeError("read_frame_dir requires OpenCV (cv2)")
    for name in sorted(os.listdir(frame_dir)):
        if name.endswith(".jpg") or name.endswith(".png"):
            path = os.path.join(frame_dir, name)
            bgr = cv2.imread(path)
            if bgr is None:   # truncated/corrupt file: name the culprit
                raise IOError(f"failed to decode frame image {path!r}")
            yield bgr[:, :, ::-1]
