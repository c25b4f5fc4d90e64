"""Attention-overlay video generation (reference: dino-main/
video_generation.py).

The reference explodes a video with ffmpeg, runs get_last_selfattention per
frame, saves per-head heatmap PNGs and re-encodes with ffmpeg
(video_generation.py:48-242).  Here the whole loop is streaming: frames
decode on the host, the head-averaged CLS attention row computes on device
(batched), and cv2 writes the overlay mp4 directly — no intermediate image
tree.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from sais_tpu.config import PreprocessConfig, ViTConfig
from sais_tpu.eval.attention_viz import cls_attention_maps, upsample_maps


def attention_video(vit_params, cfg: ViTConfig, video_path: str,
                    out_path: str, pre: PreprocessConfig = PreprocessConfig(),
                    batch_size: int = 32, alpha: float = 0.5,
                    fps: Optional[float] = None,
                    threshold: Optional[float] = None) -> int:
    """Render <video> with the DINO CLS attention blended on top.

    threshold: keep only the attention mass-threshold mask like
    visualize_attention.py's --threshold option (via
    eval.attention_viz.threshold_masks).
    Returns the number of frames written.
    """
    import cv2
    import jax.numpy as jnp
    from sais_tpu.io.video import VideoReader
    from sais_tpu.ops.preprocess import preprocess_batch

    n_written = 0
    writer = None
    with VideoReader(video_path) as r:
        out_fps = fps or r.fps or 30.0
        for batch in r.batches(batch_size):
            x = preprocess_batch(jnp.asarray(batch), pre)
            maps = np.asarray(cls_attention_maps(vit_params, x, cfg))
            # head-average -> (B, h, w); upsample to the preprocessed size
            mean_maps = maps.mean(axis=1)
            heat = upsample_maps(mean_maps, cfg.patch_size)
            if threshold is not None:
                from sais_tpu.eval.attention_viz import threshold_masks
                keep = upsample_maps(
                    threshold_masks(maps, threshold).sum(1).astype(
                        np.float32), cfg.patch_size)
                heat = heat * (keep > 0)
            for i, frame in enumerate(batch):
                h = heat[i]
                h = (h - h.min()) / max(h.max() - h.min(), 1e-8)
                hm = cv2.applyColorMap((h * 255).astype(np.uint8),
                                       cv2.COLORMAP_INFERNO)[:, :, ::-1]
                # the attention map covers the CENTER-CROPPED region the
                # ViT saw; crop the base frame identically before resizing
                # or the overlay lands up to 10% of the frame off
                from sais_tpu.ops.preprocess import center_crop_bounds
                r0, r1 = center_crop_bounds(frame.shape[0],
                                            pre.crop_height_frac)
                c0, c1 = center_crop_bounds(frame.shape[1],
                                            pre.crop_width_frac)
                base = cv2.resize(frame[r0:r1, c0:c1],
                                  (h.shape[1], h.shape[0]))
                blend = ((1 - alpha) * base + alpha * hm).astype(np.uint8)
                if writer is None:
                    writer = cv2.VideoWriter(
                        out_path, cv2.VideoWriter_fourcc(*"mp4v"), out_fps,
                        (blend.shape[1], blend.shape[0]))
                writer.write(blend[:, :, ::-1])
                n_written += 1
    if writer is not None:
        writer.release()
    return n_written
