"""Skill assessment and step recognition inference (BASELINE configs 3-4).

SkillAssessor: EASE-domain skill probabilities over annotated stitch
segments with frame-importance scores and CLS attention maps — the
artifacts the reference exports per inference phase
(train.py:113-121: reps_and_labels_<ph>, attention_<ph>, importance_<ph>).

StepRecognizer: 10 s / 5 s sliding-window sub-phase recognition over a
full-length case video (prepare_dataset.py:459-486), sharing the window
batching machinery with gesture decoding.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from sais_tpu.config import PipelineConfig
from sais_tpu.data.tasks import (RACE_POLICIES, SamplingPolicy,
                                 policy_indices, race_window,
                                 step_window_manifest)
from sais_tpu.data.windows import build_tta_batches, flow_indices_for
from sais_tpu.models.full_model import prototypes_forward
from sais_tpu.models.heads import prototype_probs


class SkillAssessor:
    """Per-segment skill inference with importance + attention export."""

    def __init__(self, model_params, prototypes: jnp.ndarray,
                 cfg: PipelineConfig,
                 frame_buckets: Sequence[int] = (16, 32, 64, 128)):
        self.cfg = cfg
        self.params = model_params
        self.protos = prototypes
        self.buckets = list(frame_buckets)
        mcfg = cfg.model

        def _fn(params, protos, rgb, rgb_mask, flow, flow_mask):
            out = prototypes_forward(params, mcfg, rgb, rgb_mask, flow,
                                     flow_mask)
            probs = prototype_probs(out.video_rep, protos)
            return out.video_rep, probs, out.attn, out.importances

        self._fn = jax.jit(_fn)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        # grow beyond the configured buckets (next power of two) instead of
        # silently clamping — a clamp made the padded-array assignment
        # crash for segments longer than the largest bucket
        b = self.buckets[-1]
        while b < n:
            b *= 2
        return b

    def assess_segments(self, rgb_reps: np.ndarray,
                        flow_reps: Optional[np.ndarray],
                        segments: pd.DataFrame,
                        flow_jump: int = 15) -> Dict[str, List]:
        """segments: DataFrame with StartFrame/EndFrame/RACE columns.

        Returns per-TTA reps/probs plus per-segment attention rows and
        importance scores (trimmed to real frames, matching
        perform_training.py:177-185's CLS-drop and length trim).
        """
        mcfg = self.cfg.model
        if flow_reps is None and "Flow" in mcfg.modalities:
            raise ValueError(
                f"model modalities={mcfg.modalities!r} require flow "
                "representations but none were supplied (flow store "
                "missing?); extract flow or assess with -mod RGB")
        out = {"reps": {0: [], 1: [], 2: []}, "probs": {0: [], 1: [], 2: []},
               "attention": [], "importance": []}
        for _, row in segments.iterrows():
            policy = RACE_POLICIES[row["RACE"]]
            s, e = race_window(int(row["StartFrame"]), int(row["EndFrame"]),
                               row["RACE"])
            for ti, off in enumerate(policy.tta_offsets):
                idx = policy_indices(s, e, policy, off)
                f = len(idx)
                fb = self._bucket(f)
                rgb = np.zeros((1, 1, fb, rgb_reps.shape[1]), np.float32)
                rgb[0, 0, :f] = rgb_reps[idx]
                rgb_mask = np.zeros((1, 1, fb + 1), bool)
                rgb_mask[0, 0, f + 1:] = True
                flow = flow_mask = None
                if flow_reps is not None and mcfg.modalities != "RGB":
                    fidx, fvalid = flow_indices_for(idx[None], len(flow_reps),
                                                    self.cfg.window)
                    nf = int(fvalid[0].sum())
                    fbk = self._bucket(max(nf, 1))
                    flow = np.zeros((1, 1, fbk, flow_reps.shape[1]),
                                    np.float32)
                    flow[0, 0, :nf] = flow_reps[fidx[0][fvalid[0]]]
                    flow_mask = np.zeros((1, 1, fbk + 1), bool)
                    flow_mask[0, 0, nf + 1:] = True
                rep, probs, attn, imps = self._fn(
                    self.params, self.protos, jnp.asarray(rgb),
                    jnp.asarray(rgb_mask),
                    None if flow is None else jnp.asarray(flow),
                    None if flow_mask is None else jnp.asarray(flow_mask))
                out["reps"][ti].append(np.asarray(rep[0]))
                out["probs"][ti].append(np.asarray(probs[0]))
                if ti == 0:
                    # attention from the first TTA augment only
                    # (prepare_model.py:313-314).  NOT full_model.
                    # cls_attention: the dense export must keep the
                    # reference's FULL (F+1, F+1) matrix (train.py:117
                    # attention_<ph> layout); only the flash path reduces
                    # to the CLS-query row (B*S, F+1).
                    if attn.ndim == 2:
                        out["attention"].append(np.asarray(attn[0, :f + 1]))
                    else:
                        out["attention"].append(
                            np.asarray(attn[0, :f + 1, :f + 1]))
                    if imps is not None:
                        # drop CLS slot, trim to xlen (perform_training:182)
                        out["importance"].append(
                            np.asarray(imps[0, 0, 1:f + 1, 0]))
        return out


class StepRecognizer:
    """Sub-phase recognition over long videos via 10 s / 5 s windows."""

    def __init__(self, decoder, fps: float = 20.0,
                 class_names: Sequence[str] = ("Needle Handling",
                                               "Needle Driving",
                                               "Needle Withdrawal")):
        """decoder: a GestureDecoder built with the step-task fold params
        and a WindowConfig from data.tasks.step_window_config(fps)."""
        self.decoder = decoder
        self.fps = fps
        self.class_names = list(class_names)

    def recognize(self, video: str, rgb_reps: np.ndarray,
                  flow_reps: Optional[np.ndarray]) -> pd.DataFrame:
        wcfg = self.decoder.cfg.window
        if (int(wcfg.duration_s * wcfg.fps) != int(10 * self.fps)
                or wcfg.fps != self.fps):
            raise ValueError(
                "StepRecognizer fps does not match the decoder's window "
                "config — build the GestureDecoder with "
                f"data.tasks.step_window_config({self.fps})")
        probs = self.decoder.window_probs(video, rgb_reps, flow_reps)
        manifest = step_window_manifest(video, len(rgb_reps), self.fps)
        preds = np.argmax(probs, axis=1)
        df = pd.DataFrame({
            "Video": video,
            "StartFrame": manifest.start_frames,
            "EndFrame": manifest.end_frames,
            "Step": [self.class_names[p] for p in preds],
        })
        for c, name in enumerate(self.class_names):
            df[name] = probs[:, c]
        return df
