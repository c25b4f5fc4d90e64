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
from sais_tpu.config import VUA_FPS_TABLE
from sais_tpu.data.tasks import (policy_indices, race_window,
                                 step_window_manifest)
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

    def set_fold(self, model_params, prototypes: jnp.ndarray) -> None:
        """Swap in another fold's weights.  params/protos are traced
        ARGUMENTS of the jitted step, so reusing one assessor across
        folds hits the same compiled program; constructing a fresh
        assessor per fold would recompile the identical XLA program
        once per fold (tens of seconds each through a remote-compile
        tunnel)."""
        self.params = model_params
        self.protos = prototypes

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
                        segments: pd.DataFrame, phase: str = "",
                        videoname: str = "",
                        flow_jump: Optional[int] = None,
                        fps_table=VUA_FPS_TABLE) -> Dict[str, List]:
        """segments: DataFrame with RACE + the per-RACE frame columns
        (preferred — reference-exact windows/strides via
        data.skill.skill_segment_indices, incl. the AFB_inference
        Needle-Handling stride-120 low-pass) or StartFrame/EndFrame.

        phase selects the sampling policy AND the flow jump
        (prepare_dataset.py:2239-2249 — fixed tables for Gronau/HMH/Lab/
        AFB, the row's RGB stride for the no-branch phases, the VUA fps
        table otherwise); an explicit flow_jump overrides.

        Returns per-TTA reps/probs plus per-segment attention rows and
        importance scores (trimmed to real frames, matching
        perform_training.py:177-185's CLS-drop and length trim).
        """
        from sais_tpu.data.skill import (RACE_FRAME_COLUMNS, _flow_jump,
                                         _skill_policy,
                                         skill_segment_indices)
        mcfg = self.cfg.model
        if flow_reps is None and "Flow" in mcfg.modalities:
            raise ValueError(
                f"model modalities={mcfg.modalities!r} require flow "
                "representations but none were supplied (flow store "
                "missing?); extract flow or assess with -mod RGB")
        # TTA slots keyed by offset index — populated from the policies'
        # actual tta_offsets (3 for every reference policy) rather than a
        # hardcoded {0,1,2}, so a shorter/longer offset list cannot leave
        # silently-empty slots behind
        out = {"reps": {}, "probs": {}, "attention": [], "importance": []}
        for _, row in segments.iterrows():
            policy = _skill_policy(row["RACE"], phase)
            cols = RACE_FRAME_COLUMNS[row["RACE"]]
            use_race_cols = all(c in row.index for c in cols)
            if not use_race_cols:
                s, e = race_window(int(row["StartFrame"]),
                                   int(row["EndFrame"]), row["RACE"])
            for ti, off in enumerate(policy.tta_offsets):
                if use_race_cols:
                    idx = skill_segment_indices(row, phase, off)
                else:
                    idx = policy_indices(s, e, policy, off)
                f = len(idx)
                fb = self._bucket(f)
                rgb = np.zeros((1, 1, fb, rgb_reps.shape[1]), np.float32)
                rgb[0, 0, :f] = rgb_reps[idx]
                rgb_mask = np.zeros((1, 1, fb + 1), bool)
                rgb_mask[0, 0, f + 1:] = True
                flow = flow_mask = None
                if flow_reps is not None and mcfg.modalities != "RGB":
                    # EASE semantics (prepare_dataset.py:2250-2252):
                    # unique(idx // jump), NOT bounds-clipped (the
                    # reference raises on out-of-range flow rows)
                    stride = (int(idx[1] - idx[0]) if len(idx) > 1 else 1)
                    jump = (flow_jump if flow_jump is not None
                            else _flow_jump(videoname, fps_table, phase,
                                            rgb_stride=stride))
                    fidx = np.unique(idx // jump)
                    nf = len(fidx)
                    fbk = self._bucket(max(nf, 1))
                    flow = np.zeros((1, 1, fbk, flow_reps.shape[1]),
                                    np.float32)
                    flow[0, 0, :nf] = flow_reps[fidx]
                    flow_mask = np.zeros((1, 1, fbk + 1), bool)
                    flow_mask[0, 0, nf + 1:] = True
                rep, probs, attn, imps = self._fn(
                    self.params, self.protos, jnp.asarray(rgb),
                    jnp.asarray(rgb_mask),
                    None if flow is None else jnp.asarray(flow),
                    None if flow_mask is None else jnp.asarray(flow_mask))
                out["reps"].setdefault(ti, []).append(np.asarray(rep[0]))
                out["probs"].setdefault(ti, []).append(np.asarray(probs[0]))
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
