"""Checkpoint / resume (reference aux subsystem: SURVEY.md section 5.4).

Reference behaviors covered:
- SAIS training saves best-val params/prototypes/metrics once at the end
  (train.py:105-112) -> `save_training_result`;
- DINO keeps an every-epoch restartable checkpoint with optimizer state and
  resumes from it transparently (utils.py:152-185, main_dino.py:468-479)
  -> CheckpointManager.save/restore_latest;
- inference artifacts (reps_and_labels/attention/importance per phase,
  train.py:113-121) -> `save_inference_artifacts`.

Backed by orbax (atomic, async-capable, sharding-aware) instead of
torch.save pickles; `export_torch_state_dict` converts back to the
reference's params.zip naming for interop.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class CheckpointManager:
    """Epoch-numbered restartable checkpoints (DINO-style)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: Any) -> None:
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore_latest(self, template: Any) -> Tuple[Optional[int], Any]:
        """Resume from the newest checkpoint; returns (step, state) or
        (None, template) when nothing is saved yet (the reference's
        'found checkpoint at ...' path, utils.py:160-165)."""
        ocp = _ocp()
        step = self._mgr.latest_step()
        if step is None:
            return None, template
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return step, state

    def close(self) -> None:
        self._mgr.close()


def save_training_result(savepath: str, result: Dict[str, Any]) -> None:
    """Persist the best-val snapshot the way the reference does at end of
    training (params/metrics/prototypes under params/Fold_<k>)."""
    os.makedirs(savepath, exist_ok=True)
    host = jax.tree.map(np.asarray, result)
    with open(os.path.join(savepath, "params.pkl"), "wb") as f:
        pickle.dump(host["model"], f)
    with open(os.path.join(savepath, "prototypes.pkl"), "wb") as f:
        pickle.dump(host["prototypes"], f)
    with open(os.path.join(savepath, "metrics.pkl"), "wb") as f:
        pickle.dump(result.get("metrics", {}), f)


def load_training_result(savepath: str) -> Dict[str, Any]:
    out = {}
    for name in ("params", "prototypes", "metrics"):
        p = os.path.join(savepath, f"{name}.pkl")
        if os.path.exists(p):
            with open(p, "rb") as f:
                out[name] = pickle.load(f)
    return out


def save_inference_artifacts(savepath: str, phase: str,
                             reps_and_labels: Dict[str, Any],
                             attention: Optional[Any] = None,
                             importance: Optional[Any] = None) -> None:
    """Reference inference outputs (train.py:113-121): reps_and_labels_<ph>,
    attention_<ph>, importance_<ph>."""
    os.makedirs(savepath, exist_ok=True)
    payloads = {f"reps_and_labels_{phase}": reps_and_labels}
    if attention is not None:
        payloads[f"attention_{phase}"] = attention
    if importance is not None:
        payloads[f"importance_{phase}"] = importance
    for name, obj in payloads.items():
        with open(os.path.join(savepath, name + ".pkl"), "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, obj), f)


# ---------------------------------------------------------------------------
# Torch-interop export (inverse of port.torch_port)
# ---------------------------------------------------------------------------

def export_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """full_model param pytree -> reference fullModel state_dict naming
    (numpy values; feed to torch.save for drop-in params.zip interop).

    Every key carries the DDP 'module.' prefix: the reference's inference
    loader strips it unconditionally via param_name.split('module.')[1]
    (prepare_model.py:521-530), which raises IndexError on bare names, so
    unprefixed exports would not load there."""
    sd: Dict[str, np.ndarray] = {}

    def lin(prefix: str, p: Dict[str, Any]):
        sd[prefix + ".weight"] = np.asarray(p["w"]).T
        sd[prefix + ".bias"] = np.asarray(p["b"])

    sd["frame_cls"] = np.asarray(params["frame_cls"])[None]
    sd["clip_cls"] = np.asarray(params["clip_cls"])[None]
    for name, key in (("frame_pos_embeddings", "frame_pos"),
                      ("clip_pos_embeddings", "clip_pos")):
        table = np.asarray(params[key])
        for i in range(table.shape[0]):
            sd[f"{name}.{i}"] = table[i][None]
    for enc_name, key in (("transEncoderFrame", "frame_encoder"),
                          ("transEncoderClip", "clip_encoder")):
        for i, layer in enumerate(params[key]["layers"]):
            p = f"{enc_name}.layers.{i}."
            sd[p + "self_attn.in_proj_weight"] = np.asarray(layer["mha"]["in_w"]).T
            sd[p + "self_attn.in_proj_bias"] = np.asarray(layer["mha"]["in_b"])
            sd[p + "self_attn.out_proj.weight"] = np.asarray(layer["mha"]["out_w"]).T
            sd[p + "self_attn.out_proj.bias"] = np.asarray(layer["mha"]["out_b"])
            sd[p + "linear1.weight"] = np.asarray(layer["ff1_w"]).T
            sd[p + "linear1.bias"] = np.asarray(layer["ff1_b"])
            sd[p + "linear2.weight"] = np.asarray(layer["ff2_w"]).T
            sd[p + "linear2.bias"] = np.asarray(layer["ff2_b"])
            sd[p + "norm1.weight"] = np.asarray(layer["ln1_s"])
            sd[p + "norm1.bias"] = np.asarray(layer["ln1_b"])
            sd[p + "norm2.weight"] = np.asarray(layer["ln2_s"])
            sd[p + "norm2.bias"] = np.asarray(layer["ln2_b"])
    lin("linear", params["linear"])
    lin("linear2", params["linear2"])
    lin("attentionA", params["attentionA"])
    lin("attentionB", params["attentionB"])
    for c, p in params["attention_modules"].items():
        lin(f"attentionModules.{c}", p)
    for c, p in params["final_modules"].items():
        lin(f"finalModules.{c}", p)
    if "importance" in params:
        lin("importance_function", params["importance"])
    if "cls_head" in params:
        lin("cls_head", params["cls_head"])
    if "linearB" in params:
        lin("linearB", params["linearB"])
    return {"module." + k: v for k, v in sd.items()}


def export_torch_prototypes(keys: Sequence[str],
                            mat: Any) -> Dict[str, np.ndarray]:
    """Prototype matrix -> reference ParameterDict layout {key: (1, D)}."""
    mat = np.asarray(mat)
    return {k: mat[i][None] for i, k in enumerate(keys)}
