"""PyTorch state_dict -> JAX pytree weight converters.

These map the reference checkpoints onto the TPU-native parameter layout:

- DINO ViT (`dino_deitsmall16_pretrain.pth`, loaded by
  extract_representations.py:181-203) -> sais_tpu.models.vit params;
- SAIS fullModel `params.zip` (loaded with `module.` prefix stripping,
  prepare_model.py:521-530) -> sais_tpu.models.full_model params;
- `prototypes.zip` ParameterDict (prepare_model.py:561-564) -> (keys, matrix).

Torch is only needed to *read* .pth/.zip pickles; the converters themselves
accept any mapping of name -> array-like, so tests can feed numpy dicts.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def _np(x: Any) -> np.ndarray:
    """Convert a torch tensor / numpy array to a float32-preserving ndarray."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip DataParallel's 'module.' prefix (prepare_model.py:524-527)."""
    out = {}
    for k, v in state_dict.items():
        out[k.split("module.", 1)[1] if k.startswith("module.") else k] = v
    return out


def strip_dino_student_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Surgical-pretrain DINO ckpts store 'student.module.backbone.*' and an
    MLP head; keep backbone weights under bare names
    (extract_representations.py:190-199).

    Full DINO training checkpoints nest the state dicts
    ({'student': OrderedDict, 'teacher': ..., 'optimizer': ...}); the
    reference unwraps checkpoint['student'] first (:195) — do the same
    instead of mangling the nested dict into a single '' key."""
    if "student" in state_dict and hasattr(state_dict["student"], "items"):
        state_dict = state_dict["student"]
    out = {}
    for k, v in state_dict.items():
        if "head" in k:
            continue
        parts = k.split(".")
        while parts and parts[0] in ("student", "teacher", "module", "backbone"):
            parts = parts[1:]
        out[".".join(parts)] = v
    return out


# ---------------------------------------------------------------------------
# DINO ViT
# ---------------------------------------------------------------------------

def vit_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """DINO-naming state_dict -> sais_tpu.models.vit param pytree.

    Expected keys (dino-main/vision_transformer.py):
      cls_token, pos_embed, patch_embed.proj.{weight,bias},
      blocks.{i}.norm1.{weight,bias}, blocks.{i}.attn.qkv.{weight,bias},
      blocks.{i}.attn.proj.{weight,bias}, blocks.{i}.norm2.{weight,bias},
      blocks.{i}.mlp.fc1.{weight,bias}, blocks.{i}.mlp.fc2.{weight,bias},
      norm.{weight,bias}
    """
    sd = {k: _np(v) for k, v in sd.items()}
    conv_w = sd["patch_embed.proj.weight"]           # (D, C, kh, kw)
    d = conv_w.shape[0]
    # (D, C, kh, kw) -> (kh, kw, C, D) -> (kh*kw*C, D) to match patchify order.
    pe_w = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)

    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    blocks: List[Dict[str, Any]] = []
    for i in range(depth):
        p = f"blocks.{i}."
        blocks.append({
            "ln1_s": jnp.asarray(sd[p + "norm1.weight"]),
            "ln1_b": jnp.asarray(sd[p + "norm1.bias"]),
            "attn": {
                # torch Linear stores (out, in); JAX matmul wants (in, out).
                "qkv_w": jnp.asarray(sd[p + "attn.qkv.weight"].T),
                "qkv_b": (jnp.asarray(sd[p + "attn.qkv.bias"])
                          if p + "attn.qkv.bias" in sd else None),
                "proj_w": jnp.asarray(sd[p + "attn.proj.weight"].T),
                "proj_b": jnp.asarray(sd[p + "attn.proj.bias"]),
            },
            "ln2_s": jnp.asarray(sd[p + "norm2.weight"]),
            "ln2_b": jnp.asarray(sd[p + "norm2.bias"]),
            "mlp": {
                "fc1_w": jnp.asarray(sd[p + "mlp.fc1.weight"].T),
                "fc1_b": jnp.asarray(sd[p + "mlp.fc1.bias"]),
                "fc2_w": jnp.asarray(sd[p + "mlp.fc2.weight"].T),
                "fc2_b": jnp.asarray(sd[p + "mlp.fc2.bias"]),
            },
        })
    return {
        "patch_embed": {"w": jnp.asarray(pe_w),
                        "b": jnp.asarray(sd["patch_embed.proj.bias"])},
        "cls_token": jnp.asarray(sd["cls_token"]),
        "pos_embed": jnp.asarray(sd["pos_embed"]),
        "blocks": blocks,
        "ln_s": jnp.asarray(sd["norm.weight"]),
        "ln_b": jnp.asarray(sd["norm.bias"]),
    }


# ---------------------------------------------------------------------------
# SAIS temporal fullModel
# ---------------------------------------------------------------------------

def _mha_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.MultiheadAttention params -> our layout."""
    return {
        "in_w": jnp.asarray(_np(sd[prefix + "in_proj_weight"]).T),   # (D, 3D)
        "in_b": jnp.asarray(_np(sd[prefix + "in_proj_bias"])),
        "out_w": jnp.asarray(_np(sd[prefix + "out_proj.weight"]).T),
        "out_b": jnp.asarray(_np(sd[prefix + "out_proj.bias"])),
    }


def _encoder_layer_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.TransformerEncoderLayer params -> our layout."""
    return {
        "mha": _mha_from_torch(sd, prefix + "self_attn."),
        "ff1_w": jnp.asarray(_np(sd[prefix + "linear1.weight"]).T),
        "ff1_b": jnp.asarray(_np(sd[prefix + "linear1.bias"])),
        "ff2_w": jnp.asarray(_np(sd[prefix + "linear2.weight"]).T),
        "ff2_b": jnp.asarray(_np(sd[prefix + "linear2.bias"])),
        "ln1_s": jnp.asarray(_np(sd[prefix + "norm1.weight"])),
        "ln1_b": jnp.asarray(_np(sd[prefix + "norm1.bias"])),
        "ln2_s": jnp.asarray(_np(sd[prefix + "norm2.weight"])),
        "ln2_b": jnp.asarray(_np(sd[prefix + "norm2.bias"])),
    }


def _encoder_from_torch(sd: Mapping[str, Any], prefix: str,
                        num_layers: int) -> Dict[str, Any]:
    return {"layers": [
        _encoder_layer_from_torch(sd, f"{prefix}layers.{i}.")
        for i in range(num_layers)
    ]}


def _pos_table_from_torch(sd: Mapping[str, Any], prefix: str) -> jnp.ndarray:
    """ParameterDict {str(i): (1, D)} (prepare_model.py:65-71) -> (N, D)."""
    idx = sorted((int(k[len(prefix):].split(".")[0]) for k in sd
                  if k.startswith(prefix)))
    rows = [_np(sd[f"{prefix}{i}"]).reshape(-1) for i in idx]
    return jnp.asarray(np.stack(rows))


def _linear_from_torch(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {"w": jnp.asarray(_np(sd[prefix + "weight"]).T),
            "b": jnp.asarray(_np(sd[prefix + "bias"]))}


def full_model_params_from_torch(sd: Mapping[str, Any],
                                 num_layers: int = 4) -> Dict[str, Any]:
    """SAIS fullModel state_dict (params.zip) -> full_model param pytree.

    Mirrors the parameter inventory of prepare_model.py:18-101: projection
    heads, frame/clip CLS tokens, 2000-slot pos-embedding ParameterDicts,
    two 4-layer transformer encoders and the gated-attention MIL modules.
    Optional members (importance_function, cls_head, linearB) convert when
    present.
    """
    sd = strip_module_prefix(sd)
    params: Dict[str, Any] = {
        "frame_cls": jnp.asarray(_np(sd["frame_cls"]).reshape(-1)),
        "clip_cls": jnp.asarray(_np(sd["clip_cls"]).reshape(-1)),
        "frame_pos": _pos_table_from_torch(sd, "frame_pos_embeddings."),
        "clip_pos": _pos_table_from_torch(sd, "clip_pos_embeddings."),
        "frame_encoder": _encoder_from_torch(sd, "transEncoderFrame.", num_layers),
        "clip_encoder": _encoder_from_torch(sd, "transEncoderClip.", num_layers),
        "linear": _linear_from_torch(sd, "linear."),
        "linear2": _linear_from_torch(sd, "linear2."),
        "attentionA": _linear_from_torch(sd, "attentionA."),
        "attentionB": _linear_from_torch(sd, "attentionB."),
        "attention_modules": {},
        "final_modules": {},
    }
    for k in sd:
        if k.startswith("attentionModules.") and k.endswith(".weight"):
            name = k.split(".")[1]
            params["attention_modules"][name] = _linear_from_torch(
                sd, f"attentionModules.{name}.")
        if k.startswith("finalModules.") and k.endswith(".weight"):
            name = k.split(".")[1]
            params["final_modules"][name] = _linear_from_torch(
                sd, f"finalModules.{name}.")
    if "importance_function.weight" in sd:
        params["importance"] = _linear_from_torch(sd, "importance_function.")
    if "cls_head.weight" in sd:
        params["cls_head"] = _linear_from_torch(sd, "cls_head.")
    if "linearB.weight" in sd:
        params["linearB"] = _linear_from_torch(sd, "linearB.")
    return params


def prototypes_from_torch(proto_dict: Mapping[str, Any]
                          ) -> Tuple[List[str], jnp.ndarray]:
    """prototypes.zip ParameterDict -> (ordered keys, (P, 256) matrix).

    Key order follows dict insertion order, matching
    `torch.vstack(list(gesture_prototypes.values()))`
    (prepare_miscellaneous.py:16).
    """
    keys = list(proto_dict.keys())
    mat = np.stack([_np(proto_dict[k]).reshape(-1) for k in keys])
    return keys, jnp.asarray(mat)


def load_torch_pickle(path: str) -> Any:
    """Read a torch.save artifact (params.zip / prototypes.zip / reps)."""
    import torch  # local import: torch only needed for real checkpoints
    return torch.load(path, map_location="cpu", weights_only=False)
