"""SAIS full temporal model — TPU-native redesign of the reference fullModel
(prepare_model.py:18-515), 'reps' data path with ViT features.

Pipeline per modality (reference forward, prepare_model.py:246-450):

  reps (B, S, F, D)
    + learned per-index positional embeddings (prepare_model.py:65-71, 189-192)
    -> prepend learned frame CLS token (prepare_model.py:193-194)
    -> 4L/4H transformer encoder with key-padding mask, which also emits the
       last layer's head-averaged attention (prepare_model.py:197-221)
    -> ReLU -> full sequence (B, S, F+1, D) and CLS track (B, S, D)

Task heads:
  Prototypes: mean over snippets -> optional RGB+Flow sum -> ReLU ->
    linear(384->256) video rep + aux logits (prepare_model.py:359-417);
  importance: linear(384->1) over the full sequence (prepare_model.py:419-421);
  MIL: clip transformer + gated-attention head (prepare_model.py:452-488);
  ClassificationHead: cls_head over CLS track (prepare_model.py:423-440).

TPU-first design choices: everything is batch-major, static-shaped and
jittable; TTA versions are independent calls over bucket-padded arrays rather
than python lists of ragged tensors; masks are boolean (B, S, F+1) with True
= padding, matching the reference collator's convention
(prepare_dataset.py:2798-2806).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sais_tpu.config import ModelConfig
from sais_tpu.models import heads
from sais_tpu.models.temporal import encoder_forward, encoder_init

Params = Dict[str, Any]


class TemporalOutput(NamedTuple):
    full_seq: Optional[jnp.ndarray]  # (B, S, F+1, D) post-ReLU encoder
    cls_seq: jnp.ndarray    # (B, S, D) CLS-token track (frame mean w/o -sa)
    # Last layer's head-averaged attention: (B*S, F+1, F+1) on the dense
    # path, (B*S, F+1) CLS-query row on the flash path (the only row SAIS
    # exports, prepare_model.py:221), or (1, 1) placeholder without -sa.
    attn: jnp.ndarray


def cls_attention(attn: jnp.ndarray) -> jnp.ndarray:
    """Normalize either attention form to the CLS-query row (B*S, F+1):
    dense (B*S, F+1, F+1) -> row 0; flash already is the row."""
    return attn[:, 0, :] if attn.ndim == 3 else attn


def resolve_flash(cfg: ModelConfig, seq_len: int) -> bool:
    """Trace-time flash-attention decision for a padded sequence length.

    cfg.temporal.use_flash: True/False force; None = auto — fused Pallas
    attention on TPU once the padded length reaches flash_min_len (the
    regime where the dense path's (B*S, L, L) weight tensor dominates HBM;
    SURVEY §5.7).  Differentiable (Pallas flash backward), so the same
    rule applies in training.
    """
    t = cfg.temporal
    if t.use_flash is not None:
        return bool(t.use_flash)
    return seq_len >= t.flash_min_len and jax.default_backend() == "tpu"


def _linear(x, p):
    return jnp.dot(x, p["w"].astype(x.dtype),
                   preferred_element_type=x.dtype) + p["b"].astype(x.dtype)


def temporal_features(params: Params, reps: jnp.ndarray,
                      pad_mask: Optional[jnp.ndarray],
                      cfg: ModelConfig,
                      encoder_fn=None) -> TemporalOutput:
    """prepareInputForTransformer + aggregateInputs (prepare_model.py:179-221).

    reps: (B, S, F, D) padded frame features; pad_mask: (B, S, F+1) bool with
    True = padded key (slot 0 is the prepended CLS and is never padded).

    With cfg.self_attention=False (reference CLI without -sa,
    prepare_model.py:296-301, 352-355) the transformer, positional
    embeddings and CLS token are all skipped: the per-snippet track is a
    plain mean over the padded frame axis — INCLUDING zero pad rows, which
    is the reference's exact (quirky) torch.mean(x, 2) behavior — and the
    attention output is the reference's ones((1, 1)) placeholder.

    encoder_fn: optional override `(frame_encoder_params, x (B*S, F+1, D),
    mask (B*S, F+1)|None) -> (out, attn)` replacing the dense/flash
    encoder — e.g. the sequence-parallel ring (parallel/sequence.py).
    """
    if not cfg.self_attention:
        return TemporalOutput(None, jnp.mean(reps, axis=2),
                              jnp.ones((1, 1), reps.dtype))
    b, s, f, d = reps.shape
    x = reps + params["frame_pos"][:f].astype(reps.dtype)[None, None]
    cls = jnp.broadcast_to(params["frame_cls"].astype(reps.dtype),
                           (b, s, 1, d))
    x = jnp.concatenate([cls, x], axis=2)                # (B, S, F+1, D)
    x = x.reshape(b * s, f + 1, d)
    mask = pad_mask.reshape(b * s, f + 1) if pad_mask is not None else None
    if encoder_fn is None:
        use_flash = resolve_flash(cfg, f + 1)
        out, attn = encoder_forward(params["frame_encoder"], x, cfg.temporal,
                                    mask, use_flash=use_flash,
                                    interpret=use_flash
                                    and jax.default_backend() != "tpu")
    else:
        out, attn = encoder_fn(params["frame_encoder"], x, mask)
    out = jax.nn.relu(out)
    full_seq = out.reshape(b, s, f + 1, d)
    return TemporalOutput(full_seq, full_seq[:, :, 0, :], attn)


class PrototypesOutput(NamedTuple):
    video_rep: jnp.ndarray          # (B, proj_dim)
    aux_logits: jnp.ndarray         # (B, 3) — reference 'output_logits'
    attn: jnp.ndarray               # (B*S, F+1, F+1)
    importances: Optional[jnp.ndarray]  # (B, S, F+1, 1) when head enabled


def prototypes_forward(params: Params, cfg: ModelConfig,
                       rgb: Optional[jnp.ndarray] = None,
                       rgb_mask: Optional[jnp.ndarray] = None,
                       flow: Optional[jnp.ndarray] = None,
                       flow_mask: Optional[jnp.ndarray] = None,
                       primary_domain: Optional[jnp.ndarray] = None,
                       encoder_fn=None
                       ) -> PrototypesOutput:
    """Prototypes-task forward for one (TTA) version of the inputs.

    Follows prepare_model.py:304-421: each modality runs the shared frame
    encoder; snippet CLS tracks are mean-pooled over snippets; for RGB-Flow
    the pooled reps are SUMMED before projection; attention comes from the
    RGB stream when present, else flow (prepare_model.py:314,326).

    primary_domain: optional (B,) bool for the multi-task setting ('+' in
    domain, prepare_model.py:406-416): True rows project through `linear`
    (the NH_02 head), False rows through `linearB`.

    encoder_fn: optional frame-encoder override (see temporal_features).
    """
    use_rgb = cfg.modalities in ("RGB", "RGB-Flow")
    use_flow = cfg.modalities in ("Flow", "RGB-Flow")

    pooled = None
    attn = None
    full_seq = None
    if use_rgb:
        t = temporal_features(params, rgb, rgb_mask, cfg, encoder_fn)
        pooled = jnp.mean(t.cls_seq, axis=1)             # (B, D)
        attn, full_seq = t.attn, t.full_seq
    if use_flow:
        tf = temporal_features(params, flow, flow_mask, cfg, encoder_fn)
        fpooled = jnp.mean(tf.cls_seq, axis=1)
        pooled = fpooled if pooled is None else pooled + fpooled
        if attn is None:
            attn, full_seq = tf.attn, tf.full_seq

    act = jax.nn.relu(pooled)
    if primary_domain is not None and "linearB" not in params:
        # params/config mismatch: routing secondary-domain rows through
        # the primary head would silently produce wrong video reps
        raise ValueError(
            "primary_domain given but params have no 'linearB' head — "
            "these params were initialized without multi_task "
            "(prepare_model.py:47-50 linearB)")
    if primary_domain is not None and "linearB" in params:
        rep_a = _linear(act, params["linear"])
        rep_b = _linear(act, params["linearB"])
        video_rep = jnp.where(primary_domain[:, None], rep_a, rep_b)
    else:
        video_rep = _linear(act, params["linear"])
    aux_logits = _linear(jax.nn.relu(video_rep), params["linear2"])
    importances = None
    if cfg.importance_head and "importance" in params and full_seq is not None:
        importances = heads.importance_scores(full_seq, params)
    return PrototypesOutput(video_rep, aux_logits, attn, importances)


def classification_forward(params: Params, cfg: ModelConfig,
                           rgb: Optional[jnp.ndarray] = None,
                           rgb_mask: Optional[jnp.ndarray] = None,
                           flow: Optional[jnp.ndarray] = None,
                           flow_mask: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """ClassificationHead task (prepare_model.py:423-440).

    Single-modality: cls_head over the per-snippet CLS track (B, S, C);
    RGB-Flow: tracks are summed then mean-pooled over snippets -> (B, C).
    """
    if cfg.modalities == "RGB":
        t = temporal_features(params, rgb, rgb_mask, cfg)
        return _linear(jax.nn.relu(t.cls_seq), params["cls_head"])
    if cfg.modalities == "Flow":
        t = temporal_features(params, flow, flow_mask, cfg)
        return _linear(jax.nn.relu(t.cls_seq), params["cls_head"])
    tr = temporal_features(params, rgb, rgb_mask, cfg)
    tf = temporal_features(params, flow, flow_mask, cfg)
    summed = tr.cls_seq + tf.cls_seq
    return _linear(jax.nn.relu(jnp.mean(summed, axis=1)), params["cls_head"])


def clip_reps(params: Params, snip_seq: jnp.ndarray,
              cfg: ModelConfig) -> jnp.ndarray:
    """getClipReps (prepare_model.py:452-467): clip pos-embeddings + clip
    transformer (unmasked) + ReLU.  snip_seq: (B, S, D) -> (B, S, D)."""
    b, s, d = snip_seq.shape
    x = snip_seq + params["clip_pos"][:s].astype(snip_seq.dtype)[None]
    out, _ = encoder_forward(params["clip_encoder"], x, cfg.temporal, None)
    return jax.nn.relu(out)


def mil_forward(params: Params, cfg: ModelConfig, rgb: jnp.ndarray,
                rgb_mask: Optional[jnp.ndarray]
                ) -> Tuple[jnp.ndarray, Dict[int, jnp.ndarray]]:
    """MIL task (prepare_model.py:359-363): frame encoder -> clip encoder ->
    gated-attention MIL head.  Returns (logits (B, C), {class: attn})."""
    t = temporal_features(params, rgb, rgb_mask, cfg)
    reps = clip_reps(params, t.cls_seq, cfg)
    return heads.mil_head(reps, params, cfg.nclasses)


def full_model_init(key: jax.Array, cfg: ModelConfig) -> Params:
    """Random init mirroring the reference inventory (prepare_model.py:47-96):
    uniform[0,1) CLS tokens and pos-embedding tables (torch.rand), torch
    Linear default init elsewhere."""
    d, e = cfg.rep_dim, cfg.proj_dim
    ks = jax.random.split(key, 16)

    def lin(k, fi, fo):
        lim = (1.0 / fi) ** 0.5
        kw, kb = jax.random.split(k)
        return {"w": jax.random.uniform(kw, (fi, fo), minval=-lim, maxval=lim),
                "b": jax.random.uniform(kb, (fo,), minval=-lim, maxval=lim)}

    params: Params = {
        "frame_cls": jax.random.uniform(ks[0], (d,)),
        "clip_cls": jax.random.uniform(ks[1], (d,)),
        "frame_pos": jax.random.uniform(ks[2], (cfg.temporal.max_positions, d)),
        "clip_pos": jax.random.uniform(ks[3], (cfg.temporal.max_positions, d)),
        "frame_encoder": encoder_init(ks[4], cfg.temporal),
        "clip_encoder": encoder_init(ks[5], cfg.temporal),
        "linear": lin(ks[6], d, e),
        "linear2": lin(ks[7], e, cfg.aux_logit_dim),
        "attentionA": lin(ks[8], d, e),
        "attentionB": lin(ks[9], d, e),
        "attention_modules": {
            str(c): lin(jax.random.fold_in(ks[10], c), e, 1)
            for c in range(cfg.n_attention_classes)},
        "final_modules": {
            str(c): lin(jax.random.fold_in(ks[11], c), d, 1)
            for c in range(cfg.n_attention_classes)},
    }
    if cfg.importance_head:
        params["importance"] = lin(ks[12], d, 1)
    if cfg.data_type == "raw":
        params["cls_head"] = lin(ks[13], d, cfg.nclasses)
    if cfg.multi_task:
        params["linearB"] = lin(ks[14], d, e)  # prepare_model.py:48-49
    return params


def prototypes_init(key: jax.Array, nclasses: int,
                    proj_dim: int = 256) -> Tuple[list, jnp.ndarray]:
    """Fresh prototypes: keys '0'..'nclasses-1', uniform[0,1) rows
    (prepare_model.py:555-560)."""
    keys = [str(i) for i in range(nclasses)]
    mat = jax.random.uniform(key, (nclasses, proj_dim))
    return keys, mat
