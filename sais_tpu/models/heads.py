"""Classification heads: prototype cosine-softmax, gated-attention MIL,
importance head.

Reference behaviors replicated:
- prototype similarity = exp(cosine) normalized over prototypes
  (prepare_miscellaneous.py:14-46, :97-161; process_inference_results.py:76-91);
- label -> prototype column by string equality with argmax-of-booleans
  semantics: a label matching no prototype key maps to column 0
  (prepare_miscellaneous.py:37 'np.argmax(p_labels == s_labels, 1)');
- gated-attention MIL: per-class softmax(tanh(Ax) * sigmoid(Bx) -> w) pooling
  and per-class scoring (prepare_model.py:131-148, 469-488).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    # reference divides by the plain L2 norm with no epsilon
    # (prepare_miscellaneous.py:17,26) — keep identical semantics.
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


def prototype_similarities(video_reps: jnp.ndarray,
                           prototypes: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity of L2-normalized reps vs prototypes.

    video_reps: (B, D); prototypes: (P, D) -> (B, P).
    """
    s = _l2_normalize(video_reps.astype(jnp.float32))
    p = _l2_normalize(prototypes.astype(jnp.float32))
    return jnp.dot(s, p.T, preferred_element_type=jnp.float32)


def prototype_probs(video_reps: jnp.ndarray,
                    prototypes: jnp.ndarray) -> jnp.ndarray:
    """probs = exp(sim) / sum(exp(sim)) == softmax over prototypes
    (process_inference_results.py:88-91)."""
    return jax.nn.softmax(prototype_similarities(video_reps, prototypes), -1)


def labels_to_prototype_columns(labels: Sequence[Any],
                                prototype_keys: Sequence[str]) -> np.ndarray:
    """String-match labels to prototype columns, preserving the reference's
    argmax quirk: no match -> column 0 (prepare_miscellaneous.py:32-37)."""
    keys = list(prototype_keys)
    cols = []
    for lab in labels:
        s = str(lab)
        cols.append(keys.index(s) if s in keys else 0)
    return np.asarray(cols, dtype=np.int32)


def nce_loss(video_reps: jnp.ndarray, prototypes: jnp.ndarray,
             label_cols: jnp.ndarray) -> jnp.ndarray:
    """Temperature-free cosine InfoNCE against prototypes
    (prepare_miscellaneous.py:14-46): loss = -mean(log softmax(sim)[i, col_i]).
    """
    sim = prototype_similarities(video_reps, prototypes)
    logp = jax.nn.log_softmax(sim, axis=-1)
    picked = jnp.take_along_axis(logp, label_cols[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)


def gated_attention_pool(snip_reps: jnp.ndarray, p: Params,
                         category: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gated-attention MIL pooling for one class (prepare_model.py:131-143).

    snip_reps: (B, S, D) -> (video_rep (B, D), attention (B, S)).
    """
    a = jnp.tanh(snip_reps @ p["attentionA"]["w"] + p["attentionA"]["b"])
    g = jax.nn.sigmoid(snip_reps @ p["attentionB"]["w"] + p["attentionB"]["b"])
    gated = a * g                                            # (B, S, E)
    m = p["attention_modules"][category]
    scores = gated @ m["w"] + m["b"]                         # (B, S, 1)
    attn = jax.nn.softmax(scores, axis=1)[..., 0]            # (B, S)
    video_rep = jnp.einsum("bs,bsd->bd", attn, snip_reps)
    return video_rep, attn


def mil_head(snip_reps: jnp.ndarray, p: Params, nclasses: int
             ) -> Tuple[jnp.ndarray, Dict[int, jnp.ndarray]]:
    """Attention-based MIL head (prepare_model.py:469-488).

    snip_reps: (B, S, D) -> (logits (B, nclasses), {class: attention (B, S)}).
    """
    n_modules = len(p["final_modules"])
    if nclasses > n_modules:
        raise ValueError(
            f"MIL head has {n_modules} per-class modules "
            f"(ModelConfig.n_attention_classes) but nclasses={nclasses}; "
            "raise n_attention_classes to at least nclasses "
            "(the reference hardcodes 3, prepare_model.py:88-91)")
    scores: List[jnp.ndarray] = []
    attention: Dict[int, jnp.ndarray] = {}
    for c in range(nclasses):
        name = str(c)
        video_rep, attn = gated_attention_pool(snip_reps, p, name)
        f = p["final_modules"][name]
        scores.append(video_rep @ f["w"] + f["b"])           # (B, 1)
        attention[c] = attn
    return jnp.concatenate(scores, axis=1), attention


def importance_scores(full_seq: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Per-frame importance logits (prepare_model.py:419-421):
    full_seq (B, S, F+1, D) -> (B, S, F+1, 1), CLS slot included as in ref."""
    return full_seq @ p["importance"]["w"] + p["importance"]["b"]


def entropy(probs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Prediction entropy -sum(p log p) (process_inference_results.py:131)."""
    return -jnp.sum(probs * jnp.log(probs), axis=axis)
