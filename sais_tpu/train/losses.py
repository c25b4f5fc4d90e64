"""Training losses (reference: prepare_miscellaneous.py).

- NCE prototype loss lives in sais_tpu.models.heads (shared with inference).
- Importance loss replicates calcImportanceLoss (:48-60) INCLUDING its
  broadcast quirk: the elementwise BCE is reduced to a scalar FIRST, then
  multiplied by the inverted pad mask and averaged over low-skill rows — so
  the result equals mean_BCE * mean(valid_mask over low-skill rows).  The
  reference's checkpoints were trained with this objective, so we preserve
  it verbatim (a corrected masked-BCE is available as masked_importance_loss
  for new training runs).
- Cross-entropy / BCE for the MIL and ClassificationHead tasks (:62-95).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sais_tpu.models.heads import nce_loss  # re-export  # noqa: F401


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCEWithLogits, numerically stable like torch."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def importance_loss_reference(output_importances: jnp.ndarray,
                              importances: jnp.ndarray,
                              ipad: jnp.ndarray,
                              labels: jnp.ndarray,
                              weight: Optional[jnp.ndarray] = None
                              ) -> jnp.ndarray:
    """calcImportanceLoss (prepare_miscellaneous.py:48-60), quirk preserved.

    output_importances: (B, S, F+1, 1) model scores (CLS at slot 0);
    importances: (B, S, F) per-frame targets; ipad: (B, S, F+1) bool pad
    mask; labels: (B,) int — only label==0 (low skill) rows contribute.
    weight: optional (B,) 0/1 real-row mask (mesh batch padding) — the
    quirky global BCE mean must average over REAL rows only, or the loss
    value (and its gradients, which flow through every row's scores via
    that mean) would depend on device count and batch divisibility.
    """
    scores = output_importances[:, :, 1:, 0]                  # (B, S, F)
    bce = _bce_with_logits(scores, importances)
    if weight is not None:
        w = weight[:, None, None]
        scalar = jnp.sum(bce * w) / jnp.maximum(
            jnp.sum(w) * bce.shape[1] * bce.shape[2], 1.0)
    else:
        scalar = jnp.mean(bce)                                # the quirk
    inv = (~ipad)[:, :, :-1].astype(jnp.float32)              # (B, S, F)
    per_entry = scalar * inv
    low = (labels == 0).astype(jnp.float32)                   # (B,)
    # mean over low-skill rows only; guard the empty case like torch's
    # mean-of-empty -> nan is avoided by returning 0
    denom = jnp.sum(low) * inv.shape[1] * inv.shape[2]
    total = jnp.sum(per_entry * low[:, None, None])
    return jnp.where(denom > 0, total / denom, 0.0)


def masked_importance_loss(output_importances: jnp.ndarray,
                           importances: jnp.ndarray, ipad: jnp.ndarray,
                           labels: jnp.ndarray) -> jnp.ndarray:
    """The loss the reference *intended*: per-frame BCE masked to valid
    frames of low-skill rows.  Use for new training runs."""
    scores = output_importances[:, :, 1:, 0]
    bce = _bce_with_logits(scores, importances)
    valid = (~ipad)[:, :, :-1].astype(jnp.float32)
    low = (labels == 0).astype(jnp.float32)[:, None, None]
    w = valid * low
    return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w), 1.0)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """nn.CrossEntropyLoss mean reduction (prepare_miscellaneous.py:75-76)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)


def binary_cross_entropy_logits(logits: jnp.ndarray,
                                labels: jnp.ndarray) -> jnp.ndarray:
    """nn.BCEWithLogitsLoss mean reduction (nclasses==1 path,
    perform_training.py:139-141)."""
    return jnp.mean(_bce_with_logits(logits.reshape(-1),
                                     labels.astype(jnp.float32).reshape(-1)))


def next_rep_mse(future_reps: jnp.ndarray, snip_reps: jnp.ndarray) -> jnp.ndarray:
    """Self-supervised next-representation MSE (calcSSLoss,
    prepare_miscellaneous.py:85-95)."""
    return jnp.mean(jnp.square(snip_reps[:, :-1, :] - future_reps[:, 1:, :]))


def temporal_coherence_loss(logits: jnp.ndarray,
                            logits_flipped: jnp.ndarray) -> jnp.ndarray:
    """Arrow-of-time pretext loss (calcTemporalCoherenceLoss,
    prepare_miscellaneous.py:212-229): CE toward class 0 for forward clips
    and class 1 for time-reversed clips, averaged."""
    b = logits.shape[0]
    la = cross_entropy(logits, jnp.zeros((b,), jnp.int32))
    lb = cross_entropy(logits_flipped,
                       jnp.ones((logits_flipped.shape[0],), jnp.int32))
    return (la + lb) / 2.0


def temporal_coherence_accuracy(logits: jnp.ndarray,
                                logits_flipped: jnp.ndarray) -> jnp.ndarray:
    """calcTemporalCoherenceAcc (prepare_miscellaneous.py:231-248)."""
    a = jnp.sum(jnp.argmax(logits, -1) == 0)
    b = jnp.sum(jnp.argmax(logits_flipped, -1) == 1)
    return (a + b) / (logits.shape[0] + logits_flipped.shape[0])
