"""MIL and ClassificationHead task trainers (reference task dispatch,
perform_training.py:112-153).

- MIL: clip transformer + gated-attention head, CrossEntropy (calcLoss,
  prepare_miscellaneous.py:62-83), optional next-representation MSE
  self-supervision;
- ClassificationHead: cls_head logits, BCEWithLogits when nclasses == 1
  else CrossEntropy (perform_training.py:138-153).

Shares the data-parallel mesh mechanics with PrototypeTrainer.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sais_tpu.config import ModelConfig, TrainConfig
from sais_tpu.models.full_model import classification_forward, mil_forward
from sais_tpu.parallel import mesh as mesh_lib
from sais_tpu.train import metrics as metrics_lib
from sais_tpu.train.losses import _bce_with_logits


def make_weighted_loss(logits_fn, nclasses: int):
    """loss_fn(params, batch) -> (loss, logits).

    CE (or BCEWithLogits when nclasses == 1) with the optional zero-weight
    masking for mesh-padded rows (pad_batch_with_weight contract): padded
    rows contribute neither to the loss nor to the gradients, mirroring
    PrototypeTrainer's masked NCE (train/loop.py).  One definition shared
    by every classification trainer so the padding semantics cannot
    diverge between paths."""

    def loss_fn(params, batch):
        logits = logits_fn(params, batch)
        labels = batch["labels"]
        weight = batch.get("weight")
        if nclasses == 1:
            per = _bce_with_logits(logits.reshape(-1),
                                   labels.astype(jnp.float32).reshape(-1))
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        if weight is None:
            loss = jnp.mean(per)
        else:
            loss = jnp.sum(per * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        return loss, logits

    return loss_fn


def r3d_head_logits(model, feats):
    """getR3Dreps semantics (prepare_model.py:232-244): per-snippet pos-emb
    + cls_head(relu(.)), mean-pooled over snippets."""
    s = feats.shape[1]
    reps = feats + model["frame_pos"][:s].astype(feats.dtype)[None]
    logits = jnp.dot(jax.nn.relu(reps), model["cls_head"]["w"]) \
        + model["cls_head"]["b"]
    return jnp.mean(logits, axis=1)


def make_train_step(optimizer, loss_fn):
    def train_step(params, opt_state, batch):
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    return train_step


class ClassificationTrainer:
    """Trainer for task='MIL' or task='ClassificationHead'."""

    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 model_params: Any, task: str = "MIL",
                 mesh: Optional["jax.sharding.Mesh"] = None):
        assert task in ("MIL", "ClassificationHead")
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.task = task
        self.mesh = mesh
        self.optimizer = optax.sgd(train_cfg.lr)
        self.params = model_params
        self.opt_state = self.optimizer.init(model_params)
        mcfg = model_cfg

        def logits_fn(params, batch):
            if task == "MIL":
                logits, _ = mil_forward(params, mcfg, batch["rgb"],
                                        batch.get("rgb_mask"))
                return logits
            logits = classification_forward(params, mcfg, batch.get("rgb"),
                                            batch.get("rgb_mask"),
                                            batch.get("flow"),
                                            batch.get("flow_mask"))
            if logits.ndim == 3:
                # single-modality head emits per-snippet logits (B, S, C)
                # (prepare_model.py:426-428); pool over snippets for the
                # batch-level loss, like the RGB-Flow branch does (:440)
                logits = jnp.mean(logits, axis=1)
            return logits

        loss_fn = make_weighted_loss(logits_fn, mcfg.nclasses)
        self._train_step = jax.jit(make_train_step(self.optimizer, loss_fn),
                                   donate_argnums=(0, 1))
        self._eval_step = jax.jit(loss_fn)
        if mesh is not None:
            self.params = mesh_lib.replicate(self.params, mesh)
            self.opt_state = mesh_lib.replicate(self.opt_state, mesh)

    def _device_batch(self, batch: Dict[str, np.ndarray]):
        if self.mesh is not None:
            return mesh_lib.shard_batch(
                mesh_lib.pad_batch_with_weight(
                    batch, mesh_lib.data_parallel_size(self.mesh)),
                self.mesh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _pre(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Hook for subclasses to transform host batches (e.g. frozen
        encoding of raw snippets) before device transfer."""
        return batch

    def run_epoch(self, batches: Iterable[Dict[str, np.ndarray]],
                  train: bool) -> Tuple[float, Dict[str, float]]:
        losses, sizes, all_logits, all_labels = [], [], [], []
        for batch in batches:
            n = len(batch["labels"])
            if "tta" not in batch:
                batch = self._pre(batch)
            if train:
                self.params, self.opt_state, loss, logits = self._train_step(
                    self.params, self.opt_state, self._device_batch(batch))
                loss, logits = float(loss), np.asarray(logits)[:n]
            elif "tta" in batch:
                # 3-way TTA at val/test: loss = mean of per-augment losses
                # (perform_training.py:141-149), metrics on the TTA
                # logit-mean (calcMetrics, prepare_miscellaneous.py:171-173)
                tta_losses, tta_logits = [], []
                for variant in batch["tta"]:
                    v = self._pre({k: x for k, x in variant.items()
                                   if k != "tta"})
                    l, lg = self._eval_step(self.params,
                                            self._device_batch(v))
                    tta_losses.append(float(l))
                    tta_logits.append(np.asarray(lg)[:n])
                loss = float(np.mean(tta_losses))
                logits = np.mean(np.stack(tta_logits), axis=0)
            else:
                loss, logits = self._eval_step(self.params,
                                               self._device_batch(batch))
                loss, logits = float(loss), np.asarray(logits)[:n]
            losses.append(loss * n)
            sizes.append(n)
            all_logits.append(logits)
            all_labels.append(np.asarray(batch["labels"]))
        total = max(sum(sizes), 1)
        logits = np.concatenate(all_logits) if all_logits else np.zeros((0, 2))
        labels = np.concatenate(all_labels) if all_labels else np.zeros((0,))
        m = metrics_lib.logits_metrics([logits], labels,
                                       self.model_cfg.nclasses) \
            if len(labels) else {}
        m["loss"] = sum(losses) / total
        return m["loss"], m


class RawClassificationTrainer(ClassificationTrainer):
    """ClassificationHead training on RAW video snippets
    (run_experiments.py '-fe', prepare_model.py:112-124).

    Reference semantics (prepare_model.py:232-244, 423-440):
    - R3D: per-snippet encoder features + per-snippet-index positional
      embedding (getR3Dreps), then cls_head(relu(.)) per snippet;
    - ViT: per-frame features through the standard temporal path, then
      cls_head over the CLS track (handled by classification_forward).

    freeze_encoder=True (the reference's '-fe'): the encoder runs in its
    own jit program outside the gradient and the optimizer state holds
    only head/temporal parameters.  freeze_encoder=False (reference CLI
    default — '-fe' absent leaves requires_grad True): the encoder sits
    inside the jitted loss and its parameters train jointly with the head
    via the same SGD.
    """

    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 model_params: Any, encoder_params: Any,
                 encoder_type: str = "R3D",
                 mesh: Optional["jax.sharding.Mesh"] = None,
                 vit_cfg=None, freeze_encoder: bool = True):
        self.encoder_type = encoder_type
        self._encoder_params = encoder_params
        self._vit_cfg = vit_cfg
        self.freeze_encoder = freeze_encoder

        if encoder_type == "R3D":
            from sais_tpu.models.r3d import r3d18_features

            def encode(enc, raw):
                b, s = raw.shape[:2]
                flat = raw.reshape((b * s,) + raw.shape[2:])
                return r3d18_features(enc, flat).reshape(b, s, -1)
        else:  # ViT: per-frame reps (B, S, T, D)
            from sais_tpu.models.vit import vit_features

            def encode(enc, raw):
                b, s, t = raw.shape[:3]
                flat = raw.reshape((b * s * t,) + raw.shape[3:])
                feats = vit_features(enc, flat, self._vit_cfg)
                return feats.reshape(b, s, t, -1)

        self._encode = jax.jit(encode)

        # build the inner trainer over FEATURE batches, with an R3D-specific
        # logits path (getR3Dreps pos-emb + direct cls_head)
        if encoder_type == "R3D":
            task = "ClassificationHead"
            super().__init__(model_cfg, train_cfg, model_params, task=task,
                             mesh=mesh)

            loss_fn = make_weighted_loss(
                lambda params, batch: r3d_head_logits(params, batch["rgb"]),
                model_cfg.nclasses)
            self._train_step = jax.jit(
                make_train_step(self.optimizer, loss_fn),
                donate_argnums=(0, 1))
            self._eval_step = jax.jit(loss_fn)
        else:
            super().__init__(model_cfg, train_cfg, model_params,
                             task="ClassificationHead", mesh=mesh)

        if not freeze_encoder:
            self._build_unfrozen(self.model_cfg, encoder_type, encode)

    def _build_unfrozen(self, mcfg, encoder_type, encode):
        """Joint (encoder, head) training: encode inside the jitted loss so
        gradients flow into the encoder (reference default without -fe)."""
        joint = {"model": self.params, "encoder": self._encoder_params}
        if self.mesh is not None:
            joint = mesh_lib.replicate(joint, self.mesh)
        self.params = joint
        self.opt_state = self.optimizer.init(joint)
        if self.mesh is not None:
            self.opt_state = mesh_lib.replicate(self.opt_state, self.mesh)

        def head_logits(model, feats):
            if encoder_type == "R3D":
                return r3d_head_logits(model, feats)
            from sais_tpu.models.full_model import classification_forward
            f = feats.shape[2]
            mask = jnp.zeros(feats.shape[:2] + (f + 1,), bool)
            logits = classification_forward(model, mcfg, feats, mask)
            if logits.ndim == 3:
                logits = jnp.mean(logits, axis=1)
            return logits

        def logits_fn(params, batch):
            feats = encode(params["encoder"], batch["raw"])
            if "raw_flow" in batch:
                feats = feats + encode(params["encoder"], batch["raw_flow"])
            return head_logits(params["model"], feats)

        loss_fn = make_weighted_loss(logits_fn, mcfg.nclasses)
        self._train_step = jax.jit(make_train_step(self.optimizer, loss_fn),
                                   donate_argnums=(0, 1))
        self._eval_step = jax.jit(loss_fn)

    def _pre(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Frozen-encoder pass: raw snippets -> feature batch."""
        if not self.freeze_encoder:
            return batch  # raw goes to device; encoding happens in the loss
        out = {k: v for k, v in batch.items()
               if k not in ("raw", "raw_flow")}
        feats = self._encode(self._encoder_params,
                             jnp.asarray(batch["raw"]))
        if "raw_flow" in batch:
            # RGB-Flow raw path sums the two feature streams
            # (prepare_model.py:436-440)
            feats = feats + self._encode(self._encoder_params,
                                         jnp.asarray(batch["raw_flow"]))
        out["rgb"] = np.asarray(feats)
        if self.encoder_type != "R3D":
            f = out["rgb"].shape[2]
            out["rgb_mask"] = np.zeros(out["rgb"].shape[:2] + (f + 1,), bool)
        return out
