"""Training loop: SupCon-prototype training with early stopping.

Reference semantics (train.py:46-96, prepare_model.py:555-567,
perform_training.py:49-227):
- SGD over model parameters AND prototypes jointly;
- per-epoch phases train/val/test; early stop when val loss fails to improve
  max_patience=5 consecutive epochs; best snapshot (params + prototypes)
  kept from the best-val-loss epoch;
- NCE prototype loss (+ optional importance loss during train).

TPU redesign: the step is one jit-compiled program over a device mesh —
batch sharded on the data axis, parameters replicated, gradient all-reduce
inserted by XLA (the DDP equivalent).  Rather than looping python-side over
ragged samples, batches arrive as static-shaped padded arrays from
sais_tpu.data collators.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sais_tpu.config import ModelConfig, TrainConfig
from sais_tpu.models.full_model import prototypes_forward
from sais_tpu.models.heads import prototype_probs
from sais_tpu.parallel import mesh as mesh_lib
from sais_tpu.train import metrics as metrics_lib
from sais_tpu.train.losses import importance_loss_reference, nce_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Joint trainable state: model params + prototype matrix."""

    model: Any
    prototypes: jnp.ndarray
    opt_state: Any


class PrototypeTrainer:
    """Prototypes-task trainer (the reference's main training mode)."""

    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 model_params: Any, prototype_keys: Sequence[str],
                 prototypes: jnp.ndarray,
                 mesh: Optional["jax.sharding.Mesh"] = None,
                 use_importance: Optional[bool] = None,
                 seq_mesh: Optional["jax.sharding.Mesh"] = None):
        """seq_mesh: optional ('data','seq') mesh — the frame encoder then
        trains SEQUENCE-PARALLEL (ring attention, parallel/sequence.py):
        each window's time axis is sharded across the mesh and the VJP is
        the reverse ring, for segment windows beyond one chip's attention.
        seq x data COMPOSES: seq_mesh(n_seq, n_data>1) additionally shards
        batches over the mesh's 'data' axis (each data group runs an
        independent ring over its batch shard; the gradient all-reduce
        over 'data' is inserted by jit) — on a v5e-8 train 2x4 or 4x2 via
        `sais train --seq-parallel N --data-parallel M`.  Mutually
        exclusive with the separate data-parallel `mesh` argument (one
        mesh must own the devices)."""
        if mesh is not None and seq_mesh is not None:
            raise ValueError(
                "pass either mesh (data parallel) or seq_mesh (sequence "
                "parallel); for both at once build one seq_mesh(n_seq, "
                "n_data) — its 'data' axis shards the batches")
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.prototype_keys = list(prototype_keys)
        self.mesh = mesh
        self.seq_mesh = seq_mesh
        # seq x data composition: the seq_mesh's own 'data' axis shards
        # batches exactly like a pure data mesh would (mesh_lib helpers
        # only key on the axis name)
        self._batch_mesh = mesh
        if seq_mesh is not None and dict(seq_mesh.shape).get("data", 1) > 1:
            self._batch_mesh = seq_mesh
        self.use_importance = (train_cfg.importance_loss
                               if use_importance is None else use_importance)
        self.optimizer = optax.sgd(train_cfg.lr)
        trainable = {"model": model_params, "prototypes": prototypes}
        self.state = TrainState(model_params, prototypes,
                                self.optimizer.init(trainable))

        mcfg = self.model_cfg
        use_imp = self.use_importance
        encoder_fn = None
        if seq_mesh is not None:
            from sais_tpu.parallel.sequence import SEQ_AXIS, _ring_encoder_fn
            # auto chunk_flash: on TPU the ring runs the Pallas flash
            # kernels fwd+bwd (custom VJP, no per-step score block)
            encoder_fn = _ring_encoder_fn(mcfg, seq_mesh, SEQ_AXIS)

        def loss_fn(trainable, batch, with_importance):
            out = prototypes_forward(trainable["model"], mcfg,
                                     batch.get("rgb"), batch.get("rgb_mask"),
                                     batch.get("flow"), batch.get("flow_mask"),
                                     primary_domain=batch.get(
                                         "primary_domain"),
                                     encoder_fn=encoder_fn)
            weight = batch.get("weight")
            if weight is None:
                loss = nce_loss(out.video_rep, trainable["prototypes"],
                                batch["label_cols"])
            else:
                # padded-batch path: masked mean over real samples
                from sais_tpu.models.heads import prototype_similarities
                sim = prototype_similarities(out.video_rep,
                                             trainable["prototypes"])
                logp = jax.nn.log_softmax(sim, -1)
                picked = jnp.take_along_axis(
                    logp, batch["label_cols"][:, None], 1)[:, 0]
                loss = -jnp.sum(picked * weight) / jnp.maximum(
                    jnp.sum(weight), 1.0)
            if with_importance:
                # importance loss applies at TRAIN only
                # (perform_training.py:127-130)
                labels = batch["labels"]
                if weight is not None:
                    # padded rows must not count as low-skill (label 0)
                    labels = jnp.where(weight > 0, labels, -1)
                loss = loss + importance_loss_reference(
                    out.importances, batch["importance"], batch["ipad"],
                    labels, weight=weight)
            return loss, out.video_rep

        def train_step(state: TrainState, batch):
            trainable = {"model": state.model, "prototypes": state.prototypes}
            (loss, reps), grads = jax.value_and_grad(
                lambda t, b: loss_fn(t, b, use_imp),
                has_aux=True)(trainable, batch)
            # metrics probs use the PRE-update prototypes, like the
            # reference's calcNCEMetrics scoring the forward pass's own
            # softmax (prepare_miscellaneous.py:97-161)
            probs = prototype_probs(reps, state.prototypes)
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       trainable)
            new = optax.apply_updates(trainable, updates)
            return TrainState(new["model"], new["prototypes"],
                              opt_state), loss, probs

        def eval_step(state: TrainState, batch):
            trainable = {"model": state.model, "prototypes": state.prototypes}
            loss, reps = loss_fn(trainable, batch, False)
            probs = prototype_probs(reps, state.prototypes)
            return loss, reps, probs

        if self._batch_mesh is not None:
            # params/opt-state replicated, batches arrive data-sharded via
            # _device_batch; jit respects the argument shardings and inserts
            # the gradient all-reduce over the data axis (DDP equivalent).
            self.state = mesh_lib.replicate(self.state, self._batch_mesh)
        elif seq_mesh is not None:
            # pure sequence parallelism: state still lives on the mesh
            self.state = mesh_lib.replicate(self.state, seq_mesh)
        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

    # -- batch prep ---------------------------------------------------------

    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        if self._batch_mesh is not None:
            batch = mesh_lib.pad_batch_with_weight(
                batch, mesh_lib.data_parallel_size(self._batch_mesh))
            return mesh_lib.shard_batch(batch, self._batch_mesh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    # -- epochs -------------------------------------------------------------

    def run_epoch(self, batches: Iterable[Dict[str, np.ndarray]],
                  train: bool) -> Tuple[float, Dict[str, float]]:
        """One pass; returns (mean loss, metrics).  Metrics follow
        calcNCEMetrics (probs vs label columns)."""
        losses: List[float] = []
        sizes: List[int] = []
        all_probs: List[np.ndarray] = []
        all_cols: List[np.ndarray] = []
        for batch in batches:
            cols = batch["label_cols"]
            if train:
                b = self._device_batch(batch)
                self.state, loss, probs_dev = self._train_step(self.state, b)
                probs = np.asarray(probs_dev)[:len(cols)]
                loss = float(loss)
            elif "tta" in batch:
                # 3-way TTA at val/test (perform_training.py:126-128,
                # 161-204): loss = mean over the per-augment NCE losses,
                # probs = mean over the per-augment prototype softmaxes
                # (calcNCEMetrics, prepare_miscellaneous.py:128-137)
                tta_losses, tta_probs = [], []
                for variant in batch["tta"]:
                    v = {k: x for k, x in variant.items() if k != "tta"}
                    l, _, p = self._eval_step(self.state,
                                              self._device_batch(v))
                    tta_losses.append(float(l))
                    tta_probs.append(np.asarray(p)[:len(cols)])
                loss = float(np.mean(tta_losses))
                probs = np.mean(np.stack(tta_probs), axis=0)
            else:
                b = self._device_batch(batch)
                loss, reps, probs = self._eval_step(self.state, b)
                probs = np.asarray(probs)[:len(cols)]
                loss = float(loss)
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"training loss is {loss}, stopping")
            losses.append(float(loss) * len(cols))
            sizes.append(len(cols))
            all_probs.append(probs)
            all_cols.append(np.asarray(cols))
        n = max(sum(sizes), 1)
        mean_loss = sum(losses) / n
        probs = np.concatenate(all_probs) if all_probs else np.zeros((0, 2))
        cols = np.concatenate(all_cols) if all_cols else np.zeros((0,), int)
        m = metrics_lib.prototype_metrics(
            [probs], [self.prototype_keys[c] for c in cols],
            self.prototype_keys) if len(cols) else {}
        m["loss"] = mean_loss
        return mean_loss, m

    def fit(self, loaders: Dict[str, Callable[[], Iterable]],
            nepochs: Optional[int] = None,
            log: Callable[[str], None] = print) -> Dict[str, Any]:
        """Epoch loop with early stopping (train.py:46-96).

        loaders: phase -> callable yielding an iterable of batches.  A
        loader callable that accepts an argument receives the 0-based
        epoch index — pass it as the shuffle seed so every epoch sees a
        fresh batch permutation (the reference's per-epoch DataLoader
        reshuffle; a fixed seed would freeze batch composition for the
        whole run).
        Returns {'model', 'prototypes', 'metrics', 'best_epoch'}.
        """
        import inspect as _inspect
        nepochs = nepochs or self.train_cfg.nepochs
        tracker = metrics_lib.MetricsTracker()
        min_loss = float("inf")
        patience = 1
        best = None
        best_epoch = 0
        epoch = 1
        while epoch <= nepochs and patience <= self.train_cfg.max_patience:
            for phase, make in loaders.items():
                train = phase == "train"
                takes_epoch = len(_inspect.signature(make).parameters) >= 1
                batches = make(epoch - 1) if takes_epoch else make()
                loss, m = self.run_epoch(batches, train)
                log(metrics_lib.format_metrics(phase, m))
                if phase == "val":
                    tracker.update(m)
                    if loss < min_loss:
                        min_loss = loss
                        patience = 1
                        best_epoch = epoch
                        best = (jax.tree.map(np.asarray, self.state.model),
                                np.asarray(self.state.prototypes))
                    else:
                        patience += 1
            epoch += 1
        if best is None:
            best = (jax.tree.map(np.asarray, self.state.model),
                    np.asarray(self.state.prototypes))
        return {"model": best[0], "prototypes": best[1],
                "metrics": tracker.history, "best_epoch": best_epoch}
