"""Encoder evaluation probes (reference: dino-main/eval_knn.py,
eval_linear.py) — jit-compiled JAX versions.

- weighted k-NN (eval_knn.knn_classifier:139-183): L2-normalized features,
  cosine similarity, top-k neighbors, exp(sim/T) vote weights (T=0.07),
  top-1/top-5 accuracy;
- linear probe (eval_linear.py): a single linear layer trained with SGD +
  cosine lr on frozen features.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _l2n(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("k", "num_classes"))
def _knn_chunk(train_f, train_l, test_f, k: int, num_classes: int,
               temperature: float):
    # train_f arrives pre-normalized (loop-invariant; normalizing it here
    # would redo the N x D pass for every test chunk)
    sim = jnp.dot(_l2n(test_f), train_f.T)                 # (B, N)
    dist, idx = jax.lax.top_k(sim, k)
    neighbors = train_l[idx]                               # (B, k)
    weights = jnp.exp(dist / temperature)                  # (B, k)
    one_hot = jax.nn.one_hot(neighbors, num_classes)       # (B, k, C)
    return jnp.sum(one_hot * weights[..., None], axis=1)   # (B, C)


def knn_classifier(train_features: np.ndarray, train_labels: np.ndarray,
                   test_features: np.ndarray, test_labels: np.ndarray,
                   k: int = 20, temperature: float = 0.07,
                   chunk: int = 1024) -> Tuple[float, float]:
    """Weighted k-NN accuracy (top-1, top-5) — eval_knn semantics."""
    num_classes = int(max(train_labels.max(), test_labels.max())) + 1
    train_f = _l2n(jnp.asarray(train_features))   # normalize ONCE
    train_l = jnp.asarray(train_labels)
    top1 = top5 = total = 0
    for i in range(0, len(test_features), chunk):
        tf = jnp.asarray(test_features[i:i + chunk])
        tl = test_labels[i:i + chunk]
        probs = np.asarray(_knn_chunk(train_f, train_l, tf, k, num_classes,
                                      temperature))
        order = np.argsort(-probs, axis=1)
        top1 += int(np.sum(order[:, 0] == tl))
        kk = min(5, k)
        top5 += int(np.sum(np.any(order[:, :kk] == tl[:, None], axis=1)))
        total += len(tl)
    return 100.0 * top1 / total, 100.0 * top5 / total


def eval_linear_features(intermediate_tokens, avgpool: bool = False
                         ) -> jnp.ndarray:
    """The reference linear-probe feature construction
    (eval_linear.py:166-170): concatenate the CLS token of the n last
    blocks; with `avgpool` additionally interleave the mean of the LAST
    block's patch tokens.

    intermediate_tokens: list of n (B, 1+N, D) arrays (earliest first),
    i.e. `vit_intermediate_layers(..., n)` output.

    The avgpool branch replicates torch's exact (quirky) layout:
    `cat((cls.unsqueeze(-1), avg.unsqueeze(-1)), -1).reshape(B, -1)` —
    which only type-checks for n == 1 (DINO evaluates ViT-B that way) and
    produces the INTERLEAVED [cls_0, avg_0, cls_1, avg_1, ...] ordering,
    not [cls..., avg...].
    """
    cls = jnp.concatenate([t[:, 0] for t in intermediate_tokens], axis=-1)
    if not avgpool:
        return cls
    if len(intermediate_tokens) != 1:
        # torch.cat fails for n > 1 (n*D vs D on the cat dim); mirror it
        raise ValueError("avgpool_patchtokens requires n_last_blocks == 1 "
                         "(eval_linear.py:169 torch.cat shape constraint)")
    avg = jnp.mean(intermediate_tokens[-1][:, 1:], axis=1)
    stacked = jnp.stack([cls, avg], axis=-1)          # (B, D, 2)
    return stacked.reshape(stacked.shape[0], -1)      # interleaved


def probe_features_from_images(vit_params, images, vit_cfg,
                               n_last_blocks: int = 4,
                               avgpool: bool = False,
                               compute_dtype=jnp.float32) -> np.ndarray:
    """images (B, H, W, 3) float -> eval_linear probe features.  ViT-S
    defaults (n=4, no avgpool — eval_linear.py:256-259); ViT-B uses n=1,
    avgpool=True."""
    from sais_tpu.models.vit import vit_intermediate_layers
    toks = vit_intermediate_layers(vit_params, images, vit_cfg,
                                   n=n_last_blocks,
                                   compute_dtype=compute_dtype)
    return np.asarray(eval_linear_features(toks, avgpool=avgpool))


def train_linear_probe(train_features: np.ndarray, train_labels: np.ndarray,
                       test_features: np.ndarray, test_labels: np.ndarray,
                       num_classes: int, epochs: int = 20,
                       batch_size: int = 256, lr: float = 0.01,
                       seed: int = 0) -> Dict[str, float]:
    """Linear probe on frozen features (eval_linear.py recipe: SGD with
    cosine lr decay, no weight decay on the probe)."""
    d = train_features.shape[1]
    key = jax.random.key(seed)
    params = {"w": jnp.zeros((d, num_classes)),
              "b": jnp.zeros((num_classes,))}
    n = len(train_features)
    batch_size = min(batch_size, n)   # small sets still train (a larger
    # batch than n would otherwise run ZERO steps and return a zero probe)
    # schedule horizon = the ACTUAL step count (ceil over the tail-wrapped
    # loop below); a floor-based horizon left the trailing steps at lr=0
    steps = -(-n // batch_size) * epochs
    sched = optax.cosine_decay_schedule(lr, steps)
    opt = optax.sgd(sched, momentum=0.9)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n, batch_size):
            sel = order[i:i + batch_size]
            if len(sel) < batch_size:   # tail: wrap, keep shapes static
                sel = np.concatenate(
                    [sel, order[:batch_size - len(sel)]])
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(train_features[sel]),
                jnp.asarray(train_labels[sel]))

    logits = np.asarray(jnp.asarray(test_features) @ params["w"] + params["b"])
    acc = float(np.mean(np.argmax(logits, 1) == test_labels)) * 100
    return {"top1": acc}
