"""Eval probes (k-NN / linear / attention viz), profiling, logging, AoT loss."""

import os

import numpy as np
import torch

import jax
import jax.numpy as jnp

from sais_tpu.eval.probes import knn_classifier, train_linear_probe
from sais_tpu.train.losses import (temporal_coherence_accuracy,
                                   temporal_coherence_loss)
from sais_tpu.utils.logging import MetricLogger, SmoothedValue
from sais_tpu.utils.profiling import StageTimer


def _cluster_data(rng, n_per=60, d=16, classes=3, spread=0.3,
                  centers=None):
    if centers is None:
        centers = rng.normal(size=(classes, d))
    feats, labels = [], []
    for c in range(classes):
        feats.append(centers[c] + spread * rng.normal(size=(n_per, d)))
        labels.append(np.full(n_per, c))
    return (np.concatenate(feats).astype(np.float32),
            np.concatenate(labels).astype(np.int64), centers)


def test_knn_classifier_separable():
    rng = np.random.default_rng(0)
    train_f, train_l, centers = _cluster_data(rng)
    test_f, test_l, _ = _cluster_data(rng, centers=centers)
    top1, top5 = knn_classifier(train_f, train_l, test_f, test_l, k=20)
    assert top1 > 95
    assert top5 == 100.0


def test_knn_matches_reference_voting():
    """Golden: literal eval_knn.py voting math (:157-176) on a tiny case."""
    rng = np.random.default_rng(1)
    train_f, train_l, centers = _cluster_data(rng, n_per=10, classes=2)
    test_f, test_l, _ = _cluster_data(rng, n_per=5, classes=2, centers=centers)
    k, T = 4, 0.07
    tf = torch.tensor(train_f) / torch.tensor(train_f).norm(dim=1, keepdim=True)
    qf = torch.tensor(test_f) / torch.tensor(test_f).norm(dim=1, keepdim=True)
    sim = qf @ tf.T
    dist, idx = sim.topk(k, largest=True, sorted=True)
    neighbors = torch.tensor(train_l)[idx]
    oh = torch.zeros(len(test_f), k, 2).scatter_(2, neighbors[..., None], 1)
    probs = (oh * (dist / T).exp()[..., None]).sum(1)
    ref_preds = probs.argmax(1).numpy()

    from sais_tpu.eval.probes import _knn_chunk
    ours = np.asarray(_knn_chunk(jnp.asarray(train_f), jnp.asarray(train_l),
                                 jnp.asarray(test_f), k, 2, T))
    np.testing.assert_array_equal(np.argmax(ours, 1), ref_preds)


def test_linear_probe_learns():
    rng = np.random.default_rng(2)
    train_f, train_l, centers = _cluster_data(rng, n_per=100)
    test_f, test_l, _ = _cluster_data(rng, n_per=40, centers=centers)
    out = train_linear_probe(train_f, train_l, test_f, test_l, num_classes=3,
                             epochs=10, batch_size=32)
    assert out["top1"] > 90


def test_attention_viz(tmp_path):
    from sais_tpu.config import ViTConfig
    from sais_tpu.eval.attention_viz import (cls_attention_maps,
                                             save_attention_pngs,
                                             threshold_masks, upsample_maps)
    from sais_tpu.models.vit import vit_init
    cfg = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4)
    params = vit_init(jax.random.key(0), cfg)
    maps = cls_attention_maps(params, jnp.ones((1, 32, 32, 3)), cfg)
    assert maps.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(maps.sum(axis=(2, 3)) +
                               0,  # CLS column excluded so < 1
                               maps.sum(axis=(2, 3)))
    up = upsample_maps(maps, 8)
    assert up.shape == (1, 4, 32, 32)
    masks = threshold_masks(maps, 0.6)
    frac = maps.reshape(1, 4, -1)
    kept = np.where(masks.reshape(1, 4, -1),
                    frac / frac.sum(-1, keepdims=True), 0).sum(-1)
    assert (kept >= 0.6 - 1e-6).all()
    paths = save_attention_pngs(maps, str(tmp_path / "attn"), patch_size=8)
    assert all(os.path.exists(p) for p in paths)


def test_stage_timer_and_logger(tmp_path):
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep
    assert t._counts["a"] == 2

    log = MetricLogger(jsonl_path=str(tmp_path / "log.txt"))
    for x in log.log_every(range(5), 2, header="ep0", log=lambda s: None):
        log.update(loss=float(x))
    log.write_epoch(0, lr=0.1)
    import json
    line = json.loads(open(tmp_path / "log.txt").read().strip())
    assert line["epoch"] == 0 and "train_loss" in line

    sv = SmoothedValue(window=2)
    for v in (1.0, 2.0, 3.0):
        sv.update(v)
    assert sv.avg == 2.5 and sv.global_avg == 2.0


def test_temporal_coherence_matches_reference():
    gen = torch.Generator().manual_seed(0)
    lf = torch.randn(6, 2, generator=gen)
    lb = torch.randn(6, 2, generator=gen)
    ce = torch.nn.CrossEntropyLoss()
    ref = (ce(lf, torch.zeros(6, dtype=torch.long)) +
           ce(lb, torch.ones(6, dtype=torch.long))) / 2
    ours = temporal_coherence_loss(jnp.asarray(lf.numpy()),
                                   jnp.asarray(lb.numpy()))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)
    acc = temporal_coherence_accuracy(jnp.asarray(lf.numpy()),
                                      jnp.asarray(lb.numpy()))
    ref_acc = ((lf.argmax(1) == 0).sum() + (lb.argmax(1) == 1).sum()) / 12
    np.testing.assert_allclose(float(acc), float(ref_acc))


def test_feature_extraction_task(tmp_path):
    from sais_tpu.config import ViTConfig
    from sais_tpu.infer.feature_task import (run_feature_extraction,
                                             save_all_info_dict)
    from sais_tpu.models.vit import vit_init
    cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=32, depth=1,
                    num_heads=2)
    params = vit_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    batches = [(["v1", "v2"],
                rng.normal(size=(2, 3, 4, 16, 16, 3)).astype(np.float32),
                np.array([0, 1]))]
    info = run_feature_extraction(iter(batches), params, "ViT", cfg)
    assert len(info["snippets"]) == 2
    assert info["snippets"][0].shape == (3, 4, 32)
    dest = save_all_info_dict(str(tmp_path), info, "ViT")
    assert os.path.exists(dest)

    from sais_tpu.infer.feature_task import extract_snippet_features_r3d
    from sais_tpu.models.r3d import r3d18_init
    r3d = r3d18_init(jax.random.key(1))
    feats = extract_snippet_features_r3d(
        r3d, rng.normal(size=(1, 2, 5, 32, 32, 3)).astype(np.float32))
    assert feats.shape == (1, 2, 512)
