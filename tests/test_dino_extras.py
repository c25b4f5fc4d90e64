"""Copy detection / retrieval / DAVIS propagation / attention video —
the formerly-skipped vendored DINO eval tools, rebuilt TPU-native.
Oracles are literal transcriptions of the reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import PreprocessConfig, ViTConfig
from sais_tpu.models.vit import vit_init, vit_tokens

TINY = ViTConfig(image_size=32, patch_size=8, embed_dim=48, depth=2,
                 num_heads=4)


def test_vit_tokens_matches_cls_feature():
    """vit_tokens[:, 0] must equal vit_features (both post final-LN)."""
    from sais_tpu.models.vit import vit_features
    params = vit_init(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    toks = vit_tokens(params, x, TINY)
    cls = vit_features(params, x, TINY)
    assert toks.shape == (2, 17, 48)
    np.testing.assert_allclose(np.asarray(toks[:, 0]), np.asarray(cls),
                               atol=1e-6)


def test_copy_detection_features_gem():
    """GeM(p=4) pooling matches the reference formula
    (eval_copy_detection.py:165-175)."""
    from sais_tpu.eval.copy_detection import copy_detection_features
    params = vit_init(jax.random.key(2), TINY)
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    feats = np.asarray(copy_detection_features(params, x, TINY))
    toks = np.asarray(vit_tokens(params, x, TINY))
    cls = toks[:, 0]
    patches = np.clip(toks[:, 1:], 1e-6, None)
    gem = (patches ** 4).mean(axis=1) ** 0.25
    np.testing.assert_allclose(feats, np.concatenate([cls, gem], -1),
                               rtol=1e-5, atol=1e-5)


def test_pca_whitening_matches_reference():
    """PCAWhitening vs a literal utils.PCA transcription (utils.py:655-705)."""
    from sais_tpu.eval.copy_detection import PCAWhitening
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(200, 16)).astype(np.float64) @ np.diag(
        np.linspace(0.1, 3.0, 16))
    ours = PCAWhitening(dim=16, whit=0.5).train(feats)

    cov = feats.T @ feats / feats.shape[0]
    d, v = np.linalg.eigh(cov)
    eps = d.max() * 1e-5
    d[d < eps] = eps
    idx = np.argsort(d)[::-1][:16]
    d, v = d[idx], v[:, idx]
    dvt = np.dot(np.diag(1.0 / d ** 0.5), v.T)
    x = rng.normal(size=(5, 16))
    np.testing.assert_allclose(ours.apply(x), np.dot(dvt, x.T).T, atol=1e-8)
    # whitened features of the training set have ~unit variance per dim
    white = ours.apply(feats)
    np.testing.assert_allclose(white.var(axis=0), 1.0, atol=0.2)


def test_copydays_map_and_ap():
    from sais_tpu.eval.copy_detection import (copydays_block_map,
                                              rank_copies,
                                              score_ap_from_ranks,
                                              whiten_and_normalize)
    # Holidays AP oracle (eval_copy_detection.py:97-126) literal values:
    # single positive at rank 1 -> (p0=0/1 + p1=1/2) * 1 / 2 = 0.25
    assert score_ap_from_ranks([0], 1) == 1.0
    assert abs(score_ap_from_ranks([1], 1) - 0.25) < 1e-9
    rng = np.random.default_rng(1)
    db = rng.normal(size=(10, 8)).astype(np.float32)
    queries = db[[3, 7]] + 0.01 * rng.normal(size=(2, 8)).astype(np.float32)
    qn, dn = whiten_and_normalize(queries, db)
    _, idx = rank_copies(qn, dn, topk=5)
    assert idx[0, 0] == 3 and idx[1, 0] == 7
    assert copydays_block_map(idx, [[3], [7]]) == 1.0


def test_compute_map_matches_reference_protocol():
    """compute_map vs a literal utils.compute_map transcription on a
    synthetic junk-heavy query set."""
    from sais_tpu.eval.retrieval import compute_map
    ranks = np.array([[2, 0], [0, 3], [1, 1], [3, 2]])  # (db=4, q=2)
    gnd = [{"ok": [0], "junk": [2]}, {"ok": [3, 1], "junk": []}]
    m, aps, pr, prs = compute_map(ranks, gnd, kappas=[1, 2])
    # query 0: ranked [2(junk), 0, 1, 3] -> junk removed: 0 at rank 0 -> AP 1
    assert abs(aps[0] - 1.0) < 1e-9
    # query 1: ranked [0, 3, 1, 2]; positives 3@rank1, 1@rank2 ->
    # AP = ((0/1 + 1/2) + (1/2 + 2/3)) * (1/2) / 2
    expected_ap1 = ((0 / 1 + 1 / 2) + (1 / 2 + 2 / 3)) * 0.5 / 2
    assert abs(aps[1] - expected_ap1) < 1e-9
    assert abs(m - (aps[0] + aps[1]) / 2) < 1e-9


def test_retrieval_ranks_and_protocols():
    from sais_tpu.eval.retrieval import retrieval_ranks, revisited_protocols
    rng = np.random.default_rng(2)
    db = rng.normal(size=(6, 8)).astype(np.float32)
    q = db[[4]]
    ranks = retrieval_ranks(db, q)
    assert ranks.shape == (6, 1) and ranks[0, 0] == 4
    gnd = [{"easy": np.array([1]), "hard": np.array([2]),
            "junk": np.array([3])}]
    prot = revisited_protocols(gnd)
    assert set(prot["medium"][0]["ok"]) == {1, 2}
    assert set(prot["hard"][0]["junk"]) == {1, 3}


def test_multi_scale_features_shape():
    from sais_tpu.eval.retrieval import multi_scale_features
    params = vit_init(jax.random.key(4), TINY)
    x = jax.random.normal(jax.random.key(5), (2, 32, 32, 3))
    v = np.asarray(multi_scale_features(params, x, TINY))
    assert v.shape == (2, 48)
    assert np.isfinite(v).all()


def test_restrict_neighborhood_matches_reference_loops():
    from sais_tpu.eval.video_segmentation import restrict_neighborhood
    h, w, size = 4, 5, 1
    ours = restrict_neighborhood(h, w, size)
    ref = np.zeros((h, w, h, w))
    for i in range(h):
        for j in range(w):
            for p in range(2 * size + 1):
                for q in range(2 * size + 1):
                    ii, jj = i - size + p, j - size + q
                    if 0 <= ii < h and 0 <= jj < w:
                        ref[i, j, ii, jj] = 1
    np.testing.assert_array_equal(ours, ref.reshape(h * w, h * w))


def test_label_propagation_identity():
    """Target frame == context frame -> the propagated mask reproduces the
    context mask (best-match affinity is the diagonal)."""
    from sais_tpu.eval.video_segmentation import (label_propagation,
                                                  to_one_hot, track_video)
    params = vit_init(jax.random.key(6), TINY)
    rng = np.random.default_rng(7)
    frame = rng.normal(size=(32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (4, 4))
    seg = to_one_hot(labels, 3)
    from sais_tpu.eval.video_segmentation import patch_features
    feat, h, w = patch_features(params, jnp.asarray(frame), TINY)
    assert (h, w) == (4, 4)
    out, _, _ = label_propagation(params, TINY, jnp.asarray(frame), [feat],
                                  [seg], topk=1, neighborhood=0)
    np.testing.assert_array_equal(np.argmax(out, axis=0), labels)

    # full tracking loop on a static 3-frame clip keeps the labels
    frames = np.stack([frame] * 3)
    masks = track_video(params, TINY, frames, seg, n_last_frames=2, topk=1,
                        neighborhood=1)
    assert len(masks) == 2
    np.testing.assert_array_equal(np.argmax(masks[-1], axis=0), labels)


def test_attention_video_writes_overlay(tmp_path):
    from sais_tpu.eval.video_generation import attention_video
    from tests.test_pipeline_e2e import synth_video
    src = str(tmp_path / "in.mp4")
    synth_video(src, nframes=12)
    params = vit_init(jax.random.key(8), TINY)
    out = str(tmp_path / "out.mp4")
    n = attention_video(params, TINY, src, out,
                        pre=PreprocessConfig(resize=32), batch_size=8)
    assert n == 12
    import cv2
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()
