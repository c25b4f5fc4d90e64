"""Training loop: loss decreases on separable data, early stopping, mesh
data-parallel step on 8 virtual devices, loss parity vs torch reference
semantics (importance-loss quirk included)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sais_tpu.config import MeshConfig, ModelConfig, TemporalConfig, TrainConfig
from sais_tpu.models.full_model import full_model_init, prototypes_init
from sais_tpu.parallel.mesh import make_mesh
from sais_tpu.train.loop import PrototypeTrainer
from sais_tpu.train.losses import importance_loss_reference

DIM = 32


def _model_cfg(importance=False):
    return ModelConfig(rep_dim=DIM, modalities="RGB",
                       importance_head=importance,
                       temporal=TemporalConfig(rep_dim=DIM, num_layers=1,
                                               num_heads=2, ffn_dim=64,
                                               max_positions=32))


def _toy_batches(nbatches=4, b=8, f=6, seed=0):
    """Two linearly separable classes in feature space."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(nbatches):
        cols = rng.integers(0, 2, b).astype(np.int32)
        base = np.where(cols[:, None] == 0, 1.0, -1.0)
        rgb = (base[:, None] * np.ones((1, f, DIM)) +
               0.1 * rng.normal(size=(b, f, DIM)))[:, None].astype(np.float32)
        mask = np.zeros((b, 1, f + 1), bool)
        out.append({"rgb": rgb, "rgb_mask": mask, "label_cols": cols,
                    "labels": cols})
    return out


def _trainer(mcfg, mesh=None, lr=0.05):
    params = full_model_init(jax.random.key(0), mcfg)
    keys, protos = prototypes_init(jax.random.key(1), 2)
    tcfg = TrainConfig(lr=lr, nepochs=5, max_patience=3)
    return PrototypeTrainer(mcfg, tcfg, params, keys, protos, mesh=mesh)


def test_loss_decreases_and_fit_runs():
    mcfg = _model_cfg()
    trainer = _trainer(mcfg)
    batches = _toy_batches()
    l0, _ = trainer.run_epoch(iter(batches), train=True)
    for _ in range(4):
        ln, m = trainer.run_epoch(iter(batches), train=True)
    assert ln < l0
    assert m["acc"] >= 0.5

    result = trainer.fit({"train": lambda: iter(batches),
                          "val": lambda: iter(batches)},
                         nepochs=3, log=lambda s: None)
    assert "model" in result and "prototypes" in result
    assert result["prototypes"].shape == (2, 256)
    assert len(result["metrics"]["loss"]) >= 1


def test_early_stopping_patience():
    mcfg = _model_cfg()
    trainer = _trainer(mcfg, lr=0.0)  # loss can never improve after epoch 1
    batches = _toy_batches(nbatches=1)
    logs = []
    trainer.fit({"train": lambda: iter(batches),
                 "val": lambda: iter(batches)}, nepochs=50,
                log=logs.append)
    # patience=3: first epoch sets min, then 3 non-improvements -> 4 epochs
    val_lines = [l for l in logs if l.startswith("val_")]
    assert len(val_lines) == 4


def test_data_parallel_step_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(MeshConfig())
    mcfg = _model_cfg()
    trainer = _trainer(mcfg, mesh=mesh)
    batches = _toy_batches(b=16)
    loss, m = trainer.run_epoch(iter(batches), train=True)
    assert np.isfinite(loss)
    # ragged batch (not divisible by 8) pads with zero-weight rows
    ragged = _toy_batches(nbatches=1, b=11)
    loss2, m2 = trainer.run_epoch(iter(ragged), train=True)
    assert np.isfinite(loss2)


def test_mesh_and_single_device_agree():
    mcfg = _model_cfg()
    b1 = _toy_batches(nbatches=2, b=16, seed=3)
    t_single = _trainer(mcfg)
    t_mesh = _trainer(mcfg, mesh=make_mesh(MeshConfig()))
    l1, _ = t_single.run_epoch(iter(b1), train=True)
    l2, _ = t_mesh.run_epoch(iter(b1), train=True)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    # after one epoch the updated prototypes agree too
    np.testing.assert_allclose(np.asarray(t_single.state.prototypes),
                               np.asarray(t_mesh.state.prototypes),
                               rtol=1e-4, atol=1e-6)


def test_importance_loss_matches_reference_quirk():
    gen = torch.Generator().manual_seed(0)
    b, s, f = 4, 1, 6
    scores = torch.randn(b, s, f + 1, 1, generator=gen)
    targets = torch.rand(b, s, f, generator=gen)
    ipad = torch.zeros(b, s, f + 1, dtype=torch.bool)
    ipad[0, :, 4:] = True
    ipad[2, :, 3:] = True
    labels = torch.tensor([0, 1, 0, 2])

    # literal reference computation (prepare_miscellaneous.py:48-60)
    crit = torch.nn.BCEWithLogitsLoss(reduction="none")
    out = scores[:, :, 1:, 0]
    loss = crit(out, targets)
    loss = torch.mean(loss)
    inv = ~ipad
    inv = inv[:, :, :-1]
    loss = loss * inv
    low = np.where(labels.numpy() == 0)[0]
    loss = loss[low, :]
    ref = torch.mean(loss.float())

    ours = importance_loss_reference(jnp.asarray(scores.numpy()),
                                     jnp.asarray(targets.numpy()),
                                     jnp.asarray(ipad.numpy()),
                                     jnp.asarray(labels.numpy()))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_masked_importance_loss_is_correct_bce():
    """The 'corrected' variant (train/losses.py masked_importance_loss)
    must equal a plain per-frame BCE masked to valid frames of low-skill
    rows (torch oracle) — what calcImportanceLoss *intended* before its
    broadcast quirk."""
    from sais_tpu.train.losses import masked_importance_loss

    gen = torch.Generator().manual_seed(1)
    b, s, f = 5, 1, 7
    scores = torch.randn(b, s, f + 1, 1, generator=gen)
    targets = (torch.rand(b, s, f, generator=gen) > 0.5).float()
    ipad = torch.zeros(b, s, f + 1, dtype=torch.bool)
    ipad[1, :, 5:] = True
    ipad[3, :, 2:] = True
    labels = torch.tensor([0, 0, 1, 0, 2])

    crit = torch.nn.BCEWithLogitsLoss(reduction="none")
    per = crit(scores[:, :, 1:, 0], targets)          # (B, S, F)
    valid = (~ipad)[:, :, :-1].float()
    low = (labels == 0).float()[:, None, None]
    w = valid * low
    ref = (per * w).sum() / w.sum()

    ours = masked_importance_loss(jnp.asarray(scores.numpy()),
                                  jnp.asarray(targets.numpy()),
                                  jnp.asarray(ipad.numpy()),
                                  jnp.asarray(labels.numpy()))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    # and it differs from the quirk on masked/padded inputs
    quirk = importance_loss_reference(jnp.asarray(scores.numpy()),
                                      jnp.asarray(targets.numpy()),
                                      jnp.asarray(ipad.numpy()),
                                      jnp.asarray(labels.numpy()))
    assert abs(float(ours) - float(quirk)) > 1e-6


def test_nonfinite_loss_aborts():
    """Failure detection (SURVEY §5.3): a NaN loss stops the epoch loudly
    instead of training onward with poisoned parameters."""
    mcfg = _model_cfg()
    trainer = _trainer(mcfg)
    # NaN prototypes poison the NCE loss immediately
    import dataclasses as dc
    trainer.state = dc.replace(
        trainer.state,
        prototypes=jnp.full_like(trainer.state.prototypes, jnp.nan))
    batches = _toy_batches(nbatches=1)
    with pytest.raises(FloatingPointError):
        trainer.run_epoch(iter(batches), train=True)


def test_fit_reshuffles_each_epoch():
    """Loader factories that accept an epoch index receive it (per-epoch
    reshuffle, like the reference DataLoader; a fixed seed would freeze
    batch composition for the whole run)."""
    mcfg = _model_cfg()
    trainer = _trainer(mcfg)
    seen = []

    def make(epoch=0):
        seen.append(epoch)
        return iter(_toy_batches(nbatches=1, seed=epoch))

    trainer.fit({"train": make, "val": make}, nepochs=3,
                log=lambda s: None)
    assert seen[:2] == [0, 0] and 1 in seen and 2 in seen


def test_importance_loss_ignores_padded_rows():
    """Mesh batch padding must not leak into the quirky global BCE mean:
    padded rows (weight 0) contribute neither to the loss value nor to
    the gradients (train/loop.py pads the last batch to the device
    count)."""
    from sais_tpu.train.losses import importance_loss_reference

    rng = np.random.default_rng(0)
    b, s, f = 3, 1, 5
    oi = rng.normal(size=(b, s, f + 1, 1)).astype(np.float32)
    imp = (rng.uniform(size=(b, s, f)) > 0.5).astype(np.float32)
    ipad = np.zeros((b, s, f + 1), bool)
    labels = np.asarray([0, 1, 0], np.int32)
    base = importance_loss_reference(jnp.asarray(oi), jnp.asarray(imp),
                                     jnp.asarray(ipad), jnp.asarray(labels))
    # pad with a junk row; weight masks it; padded label set to -1 like
    # the loop does
    oi_p = np.concatenate([oi, 100 * np.ones((1, s, f + 1, 1), np.float32)])
    imp_p = np.concatenate([imp, np.zeros((1, s, f), np.float32)])
    ipad_p = np.concatenate([ipad, np.zeros((1, s, f + 1), bool)])
    labels_p = np.asarray([0, 1, 0, -1], np.int32)
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    padded = importance_loss_reference(
        jnp.asarray(oi_p), jnp.asarray(imp_p), jnp.asarray(ipad_p),
        jnp.asarray(labels_p), weight=w)
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-6)

    g = jax.grad(lambda x: importance_loss_reference(
        x, jnp.asarray(imp_p), jnp.asarray(ipad_p),
        jnp.asarray(labels_p), weight=w))(jnp.asarray(oi_p))
    np.testing.assert_array_equal(np.asarray(g[-1]), 0.0)


@pytest.mark.slow
def test_importance_loss_fuzz_vs_reference():
    """calcImportanceLoss quirk across random shapes, pad patterns, and
    label mixes (incl. the all-high-skill empty-selection edge, where the
    reference's mean-of-empty would be nan and we return 0)."""
    from sais_tpu.train.losses import importance_loss_reference

    rng = np.random.default_rng(23)
    for case in range(40):
        b = int(rng.integers(1, 6))
        s = int(rng.integers(1, 3))
        f = int(rng.integers(2, 10))
        gen = torch.Generator().manual_seed(case)
        scores = torch.randn(b, s, f + 1, 1, generator=gen)
        targets = torch.rand(b, s, f, generator=gen)
        ipad = torch.zeros(b, s, f + 1, dtype=torch.bool)
        for i in range(b):
            ln = int(rng.integers(1, f + 1))
            ipad[i, :, ln + 1:] = True
        labels = torch.tensor([int(rng.integers(0, 3)) for _ in range(b)])

        crit = torch.nn.BCEWithLogitsLoss(reduction="none")
        loss = crit(scores[:, :, 1:, 0], targets)
        loss = torch.mean(loss)
        loss = loss * (~ipad)[:, :, :-1]
        low = np.where(labels.numpy() == 0)[0]
        ref = float(torch.mean(loss[low, :].float())) if len(low) else 0.0

        ours = float(importance_loss_reference(
            jnp.asarray(scores.numpy()), jnp.asarray(targets.numpy()),
            jnp.asarray(ipad.numpy()), jnp.asarray(labels.numpy())))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7,
                                   err_msg=f"case {case} b{b} s{s} f{f}")


def test_prototype_metrics_fuzz_vs_reference():
    """calcNCEMetrics parity across random reps/prototype/label/TTA
    configurations (prepare_miscellaneous.py:97-161): TTA prob-mean then
    argmax, string-matched label columns, macro P/R, ovr AUC with the
    try/except -> NaN path (single-class label draws)."""
    from sklearn.metrics import precision_score, recall_score, roc_auc_score

    from sais_tpu.models.heads import (labels_to_prototype_columns,
                                       prototype_probs)
    from sais_tpu.train.metrics import prototype_metrics

    rng = np.random.default_rng(29)
    for case in range(30):
        b = int(rng.integers(1, 10))
        k = int(rng.integers(2, 5))
        d = 16
        n_tta = int(rng.choice([1, 3]))
        gen = torch.Generator().manual_seed(case)
        keys = [str(i) for i in range(k)]
        proto = torch.rand(k, d, generator=gen)
        reps = [torch.randn(b, d, generator=gen) for _ in range(n_tta)]
        labels = [int(rng.integers(0, k)) for _ in range(b)]

        # literal reference math
        p_norm = proto / proto.norm(dim=1, keepdim=True)
        probs_sum = torch.zeros(b, k)
        for r in reps:
            s = r / r.norm(dim=1, keepdim=True)
            e = torch.exp(s @ p_norm.T)
            probs_sum += e / e.sum(1, keepdim=True)
        probs = (probs_sum / n_tta).numpy()
        cols = np.argmax(
            np.array(keys)[None, :].repeat(b, 0)
            == np.array([str(l) for l in labels])[:, None].repeat(k, 1), 1)
        preds = probs.argmax(1)
        ref_acc = float((preds == cols).mean())
        ref_prec = precision_score(cols, preds, average="macro",
                                   zero_division=0)
        ref_rec = recall_score(cols, preds, average="macro",
                               zero_division=0)
        try:
            ref_auc = roc_auc_score(cols, probs[:, -1] if k == 2 else probs,
                                    multi_class="ovr")
        except Exception:
            ref_auc = float("nan")

        tta_probs = [np.asarray(prototype_probs(
            jnp.asarray(r.numpy()), jnp.asarray(proto.numpy())))
            for r in reps]
        got = prototype_metrics(tta_probs, labels, keys)
        assert abs(got["acc"] - ref_acc) < 1e-6, case
        assert abs(got["precision"] - ref_prec) < 1e-6, case
        assert abs(got["recall"] - ref_rec) < 1e-6, case
        if np.isnan(ref_auc):
            assert np.isnan(got["auc"]), case
        else:
            assert abs(got["auc"] - ref_auc) < 1e-5, case
