"""Fused DINO last-layer+loss kernel (kernels/dino_head_loss.py) vs the
reference-shaped XLA path (dino_head_forward last matmul + regroup +
dino_loss) — loss, batch center, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sais_tpu.kernels.dino_head_loss import (build_pair_structure,
                                             make_fused_dino_loss)
from sais_tpu.train.dino import dino_loss

B, NG, NL = 4, 2, 3
DB, K = 128, 512
RS, RT = (NG + NL) * B, NG * B
TEMP_T, TEMP_S = 0.07, 0.1


def _make_inputs(seed=0):
    key = jax.random.key(seed)
    hs = jax.random.normal(jax.random.fold_in(key, 0), (RS, DB))
    hs = hs / jnp.linalg.norm(hs, axis=-1, keepdims=True)
    ht = jax.random.normal(jax.random.fold_in(key, 1), (RT, DB))
    ht = ht / jnp.linalg.norm(ht, axis=-1, keepdims=True)
    vs = jax.random.normal(jax.random.fold_in(key, 2), (DB, K))
    vt = jax.random.normal(jax.random.fold_in(key, 3), (DB, K))
    gs = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 4), (K,))
    gt = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 5), (K,))
    center = 0.01 * jax.random.normal(jax.random.fold_in(key, 6), (K,))
    return (hs.astype(jnp.bfloat16), ht.astype(jnp.bfloat16), vs, vt,
            gs, gt, center)


def _ref_loss(hs, vs, gs, ht, vt, gt, center, norm_last):
    """Same math via the unfused ops: bf16 last matmul w/ f32 accum
    (dino_head_forward's bf16 branch), regroup, dino_loss."""

    def last(h, v, g):
        w = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12)
        if not norm_last:
            w = w * g[None, :]
        return jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    def regroup(out, n):
        nb = out.shape[0] // n
        return list(out.reshape(nb, n, out.shape[-1]).transpose(1, 0, 2))

    s_out = last(hs, vs, gs)
    t_out = last(ht, vt, gt)
    souts = regroup(s_out[:NG * B], NG) + regroup(s_out[NG * B:], NL)
    touts = regroup(t_out, NG)
    return dino_loss(souts, touts, center, jnp.float32(TEMP_T), TEMP_S)


@pytest.mark.parametrize("norm_last", [True, False])
def test_fused_loss_matches_reference(norm_last):
    hs, ht, vs, vt, gs, gt, center = _make_inputs()
    sel, c = build_pair_structure(B, NG, NL)
    sel, c = jnp.asarray(sel), jnp.asarray(c)
    op = make_fused_dino_loss(TEMP_S, B, NG, NG + NL,
                              norm_last_layer=norm_last, interpret=True)

    (loss_f, bc_f) = op(hs, vs, gs, ht, vt, gt, center,
                        jnp.float32(TEMP_T), sel, c)
    loss_r, bc_r = _ref_loss(hs, vs, gs, ht, vt, gt, center, norm_last)
    np.testing.assert_allclose(float(loss_f), float(loss_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bc_f), np.asarray(bc_r),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("norm_last", [True, False])
def test_fused_loss_grads_match_autodiff(norm_last):
    hs, ht, vs, vt, gs, gt, center = _make_inputs(seed=1)
    sel, c = build_pair_structure(B, NG, NL)
    sel, c = jnp.asarray(sel), jnp.asarray(c)
    op = make_fused_dino_loss(TEMP_S, B, NG, NG + NL,
                              norm_last_layer=norm_last, interpret=True)

    def loss_fused(hs, vs, gs):
        return op(hs, vs, gs, ht, vt, gt, center, jnp.float32(TEMP_T),
                  sel, c)[0]

    def loss_ref(hs, vs, gs):
        return _ref_loss(hs, vs, gs, ht, vt, gt, center, norm_last)[0]

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(hs, vs, gs)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(hs, vs, gs)
    # the kernel quantizes dlogits to bf16 for the dh/dw matmuls exactly
    # like the XLA backward of the bf16 forward dot, but rounding points
    # differ — agreement is bf16-noise-bounded (abs ~2e-5 at these
    # magnitudes), not bitwise
    np.testing.assert_allclose(np.asarray(gf[0], np.float32),
                               np.asarray(gr[0], np.float32),
                               rtol=2e-2, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=2e-2, atol=5e-5)
    if norm_last:
        assert float(jnp.max(jnp.abs(gf[2]))) == 0.0
        assert float(jnp.max(jnp.abs(gr[2]))) == 0.0
    else:
        np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                                   rtol=2e-2, atol=5e-5)


def test_fused_loss_teacher_gets_no_grad():
    hs, ht, vs, vt, gs, gt, center = _make_inputs(seed=2)
    sel, c = build_pair_structure(B, NG, NL)
    sel, c = jnp.asarray(sel), jnp.asarray(c)
    op = make_fused_dino_loss(TEMP_S, B, NG, NG + NL, interpret=True)

    def loss_t(ht, vt):
        return op(hs, vs, gs, ht, vt, gt, center, jnp.float32(TEMP_T),
                  sel, c)[0]

    gt_h, gt_v = jax.grad(loss_t, argnums=(0, 1))(ht, vt)
    assert float(jnp.max(jnp.abs(gt_h.astype(jnp.float32)))) == 0.0
    assert float(jnp.max(jnp.abs(gt_v))) == 0.0


def test_pair_structure_counts():
    sel, c = build_pair_structure(3, 2, 8)
    assert sel.shape == (30, 6)
    # globals pair with 1 teacher crop, locals with both
    assert c[:6].ravel().tolist() == [1.0] * 6
    assert c[6:].ravel().tolist() == [2.0] * 24
    # every selected teacher row shares the student row's image
    for r in range(30):
        img = r // 2 if r < 6 else (r - 6) // 8
        for t in np.nonzero(sel[r])[0]:
            assert t // 2 == img


def test_trainer_fused_loss_matches_xla_path():
    """DINOTrainer(fused_loss=True) must track the XLA loss path step for
    step: same rng => identical backbone/augmentation draws, so loss and
    parameter trajectories differ only by the kernel's bf16 rounding."""
    from sais_tpu.config import ViTConfig
    from sais_tpu.train.dino import DINOConfig, DINOTrainer

    cfg = DINOConfig(out_dim=256, n_global_crops=2, n_local_crops=2,
                     epochs=2, batch_size=4, warmup_epochs=0,
                     freeze_last_layer_epochs=0, drop_path_rate=0.0)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=32, depth=1,
                        num_heads=2)
    g = jax.random.uniform(jax.random.key(1), (2 * 4, 16, 16, 3))
    l = jax.random.uniform(jax.random.key(2), (2 * 4, 16, 16, 3))

    def run(fused):
        tr = DINOTrainer(vit_cfg, cfg, niter_per_ep=2,
                         key=jax.random.key(0), fused_loss=fused)
        assert tr.fused_loss is fused
        losses = [tr.step(g, l) for _ in range(3)]
        return losses, tr.student

    lf, sf = run(True)
    lx, sx = run(False)
    np.testing.assert_allclose(lf, lx, rtol=5e-3)
    # adam normalizes updates to ~±lr, so a bf16-rounding sign flip on a
    # noise-scale gradient (zero-init biases) moves a param by up to
    # 2*lr per step regardless of gradient magnitude — bound the
    # trajectory gap by 3 steps * 2 * (lr = 5e-4 * 4/256) on top of the
    # relative tolerance for the meaningfully-sized weights
    for a, b in zip(jax.tree.leaves(sf), jax.tree.leaves(sx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=5e-5)


def _dp_mesh(n):
    from sais_tpu.config import MeshConfig
    from sais_tpu.parallel import mesh as mesh_lib
    return mesh_lib.make_mesh(MeshConfig(), devices=jax.devices()[:n])


@pytest.mark.parametrize("norm_last", [True, False])
def test_fused_loss_dp_matches_single_device(norm_last):
    """The dp op (per-shard kernel + psum of loss/center/last-layer grads,
    VERDICT r4 #3) must equal the single-device fused op on the gathered
    arrays — value AND gradients."""
    from sais_tpu.kernels.dino_head_loss import make_fused_dino_loss_dp

    nsh = 4
    mesh = _dp_mesh(nsh)
    hs, ht, vs, vt, gs, gt, center = _make_inputs(seed=3)
    hs_g, hs_l = hs[:NG * B], hs[NG * B:]
    sel, c = build_pair_structure(B, NG, NL)
    sel, c = jnp.asarray(sel), jnp.asarray(c)
    op1 = make_fused_dino_loss(TEMP_S, B, NG, NG + NL,
                               norm_last_layer=norm_last, interpret=True)
    opd = make_fused_dino_loss_dp(TEMP_S, B // nsh, NG, NG + NL, mesh,
                                  norm_last_layer=norm_last,
                                  interpret=True)
    tt = jnp.float32(TEMP_T)

    def loss1(hs_g, hs_l, vs, gs):
        return op1(jnp.concatenate([hs_g, hs_l], 0), vs, gs, ht, vt, gt,
                   center, tt, sel, c)

    def lossd(hs_g, hs_l, vs, gs):
        return opd(hs_g, hs_l, vs, gs, ht, vt, gt, center, tt)

    (l1, bc1) = loss1(hs_g, hs_l, vs, gs)
    (ld, bcd) = lossd(hs_g, hs_l, vs, gs)
    np.testing.assert_allclose(float(ld), float(l1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bcd), np.asarray(bc1),
                               rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda *a: loss1(*a)[0], argnums=(0, 1, 2, 3))(
        hs_g, hs_l, vs, gs)
    gd = jax.grad(lambda *a: lossd(*a)[0], argnums=(0, 1, 2, 3))(
        hs_g, hs_l, vs, gs)
    for a, b in zip(gd, g1):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-6)


def test_trainer_fused_loss_dp_matches_xla_dp():
    """DINOTrainer(mesh=..., fused_loss=True) must track the XLA dp loss
    path — the configuration that matters at scale (the reference's only
    real distributed workload, main_dino.py:630)."""
    from sais_tpu.config import ViTConfig
    from sais_tpu.train.dino import DINOConfig, DINOTrainer

    mesh = _dp_mesh(4)
    cfg = DINOConfig(out_dim=256, n_global_crops=2, n_local_crops=2,
                     epochs=2, batch_size=8, warmup_epochs=0,
                     freeze_last_layer_epochs=0, drop_path_rate=0.0)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=32, depth=1,
                        num_heads=2)
    g = jax.random.uniform(jax.random.key(1), (2 * 8, 16, 16, 3))
    l = jax.random.uniform(jax.random.key(2), (2 * 8, 16, 16, 3))

    def run(fused):
        tr = DINOTrainer(vit_cfg, cfg, niter_per_ep=2,
                         key=jax.random.key(0), mesh=mesh,
                         fused_loss=fused)
        assert tr.fused_loss is fused
        losses = [tr.step(g, l) for _ in range(3)]
        return losses, tr.student

    lf, sf = run(True)
    lx, sx = run(False)
    np.testing.assert_allclose(lf, lx, rtol=5e-3)
    # adam sign-flip bound (see test_trainer_fused_loss_matches_xla_path):
    # 3 steps * 2 * (lr = 5e-4 * 8/256) ~ 1e-4 for the zero-init biases
    for a, b in zip(jax.tree.leaves(sf), jax.tree.leaves(sx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=1e-4)


def test_trainer_fused_loss_rejects_wrong_batch():
    from sais_tpu.config import ViTConfig
    from sais_tpu.train.dino import DINOConfig, DINOTrainer

    cfg = DINOConfig(out_dim=256, n_global_crops=2, n_local_crops=2,
                     epochs=2, batch_size=4, warmup_epochs=0)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=32, depth=1,
                        num_heads=2)
    tr = DINOTrainer(vit_cfg, cfg, niter_per_ep=2, key=jax.random.key(0),
                     fused_loss=True)
    g = jax.random.uniform(jax.random.key(1), (2 * 2, 16, 16, 3))
    l = jax.random.uniform(jax.random.key(2), (2 * 2, 16, 16, 3))
    with pytest.raises(ValueError, match="fused DINO loss"):
        tr.step(g, l)
