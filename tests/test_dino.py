"""DINO pre-training parity + smoke tests (reference dino-main)."""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sais_tpu.config import ViTConfig
from sais_tpu.models.dino_head import (dino_head_forward, dino_head_init,
                                       dino_head_params_from_torch)
from sais_tpu.train.dino import (DINOConfig, DINOTrainer, cosine_scheduler,
                                 dino_loss, update_center)

pytestmark = pytest.mark.slow


def _random_torch_head(gen, in_dim=32, hidden=64, bottleneck=16, out=128):
    def r(*s):
        return 0.05 * torch.randn(*s, generator=gen)

    sd = {
        "mlp.0.weight": r(hidden, in_dim), "mlp.0.bias": r(hidden),
        "mlp.2.weight": r(hidden, hidden), "mlp.2.bias": r(hidden),
        "mlp.4.weight": r(bottleneck, hidden), "mlp.4.bias": r(bottleneck),
        "last_layer.weight_g": torch.ones(out, 1),
        "last_layer.weight_v": r(out, bottleneck),
    }
    return sd


def _golden_head(sd, x):
    h = F.linear(x, sd["mlp.0.weight"], sd["mlp.0.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd["mlp.2.weight"], sd["mlp.2.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd["mlp.4.weight"], sd["mlp.4.bias"])
    h = F.normalize(h, dim=-1, p=2)
    v = sd["last_layer.weight_v"]
    g = sd["last_layer.weight_g"]
    w = g * v / v.norm(dim=1, keepdim=True)
    return F.linear(h, w)


def test_dino_head_parity():
    gen = torch.Generator().manual_seed(0)
    sd = _random_torch_head(gen)
    x = torch.randn(4, 32, generator=gen)
    golden = _golden_head(sd, x)
    params = dino_head_params_from_torch(sd)
    ours = dino_head_forward(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_dino_head_bf16_path_tracks_f32():
    """bf16 input routes the last matmul through bf16 operands with f32
    accumulation (the training pipeline's precision); outputs and grads
    must track the f32 path to bf16 rounding, and the output must come
    back f32 (the loss softmax runs on it)."""
    params = dino_head_init(jax.random.key(0), 32, 128, hidden=64,
                            bottleneck=16)
    x = jax.random.normal(jax.random.key(1), (8, 32), jnp.float32)
    ref = dino_head_forward(params, x)
    out = dino_head_forward(params, x.astype(jnp.bfloat16))
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.03,
                               atol=0.02)

    def scalar(p, xx):
        return jnp.sum(jnp.tanh(dino_head_forward(p, xx)))

    g_ref = jax.grad(scalar)(params, x)
    g_b16 = jax.grad(scalar)(params, x.astype(jnp.bfloat16))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_b16)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        assert float(jnp.max(jnp.abs(a - b))) / scale < 0.05


def _golden_dino_loss(student_out, teacher_out, center, t_temp, s_temp=0.1):
    """Literal DINOLoss.forward (main_dino.py:601-621)."""
    student = [s / s_temp for s in student_out]
    q = [F.softmax((t - center) / t_temp, dim=-1) for t in teacher_out]
    total, n = 0.0, 0
    for iq in range(len(q)):
        for v in range(len(student)):
            if v == iq:
                continue
            loss = torch.sum(-q[iq] * F.log_softmax(student[v], dim=-1), -1)
            total = total + loss.mean()
            n += 1
    return total / n


def test_dino_loss_parity_and_center():
    gen = torch.Generator().manual_seed(1)
    b, k = 6, 24
    s_out = [torch.randn(b, k, generator=gen) for _ in range(4)]
    t_out = [torch.randn(b, k, generator=gen) for _ in range(2)]
    center = 0.1 * torch.randn(k, generator=gen)

    golden = _golden_dino_loss(s_out, t_out, center, 0.04)
    ours, batch_center = dino_loss(
        [jnp.asarray(s.numpy()) for s in s_out],
        [jnp.asarray(t.numpy()) for t in t_out],
        jnp.asarray(center.numpy()), jnp.float32(0.04))
    np.testing.assert_allclose(float(ours), float(golden), rtol=1e-5)

    # center EMA (main_dino.py:624-634)
    ref_bc = torch.cat(t_out).mean(dim=0)
    ref_center = center * 0.9 + ref_bc * 0.1
    new_center = update_center(jnp.asarray(center.numpy()), batch_center, 0.9)
    np.testing.assert_allclose(np.asarray(new_center), ref_center.numpy(),
                               rtol=1e-5, atol=1e-7)


def test_dino_loss_regrouping_fuzz():
    """The 3-pass algebraic form == the reference double loop across crop
    configurations (1-3 teacher views, 2-10 student crops, incl. the
    degenerate single-global case)."""
    gen = torch.Generator().manual_seed(7)
    for ng, ncrops in [(1, 2), (2, 2), (2, 10), (3, 5)]:
        b, k = 5, 33
        s_out = [torch.randn(b, k, generator=gen) for _ in range(ncrops)]
        t_out = [torch.randn(b, k, generator=gen) for _ in range(ng)]
        center = 0.05 * torch.randn(k, generator=gen)
        golden = _golden_dino_loss(s_out, t_out, center, 0.07)
        ours, _ = dino_loss(
            [jnp.asarray(s.numpy()) for s in s_out],
            [jnp.asarray(t.numpy()) for t in t_out],
            jnp.asarray(center.numpy()), jnp.float32(0.07))
        np.testing.assert_allclose(float(ours), float(golden), rtol=2e-5,
                                   err_msg=f"ng={ng} ncrops={ncrops}")


def test_cosine_scheduler_matches_reference_formula():
    # literal utils.cosine_scheduler (dino-main/utils.py:187-199)
    base, final, epochs, nit, warm = 0.5, 0.01, 4, 10, 1
    warmup = np.linspace(0, base, warm * nit)
    iters = np.arange(epochs * nit - warm * nit)
    ref = np.concatenate([warmup, final + 0.5 * (base - final) *
                          (1 + np.cos(np.pi * iters / len(iters)))])
    ours = cosine_scheduler(base, final, epochs, nit, warm)
    np.testing.assert_allclose(ours, ref)


def test_multi_crop_shapes_and_range():
    from sais_tpu.ops.augment import multi_crop_batch
    imgs = jax.random.uniform(jax.random.key(0), (2, 64, 80, 3))
    g, l = multi_crop_batch(jax.random.key(1), imgs, n_global=2, n_local=3)
    assert g.shape == (4, 224, 224, 3)
    assert l.shape == (6, 96, 96, 3)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(l)).all()


def test_dino_trainer_smoke():
    cfg = DINOConfig(out_dim=32, n_global_crops=2, n_local_crops=2,
                     epochs=2, batch_size=4, warmup_epochs=0,
                     freeze_last_layer_epochs=1)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=32, depth=1,
                        num_heads=2)
    trainer = DINOTrainer(vit_cfg, cfg, niter_per_ep=2, key=jax.random.key(0))

    g = jax.random.uniform(jax.random.key(1), (2 * 4, 16, 16, 3))
    l = jax.random.uniform(jax.random.key(2), (2 * 4, 16, 16, 3))
    t0 = jax.tree.map(np.asarray, trainer.teacher)
    losses = [trainer.step(g, l) for _ in range(3)]
    assert all(np.isfinite(x) for x in losses)
    # teacher moved by EMA
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        trainer.teacher, t0)
    assert max(jax.tree.leaves(moved)) > 0
    # center updated away from zero
    assert float(jnp.abs(trainer.center).max()) > 0


def test_center_border_crop_matches_torchvision_semantics():
    """Border removal parity with SurgDataset (main_dino.py:300-326).
    torchvision is absent here; compare against a transcription of
    F.center_crop: crop_top = int(round((H - ch) / 2.)) etc."""
    from sais_tpu.ops.augment import center_border_crop

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 200, 320, 3), dtype=np.uint8)
    for hf, wf in ((0.8, 0.8), (0.8, 0.7)):
        ours = center_border_crop(img, hf, wf)[0]
        ch, cw = int(hf * 200), int(wf * 320)
        top = int(round((200 - ch) / 2.0))
        left = int(round((320 - cw) / 2.0))
        ref = img[0][top:top + ch, left:left + cw]
        assert ours.shape == (ch, cw, 3)
        np.testing.assert_array_equal(ours, ref)
    # VUA_Lab/AFB right-hand timer trim
    trimmed = center_border_crop(img, 0.8, 0.8, trim_right_px=130)
    assert trimmed.shape[2] == int(0.8 * 320) - 130


def test_drop_path_stochastic_depth():
    """Stochastic depth (vision_transformer.py:27-35, 150): per-sample
    Bernoulli(1-p) masks scaled by 1/keep on both residual branches,
    linspace(0, rate, depth) per-block decay, student-only."""
    from sais_tpu.models.vit import _drop_path, vit_features, vit_init

    # unit behavior: values are exactly x/keep or 0, at ~keep frequency
    x = jnp.ones((4000, 3, 5))
    out = np.asarray(_drop_path(x, 0.4, jax.random.key(0)))
    per_sample = out.reshape(4000, -1)
    kept = per_sample[:, 0] != 0
    # mask is per-sample: all elements of a sample agree
    assert np.all((per_sample != 0).all(1) == kept)
    np.testing.assert_allclose(per_sample[kept], 1.0 / 0.6, rtol=1e-6)
    assert abs(kept.mean() - 0.6) < 0.03

    # rate=0 (or rng=None) is exactly the deterministic forward
    vcfg = ViTConfig(image_size=16, patch_size=8, embed_dim=32, depth=3,
                     num_heads=2)
    params = vit_init(jax.random.key(3), vcfg)
    imgs = jax.random.uniform(jax.random.key(4), (2, 16, 16, 3))
    base = vit_features(params, imgs, vcfg)
    np.testing.assert_array_equal(
        base, vit_features(params, imgs, vcfg, drop_path_rate=0.0,
                           rng=jax.random.key(5)))
    np.testing.assert_array_equal(
        base, vit_features(params, imgs, vcfg, drop_path_rate=0.5))

    # depth-1 network: linspace(0, rate, 1) = [0] -> inert even with rng
    v1 = ViTConfig(image_size=16, patch_size=8, embed_dim=32, depth=1,
                   num_heads=2)
    p1 = vit_init(jax.random.key(6), v1)
    np.testing.assert_array_equal(
        vit_features(p1, imgs, v1),
        vit_features(p1, imgs, v1, drop_path_rate=0.9,
                     rng=jax.random.key(7)))

    # with rate>0 and depth>1 the stochastic forward differs from base
    # for some rng (block 0 has prob 0; later blocks can drop)
    drop = vit_features(params, imgs, vcfg, drop_path_rate=0.9,
                        rng=jax.random.key(8))
    assert np.abs(np.asarray(drop) - np.asarray(base)).max() > 1e-6


def test_dino_trainer_drop_path():
    """Student steps run (and differentiate) with stochastic depth on;
    per-step rng is deterministic in step_idx."""
    cfg = DINOConfig(out_dim=16, n_global_crops=2, n_local_crops=2,
                     epochs=2, batch_size=4, warmup_epochs=0,
                     freeze_last_layer_epochs=0, drop_path_rate=0.5)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=32, depth=2,
                        num_heads=2)
    g = jax.random.uniform(jax.random.key(1), (2 * 4, 16, 16, 3))
    l = jax.random.uniform(jax.random.key(2), (2 * 4, 16, 16, 3))

    def run():
        tr = DINOTrainer(vit_cfg, cfg, niter_per_ep=2,
                         key=jax.random.key(0))
        return [float(tr.step(g, l)) for _ in range(2)]

    a, b = run(), run()
    assert all(np.isfinite(a))
    assert a == b    # same step_idx -> same drop mask -> same loss


def test_dino_head_init_effective_std():
    """trunc_normal_(std=.02, a=-2, b=2) bounds are ABSOLUTE (+/-100
    sigma — effectively untruncated); truncating at +/-2 SIGMA would
    shrink the realized std ~12% (0.0176) and diverge from the reference
    init scheme."""
    p = dino_head_init(jax.random.key(0), 384, 4096)
    std = float(jnp.std(p["last_v"]))
    assert abs(std - 0.02) < 0.0005, std


def test_dino_head_use_bn_parity_with_torch_train_mode():
    """--use_bn_in_head (vision_transformer.py:264-271): BatchNorm1d after
    each hidden linear, TRAIN mode (batch stats normalize, running stats
    update with momentum 0.1/unbiased var — the mode both networks run in
    throughout DINO pre-training).  Oracle: a real torch Sequential in
    the reference layout (linears at indices 0/3/6, BN at 1/4), two
    consecutive forwards so the running-stat update is also pinned."""
    import torch.nn as nn
    from sais_tpu.models.dino_head import (dino_head_bn_state_from_torch,
                                           dino_head_bottleneck)

    torch.manual_seed(11)
    in_dim, hidden, bottleneck, out_dim = 32, 48, 16, 128
    mlp = nn.Sequential(
        nn.Linear(in_dim, hidden), nn.BatchNorm1d(hidden), nn.GELU(),
        nn.Linear(hidden, hidden), nn.BatchNorm1d(hidden), nn.GELU(),
        nn.Linear(hidden, bottleneck))
    last = nn.utils.weight_norm(
        nn.Linear(bottleneck, out_dim, bias=False))
    last.weight_g.data.fill_(1)
    mlp.train()

    sd = {f"mlp.{k}": v for k, v in mlp.state_dict().items()}
    sd["last_layer.weight_g"] = last.weight_g.detach()
    sd["last_layer.weight_v"] = last.weight_v.detach()
    params = dino_head_params_from_torch(sd)
    assert "bn" in params["mlp"][0] and "bn" in params["mlp"][1]
    assert "bn" not in params["mlp"][2]
    bn_state = dino_head_bn_state_from_torch(sd)

    x1 = torch.randn(8, in_dim)
    x2 = torch.randn(8, in_dim)
    with torch.no_grad():
        g1 = torch.nn.functional.linear(
            torch.nn.functional.normalize(mlp(x1), dim=-1, p=2),
            last.weight_g * last.weight_v
            / last.weight_v.norm(dim=1, keepdim=True))
        g2 = torch.nn.functional.normalize(mlp(x2), dim=-1, p=2)

    o1, bn_state = dino_head_forward(params, jnp.asarray(x1.numpy()),
                                     bn_state=bn_state, train=True)
    np.testing.assert_allclose(np.asarray(o1), g1.numpy(), rtol=2e-4,
                               atol=2e-5)
    h2, bn_state = dino_head_bottleneck(params, jnp.asarray(x2.numpy()),
                                        bn_state=bn_state, train=True)
    np.testing.assert_allclose(np.asarray(h2), g2.numpy(), rtol=2e-4,
                               atol=2e-5)
    # running buffers after two train-mode forwards match torch's
    for i, ti in enumerate((1, 4)):
        np.testing.assert_allclose(
            np.asarray(bn_state[i]["mean"]),
            mlp.state_dict()[f"{ti}.running_mean"].numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"bn{i} mean")
        np.testing.assert_allclose(
            np.asarray(bn_state[i]["var"]),
            mlp.state_dict()[f"{ti}.running_var"].numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"bn{i} var")
    # eval mode consumes the running stats like torch .eval()
    mlp.eval()
    with torch.no_grad():
        ge = torch.nn.functional.normalize(mlp(x1), dim=-1, p=2)
    he = dino_head_bottleneck(params, jnp.asarray(x1.numpy()),
                              bn_state=bn_state, train=False)[0]
    np.testing.assert_allclose(np.asarray(he), ge.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_dino_trainer_use_bn_steps_and_resumes():
    """use_bn_in_head end-to-end: steps run, stats evolve per network
    (student != teacher — buffers are NOT EMA'd), state round-trips, and
    the fused loss refuses the combination loudly."""
    from sais_tpu.config import ViTConfig
    from sais_tpu.train.dino import DINOConfig, DINOTrainer

    vc = ViTConfig(image_size=32, patch_size=16, embed_dim=64, depth=1,
                   num_heads=2)
    cfg = DINOConfig(batch_size=2, out_dim=128, n_local_crops=2,
                     global_size=32, local_size=16, use_bn_in_head=True,
                     drop_path_rate=0.0)
    tr = DINOTrainer(vc, cfg, niter_per_ep=4, key=jax.random.key(0))
    g = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    l = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    tr.step(g, l)
    tr.step(g, l)
    s_mean = np.asarray(tr.student_bn[0]["mean"])
    t_mean = np.asarray(tr.teacher_bn[0]["mean"])
    assert np.abs(s_mean).mean() > 0 and np.abs(t_mean).mean() > 0
    state = tr.state()
    assert "student_bn" in state
    tr2 = DINOTrainer(vc, cfg, niter_per_ep=4, key=jax.random.key(3))
    tr2.load_state(state)
    np.testing.assert_allclose(np.asarray(tr2.student_bn[0]["mean"]),
                               s_mean)
    with pytest.raises(ValueError, match="use_bn_in_head"):
        DINOTrainer(vc, dataclasses.replace(cfg), niter_per_ep=4,
                    key=jax.random.key(4), fused_loss=True)
