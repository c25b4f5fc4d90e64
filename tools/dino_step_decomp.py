"""DINO training-step decomposition on the attached TPU.

Times each piece of the batch-64 step that bench.py's
`dino_train_img_per_s` measures as a whole, so PERFORMANCE.md's MFU
narrative is traceable to per-component numbers (VERDICT r4 #2 asked for
the decomposition re-run with the fused loss engaged).

Pieces (reference hot loop main_dino.py:515-567):
  step            full DINOTrainer step, pipelined like `sais pretrain`
  g_fwd / g_fb    student backbone over globals  (128 imgs, L=197), fwd /
                  fwd+bwd through the fused Pallas kernels (drop-path on)
  l_fwd / l_fb    student backbone over locals   (512 imgs, L=37, packed)
  t_fwd           teacher backbone over globals  (inference fused kernel)
  headloss_fb     bottleneck (both groups + teacher) + fused last-layer
                  +loss kernel, fwd+bwd w.r.t. head params
  tail            clip + cancel + adamw + scheduled update + EMA + center

Every loop queues n dispatches and syncs once, so the ~33 ms tunnel RTT
is paid once per measurement, not per call.  Run:
  python tools/dino_step_decomp.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import ViTConfig
from sais_tpu.kernels.dino_head_loss import (build_pair_structure,
                                             make_fused_dino_loss)
from sais_tpu.models.dino_head import dino_head_bottleneck
from sais_tpu.models.vit import vit_features, vit_features_trainable_fused
from sais_tpu.train.dino import (DINOConfig, DINOTrainer,
                                 cancel_last_layer_grads,
                                 clip_gradients_per_param, ema_update,
                                 update_center)


def timeit(fn, args, n=20, warm=2):
    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main(batch: int = 64) -> dict:
    cfg = DINOConfig(batch_size=batch)
    vcfg = ViTConfig()
    tr = DINOTrainer(vcfg, cfg, niter_per_ep=100, key=jax.random.key(0))
    student, teacher, center = tr.student, tr.teacher, tr.center
    dpr = cfg.drop_path_rate

    g = jax.random.normal(jax.random.key(1),
                          (cfg.n_global_crops * batch, 224, 224, 3),
                          jnp.bfloat16)
    loc = jax.random.normal(jax.random.key(2),
                            (cfg.n_local_crops * batch, 96, 96, 3),
                            jnp.bfloat16)
    out = {}

    # ---- full step, pipelined (mirrors bench.bench_dino_train) ----------
    tr.step(g, loc)
    n = 20
    t0 = time.time()
    pending = None
    for _ in range(n):
        loss = tr.step_async(g, loc)
        if pending is not None:
            tr.check_loss(pending)
        pending = loss
    tr.check_loss(pending)
    out["step_ms"] = (time.time() - t0) / n * 1e3
    # the jit step donates its state buffers — re-bind after stepping
    student, teacher, center = tr.student, tr.teacher, tr.center
    sb = student["backbone"]

    # ---- student backbone, per resolution group -------------------------
    def bb(p, x, rng):
        return vit_features_trainable_fused(p, x, vcfg,
                                            drop_path_rate=dpr, rng=rng)

    bb_fwd = jax.jit(bb)
    rng = jax.random.key(3)

    def bb_fb(p, x, rng, ct):
        y, vjp = jax.vjp(lambda pp: bb(pp, x, rng), p)
        return y, vjp(ct)

    bb_fb = jax.jit(bb_fb)
    ct_g = jnp.ones((g.shape[0], vcfg.embed_dim), jnp.float32)
    ct_l = jnp.ones((loc.shape[0], vcfg.embed_dim), jnp.float32)
    out["g_fwd_ms"] = timeit(bb_fwd, (sb, g, rng))
    out["g_fb_ms"] = timeit(bb_fb, (sb, g, rng, ct_g))
    out["l_fwd_ms"] = timeit(bb_fwd, (sb, loc, rng))
    out["l_fb_ms"] = timeit(bb_fb, (sb, loc, rng, ct_l))

    # ---- teacher forward (inference fused kernel) -----------------------
    t_fwd = jax.jit(lambda p, x: vit_features(p, x, vcfg,
                                              compute_dtype=jnp.bfloat16,
                                              allow_fused=True))
    out["t_fwd_ms"] = timeit(t_fwd, (teacher["backbone"], g))

    # ---- head bottleneck + fused last-layer+loss, fwd+bwd ---------------
    n_crops = cfg.n_global_crops + cfg.n_local_crops
    sel_np, c_np = build_pair_structure(batch, cfg.n_global_crops,
                                        cfg.n_local_crops)
    sel_c, cnt_c = jnp.asarray(sel_np), jnp.asarray(c_np)
    fused_op = make_fused_dino_loss(cfg.student_temp, batch,
                                    cfg.n_global_crops, n_crops)
    gfeat = jax.random.normal(jax.random.key(4),
                              (g.shape[0], vcfg.embed_dim), jnp.float32)
    lfeat = jax.random.normal(jax.random.key(5),
                              (loc.shape[0], vcfg.embed_dim), jnp.float32)
    tfeat = jax.random.normal(jax.random.key(6),
                              (g.shape[0], vcfg.embed_dim), jnp.float32)

    def headloss(sp_head, tp_head, center):
        def f(sp_head):
            hs_g = dino_head_bottleneck(sp_head, gfeat.astype(jnp.bfloat16))
            hs_l = dino_head_bottleneck(sp_head, lfeat.astype(jnp.bfloat16))
            hs = jnp.concatenate([hs_g, hs_l], 0)
            ht = dino_head_bottleneck(tp_head, tfeat.astype(jnp.bfloat16))
            return fused_op(hs, sp_head["last_v"], sp_head["last_g"], ht,
                            tp_head["last_v"], tp_head["last_g"], center,
                            jnp.float32(0.04), sel_c, cnt_c)

        (loss, bc), grads = jax.value_and_grad(f, has_aux=True)(sp_head)
        return loss, bc, grads

    headloss = jax.jit(headloss)
    out["headloss_fb_ms"] = timeit(
        headloss, (student["head"], teacher["head"], center))

    # ---- optimizer tail -------------------------------------------------
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, student)
    bc = jnp.zeros((cfg.out_dim,))

    def tail(student, teacher, center, opt_state, grads, bc):
        grads = clip_gradients_per_param(grads, cfg.clip_grad)
        grads = cancel_last_layer_grads(grads, jnp.bool_(False))
        updates, opt_state = tr.optimizer.update(grads, opt_state, student)
        lr, wd = jnp.float32(1e-4), jnp.float32(0.04)
        student = jax.tree.map(
            lambda p, u: p + lr * u - lr * wd * p * (p.ndim > 1),
            student, updates)
        teacher = ema_update(teacher, student, jnp.float32(0.996))
        center2 = update_center(center, bc, cfg.center_momentum)
        return student, teacher, center2, opt_state

    tail = jax.jit(tail)
    out["tail_ms"] = timeit(
        tail, (student, teacher, center, tr.opt_state, grads, bc))

    comp = (out["g_fb_ms"] + out["l_fb_ms"] + out["t_fwd_ms"]
            + out["headloss_fb_ms"] + out["tail_ms"])
    out["component_sum_ms"] = comp
    out["img_per_s"] = batch / out["step_ms"] * 1e3
    for k, v in out.items():
        print(f"{k:20s} {v:8.2f}")
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
