"""Attribute the DINO step's optimizer-tail cost (tools/dino_step_decomp
measured 7.9 ms standalone vs ~2.3 ms of theoretical HBM traffic for the
~44M-param student + teacher EMA).

Variants timed (all jit, donated where the real step donates):
  tail_full      clip + cancel + adamw + scheduled update + EMA + center
  tail_noclip    without the per-parameter clip
  tail_opt       adamw only
  tail_update    scheduled update + EMA only
  tail_stacked   tail_full but same-shaped leaves STACKED first (12 blocks
                 of qkv_w -> one (12, 384, 1152) tensor, etc.) so the
                 elementwise tree runs over ~15 fused kernels, not ~160

Run AFTER the test suite (1-core host): python tools/dino_tail_probe.py
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sais_tpu.config import ViTConfig
from sais_tpu.train.dino import (DINOConfig, DINOTrainer,
                                 cancel_last_layer_grads,
                                 clip_gradients_per_param, ema_update,
                                 update_center)


def timeit(fn, args, n=30, warm=2):
    # no donation in the probe: same HBM traffic (outputs are fresh
    # buffers either way), but fixed input buffers keep per-iter device
    # copies out of the timed loop
    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    cfg = DINOConfig(batch_size=64)
    tr = DINOTrainer(ViTConfig(), cfg, niter_per_ep=100,
                     key=jax.random.key(0))
    student, teacher, center = tr.student, tr.teacher, tr.center
    opt_state = tr.opt_state
    grads0 = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, student)
    bc = jnp.zeros((cfg.out_dim,))
    lr, wd, mom = jnp.float32(1e-4), jnp.float32(0.04), jnp.float32(0.996)

    nleaves = len(jax.tree.leaves(student))
    nparams = sum(x.size for x in jax.tree.leaves(student))
    print(f"leaves={nleaves} params={nparams/1e6:.1f}M")

    args = (student, teacher, center, opt_state, grads0, bc)

    def tail_full(student, teacher, center, opt_state, grads, bc):
        grads = clip_gradients_per_param(grads, cfg.clip_grad)
        grads = cancel_last_layer_grads(grads, jnp.bool_(False))
        updates, opt_state = tr.optimizer.update(grads, opt_state, student)
        student = jax.tree.map(
            lambda p, u: p + lr * u - lr * wd * p * (p.ndim > 1),
            student, updates)
        teacher = ema_update(teacher, student, mom)
        center2 = update_center(center, bc, cfg.center_momentum)
        return student, teacher, center2, opt_state

    def tail_noclip(student, teacher, center, opt_state, grads, bc):
        updates, opt_state = tr.optimizer.update(grads, opt_state, student)
        student = jax.tree.map(
            lambda p, u: p + lr * u - lr * wd * p * (p.ndim > 1),
            student, updates)
        teacher = ema_update(teacher, student, mom)
        center2 = update_center(center, bc, cfg.center_momentum)
        return student, teacher, center2, opt_state

    def tail_opt(student, teacher, center, opt_state, grads, bc):
        updates, opt_state = tr.optimizer.update(grads, opt_state, student)
        return updates, opt_state

    def tail_update(student, teacher, center, opt_state, grads, bc):
        student = jax.tree.map(
            lambda p, u: p + lr * u - lr * wd * p * (p.ndim > 1),
            student, grads)
        teacher = ema_update(teacher, student, mom)
        return student, teacher

    results = {}
    for name, fn in [("tail_full", tail_full), ("tail_noclip", tail_noclip),
                     ("tail_opt", tail_opt), ("tail_update", tail_update)]:
        jfn = jax.jit(fn)
        results[name] = timeit(jfn, args)
        print(f"{name:14s} {results[name]:7.2f} ms")

    # ---- stacked-by-shape variant --------------------------------------
    # Group leaves by shape; run the whole elementwise tail over stacked
    # tensors.  Norms for the per-param clip become per-slice reductions.
    leaves, treedef = jax.tree.flatten(student)
    groups = defaultdict(list)
    for i, x in enumerate(leaves):
        groups[x.shape].append(i)
    order = [i for shape in groups for i in groups[shape]]
    print(f"shape groups: {len(groups)} from {len(leaves)} leaves")

    def stack_tree(tree):
        ls = jax.tree.leaves(tree)
        return [jnp.stack([ls[i] for i in idxs])
                for idxs in groups.values()]

    def unstack_tree(stacks):
        out = [None] * len(leaves)
        for stk, idxs in zip(stacks, groups.values()):
            for j, i in enumerate(idxs):
                out[i] = stk[j]
        return jax.tree.unflatten(treedef, out)

    def tail_stacked(student, teacher, center, opt_state, grads, bc):
        gs = stack_tree(grads)
        ps = stack_tree(student)
        ts = stack_tree(teacher)
        mu = stack_tree(opt_state[0].mu)
        nu = stack_tree(opt_state[0].nu)
        count = opt_state[0].count + 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        new = []
        for g, p, t, m, v in zip(gs, ps, ts, mu, nu):
            axes = tuple(range(1, g.ndim))
            norm = jnp.sqrt(jnp.sum(g * g, axis=axes, keepdims=True))
            coef = jnp.minimum(cfg.clip_grad / (norm + 1e-6), 1.0)
            g = g * coef
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            u = -(m / bc1) / (jnp.sqrt(v / bc2) + eps)
            p2 = p + lr * u - lr * wd * p * (p.ndim > 2)
            t2 = t * mom + p2 * (1.0 - mom)
            new.append((p2, t2, m, v))
        import optax
        student = unstack_tree([x[0] for x in new])
        teacher = unstack_tree([x[1] for x in new])
        # opt_state left unstacked-restored for shape fidelity
        st = optax.ScaleByAdamState(count,
                                    unstack_tree([x[2] for x in new]),
                                    unstack_tree([x[3] for x in new]))
        center2 = update_center(center, bc, cfg.center_momentum)
        return student, teacher, center2, (st,) + tuple(opt_state[1:])

    jfn = jax.jit(tail_stacked)
    results["tail_stacked"] = timeit(jfn, args)
    print(f"{'tail_stacked':14s} {results['tail_stacked']:7.2f} ms")
    return results


if __name__ == "__main__":
    main()
