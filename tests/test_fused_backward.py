"""Pallas fused-block backward: gradients must match the XLA twin.

The fully-fused training path (kernels/fused_mha.make_pallas_trainable_
fused_block) runs forward AND backward as Pallas kernels; its VJP must
agree with jax.vjp of the identical-math XLA block (_xla_block_tanh).
Runs in interpret mode on CPU; the TPU speed claim is benchmarked
separately on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.kernels.fused_mha import (_xla_block_tanh,
                                        make_pallas_trainable_fused_block)

HEADS, D, LP, VALID, B = 2, 64, 128, 100, 3


def _weights(key, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    shapes = [(D, 3 * D), (3 * D,), (D, D), (D,), (D, 4 * D), (4 * D,),
              (4 * D, D), (D,), (D,), (D,), (D,), (D,)]
    ws = [0.05 * jax.random.normal(k, s, jnp.float32).astype(dtype)
          for k, s in zip(ks, shapes)]
    # LN scales near 1
    ws[8] = (1.0 + 0.1 * jax.random.normal(ks[8], (D,))).astype(dtype)
    ws[10] = (1.0 + 0.1 * jax.random.normal(ks[10], (D,))).astype(dtype)
    return tuple(ws)


def _x(key, dtype=jnp.float32):
    x = jax.random.normal(key, (B, LP, D), jnp.float32).astype(dtype)
    # zero the padded rows like the caller does
    return x * (jnp.arange(LP)[None, :, None] < VALID)


def test_pallas_backward_matches_xla_twin_f32():
    ws = _weights(jax.random.key(0))
    x = _x(jax.random.key(1))
    g = jax.random.normal(jax.random.key(2), (B, LP, D), jnp.float32)

    block_op = make_pallas_trainable_fused_block(HEADS, VALID,
                                                 interpret=True)
    out, vjp = jax.vjp(block_op, x, *ws)
    grads = vjp(g)

    ref_out, ref_vjp = jax.vjp(
        lambda x, *w: _xla_block_tanh(x, *w, num_heads=HEADS,
                                      valid_len=VALID, eps=1e-6), x, *ws)
    ref_grads = ref_vjp(g)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)
    names = ["dx", "dqkv_w", "dqkv_b", "dproj_w", "dproj_b", "dfc1_w",
             "dfc1_b", "dfc2_w", "dfc2_b", "dln1_s", "dln1_b", "dln2_s",
             "dln2_b"]
    for name, a, b in zip(names, grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_pallas_backward_bf16_close():
    """bf16 path (the production dtype): grads within bf16 tolerance of
    the f32 XLA reference."""
    ws32 = _weights(jax.random.key(3))
    x32 = _x(jax.random.key(4))
    g32 = jax.random.normal(jax.random.key(5), (B, LP, D), jnp.float32)
    ws = tuple(w.astype(jnp.bfloat16) for w in ws32)
    x = x32.astype(jnp.bfloat16)

    block_op = make_pallas_trainable_fused_block(HEADS, VALID,
                                                 interpret=True)
    _, vjp = jax.vjp(block_op, x, *ws)
    grads = vjp(g32.astype(jnp.bfloat16))

    _, ref_vjp = jax.vjp(
        lambda x, *w: _xla_block_tanh(x, *w, num_heads=HEADS,
                                      valid_len=VALID, eps=1e-6),
        x32, *ws32)
    ref = ref_vjp(g32)
    for a, b in zip(grads, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.1, np.abs(a - b).max()


def test_pallas_backward_short_sequence_grouped():
    """Local-crop regime (L=37 -> lp=48): the length-adaptive imgs-per-
    program grouping (fwd want ~416/lp, bwd ~208/lp) must leave gradients
    identical to the XLA twin."""
    heads, d, lp, valid, b = 2, 64, 48, 37, 8
    ks = jax.random.split(jax.random.key(11), 12)
    shapes = [(d, 3 * d), (3 * d,), (d, d), (d,), (d, 4 * d), (4 * d,),
              (4 * d, d), (d,), (d,), (d,), (d,), (d,)]
    ws = tuple(0.05 * jax.random.normal(k, s) for k, s in zip(ks, shapes))
    x = jax.random.normal(jax.random.key(12), (b, lp, d))
    x = x * (jnp.arange(lp)[None, :, None] < valid)

    block_op = make_pallas_trainable_fused_block(heads, valid,
                                                 interpret=True)

    def loss_p(x, *w):
        return jnp.sum(block_op(x, *w)[:, :valid] ** 2)

    def loss_r(x, *w):
        return jnp.sum(_xla_block_tanh(x, *w, num_heads=heads,
                                       valid_len=valid,
                                       eps=1e-6)[:, :valid] ** 2)

    gp = jax.grad(loss_p, argnums=tuple(range(13)))(x, *ws)
    gr = jax.grad(loss_r, argnums=tuple(range(13)))(x, *ws)
    for i, (a, b_) in enumerate(zip(gp, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=str(i))


def test_pallas_backward_scaled_matches_xla_twin():
    """Stochastic-depth branch scales (scaled=True): forward and every
    gradient must match the XLA twin given the SAME per-image masks —
    including zeroed branches (mask 0) and survivor scaling (1/keep)."""
    ws = _weights(jax.random.key(20))
    x = _x(jax.random.key(21))
    g = jax.random.normal(jax.random.key(22), (B, LP, D), jnp.float32)
    keep = 0.9
    m1 = jnp.array([1.0, 0.0, 1.0]) / keep          # image 1 drops attn
    m2 = jnp.array([0.0, 1.0, 1.0]) / keep          # image 0 drops mlp
    s1 = jnp.broadcast_to(m1[:, None, None], (B, LP, 1)).astype(jnp.float32)
    s2 = jnp.broadcast_to(m2[:, None, None], (B, LP, 1)).astype(jnp.float32)

    block_op = make_pallas_trainable_fused_block(HEADS, VALID,
                                                 interpret=True, scaled=True)
    out, vjp = jax.vjp(block_op, x, s1, s2, *ws)
    grads = vjp(g)

    ref_out, ref_vjp = jax.vjp(
        lambda x, *w: _xla_block_tanh(x, *w, num_heads=HEADS,
                                      valid_len=VALID, eps=1e-6,
                                      s1=s1, s2=s2), x, *ws)
    ref_grads = ref_vjp(g)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)
    # grads[0] = dx; grads[1:3] = ds1/ds2 (defined zero); grads[3:] weights
    np.testing.assert_allclose(np.asarray(grads[0]),
                               np.asarray(ref_grads[0]),
                               rtol=2e-3, atol=2e-4, err_msg="dx")
    assert not np.asarray(grads[1]).any() and not np.asarray(grads[2]).any()
    names = ["dqkv_w", "dqkv_b", "dproj_w", "dproj_b", "dfc1_w", "dfc1_b",
             "dfc2_w", "dfc2_b", "dln1_s", "dln1_b", "dln2_s", "dln2_b"]
    for name, a, b in zip(names, grads[3:], ref_grads[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_scaled_all_ones_equals_unscaled():
    """With every mask = 1 the scaled kernels must reproduce the plain
    path bitwise (same dtype, same op order)."""
    ws = _weights(jax.random.key(23))
    x = _x(jax.random.key(24))
    ones = jnp.ones((B, LP, 1), jnp.float32)
    plain = make_pallas_trainable_fused_block(HEADS, VALID, interpret=True)
    scaled = make_pallas_trainable_fused_block(HEADS, VALID, interpret=True,
                                               scaled=True)
    np.testing.assert_array_equal(np.asarray(plain(x, *ws)),
                                  np.asarray(scaled(x, ones, ones, *ws)))


def test_vit_trainable_fused_drop_path_interpret():
    """vit_features_trainable_fused with drop_path: runs under interpret
    mode, differentiates, and at rate 0 equals the no-drop call."""
    from sais_tpu.models.vit import (ViTConfig, vit_init,
                                     vit_features_trainable_fused)
    cfg = ViTConfig(image_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=2)
    params = vit_init(jax.random.key(30), cfg)
    imgs = jax.random.normal(jax.random.key(31), (4, 32, 32, 3))

    base = vit_features_trainable_fused(params, imgs, cfg, interpret=True)
    same = vit_features_trainable_fused(params, imgs, cfg, interpret=True,
                                        drop_path_rate=0.0,
                                        rng=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))

    def loss(p):
        f = vit_features_trainable_fused(p, imgs, cfg, interpret=True,
                                         drop_path_rate=0.5,
                                         rng=jax.random.key(1))
        return jnp.sum(f ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in flat)
    # a 0.5 rate with 2*depth independent draws across 4 images must
    # actually drop something -> output differs from the deterministic one
    dropped = vit_features_trainable_fused(params, imgs, cfg,
                                           interpret=True,
                                           drop_path_rate=0.5,
                                           rng=jax.random.key(1))
    assert np.abs(np.asarray(dropped) - np.asarray(base)).max() > 1e-3


def test_pallas_backward_scaled_packed_short_sequence():
    """Packed block-diagonal attention + stochastic-depth scales together
    (the DINO student local-crop regime): gradients must match the scaled
    XLA twin."""
    heads, d, lp, valid, b = 2, 64, 48, 37, 8
    ks = jax.random.split(jax.random.key(40), 12)
    shapes = [(d, 3 * d), (3 * d,), (d, d), (d,), (d, 4 * d), (4 * d,),
              (4 * d, d), (d,), (d,), (d,), (d,), (d,)]
    ws = tuple(0.05 * jax.random.normal(k, s) for k, s in zip(ks, shapes))
    x = jax.random.normal(jax.random.key(41), (b, lp, d))
    x = x * (jnp.arange(lp)[None, :, None] < valid)
    keep = 0.8
    m1 = (jax.random.uniform(jax.random.key(42), (b,)) < keep) / keep
    m2 = (jax.random.uniform(jax.random.key(43), (b,)) < keep) / keep
    s1 = jnp.broadcast_to(m1[:, None, None], (b, lp, 1)).astype(x.dtype)
    s2 = jnp.broadcast_to(m2[:, None, None], (b, lp, 1)).astype(x.dtype)

    block_op = make_pallas_trainable_fused_block(heads, valid,
                                                 interpret=True, scaled=True)

    def loss_p(x, *w):
        return jnp.sum(block_op(x, s1, s2, *w)[:, :valid] ** 2)

    def loss_r(x, *w):
        return jnp.sum(_xla_block_tanh(x, *w, num_heads=heads,
                                       valid_len=valid, eps=1e-6,
                                       s1=s1, s2=s2)[:, :valid] ** 2)

    gp = jax.grad(loss_p, argnums=tuple(range(13)))(x, *ws)
    gr = jax.grad(loss_r, argnums=tuple(range(13)))(x, *ws)
    for i, (a, b_) in enumerate(zip(gp, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=str(i))


def test_drop_path_realized_probability_matches_schedule():
    """The realized drop frequency must track keep_prob finely — an f32
    draw.  A bf16 U[0,1) (128 distinct values) quantizes realized drop
    probs to n/128: e.g. block 1 of linspace(0, 0.1, 12) would drop at
    0.00774 instead of 0.00909 (-15%) and scale survivors by bf16(1/keep).
    """
    from sais_tpu.models.vit import drop_path_scales
    prob = 0.1 * 1 / 11          # ViT-S block-1 rate of the 0.1 schedule
    keep = 1.0 - prob
    s = np.asarray(drop_path_scales(jax.random.key(7), keep, 200_000))
    rate = float((s == 0).mean())
    assert abs(rate - prob) < 5e-4, rate       # bf16 draw is ~1.4e-3 off
    # survivor scale is exactly 1/keep at f32, not bf16(1/keep)
    np.testing.assert_allclose(np.unique(s), [0.0, 1.0 / keep], rtol=1e-6)


def test_vit_trainable_fused_no_qkv_bias():
    """qkv_bias=False stores qkv_b=None; the trainable fused path must
    substitute a zero bias like the inference path does, not crash."""
    from sais_tpu.models.vit import (ViTConfig, vit_features, vit_init,
                                     vit_features_trainable_fused)
    cfg = ViTConfig(image_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=2, qkv_bias=False)
    params = vit_init(jax.random.key(33), cfg)
    imgs = jax.random.normal(jax.random.key(34), (4, 32, 32, 3))
    fused = vit_features_trainable_fused(params, imgs, cfg, interpret=True)
    dense = vit_features(params, imgs, cfg, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               atol=0.06)
    g = jax.grad(lambda p: jnp.sum(vit_features_trainable_fused(
        p, imgs, cfg, interpret=True) ** 2))(params)
    assert all(np.isfinite(np.asarray(x, np.float32)).all()
               for x in jax.tree.leaves(g))


def test_attention_sub_group_sizes_agree():
    """The packed-attention sub-group size (fused_mha._auto_packed /
    the `packed` override) is a pure performance knob: forward values
    and gradients must be identical for every sub size at the local-crop
    geometry (lp=48, 8 images — the DINO student regime the v5e sweep
    tunes; tools/packed_sub_sweep.py)."""
    heads, d, lp, valid, b = 2, 64, 48, 37, 8
    ks = jax.random.split(jax.random.key(50), 12)
    shapes = [(d, 3 * d), (3 * d,), (d, d), (d,), (d, 4 * d), (4 * d,),
              (4 * d, d), (d,), (d,), (d,), (d,), (d,)]
    ws = tuple(0.05 * jax.random.normal(k, s) for k, s in zip(ks, shapes))
    x = jax.random.normal(jax.random.key(51), (b, lp, d))
    x = x * (jnp.arange(lp)[None, :, None] < valid)

    def run(sub):
        op = make_pallas_trainable_fused_block(heads, valid,
                                               interpret=True, packed=sub)
        out = op(x, *ws)
        g = jax.grad(lambda xx: jnp.sum(op(xx, *ws)[:, :valid] ** 2))(x)
        return np.asarray(out), np.asarray(g)

    ref_out, ref_g = run(1)
    for sub in (2, 4, 8, True, None):
        out, g = run(sub)
        np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5,
                                   err_msg=f"fwd sub={sub}")
        np.testing.assert_allclose(g, ref_g, rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad sub={sub}")
