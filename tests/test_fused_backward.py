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
