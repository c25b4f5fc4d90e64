"""Pallas flash attention vs vanilla XLA attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import TemporalConfig
from sais_tpu.kernels.flash_attention import cls_attention_row, flash_attention
from sais_tpu.models.temporal import (encoder_forward, encoder_init,
                                      multihead_attention)


def _ref_attention(q, k, v, mask):
    dh = q.shape[-1]
    logits = jnp.einsum("bhld,bhmd->bhlm", q * dh ** -0.5, k)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], -1e30, logits)
    w = jax.nn.softmax(logits, -1)
    return jnp.einsum("bhlm,bhmd->bhld", w, v), w


@pytest.mark.parametrize("l,dh", [(256, 96), (300, 64), (128, 128)])
def test_flash_matches_reference(l, dh):
    key = jax.random.key(0)
    b, h = 2, 4
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, h, l, dh))
               for i in range(3))
    mask = jax.random.bernoulli(jax.random.fold_in(key, 9), 0.3, (b, l))
    mask = mask.at[:, 0].set(False)  # CLS always valid
    ref, _ = _ref_attention(q, k, v, mask)
    out = flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_cls_row_matches_reference():
    key = jax.random.key(1)
    b, h, l, dh = 2, 4, 160, 96
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, h, l, dh))
               for i in range(3))
    mask = jnp.zeros((b, l), bool).at[:, 100:].set(True)
    _, w = _ref_attention(q, k, v, mask)
    ref_row = jnp.mean(w[:, :, 0, :], axis=1)
    row = cls_attention_row(q, k, mask)
    np.testing.assert_allclose(np.asarray(row), np.asarray(ref_row),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("l,dh", [(300, 64), (256, 96)])
def test_flash_backward_matches_reference(l, dh):
    """custom_vjp (two-kernel Pallas flash backward) == jax.grad of the
    dense softmax-attention reference, for q, k and v, under masking."""
    key = jax.random.key(4)
    b, h = 2, 3
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, h, l, dh))
               for i in range(3))
    mask = jax.random.bernoulli(jax.random.fold_in(key, 9), 0.25, (b, l))
    mask = mask.at[:, 0].set(False)
    cot = jax.random.normal(jax.random.fold_in(key, 5), (b, h, l, dh))

    def loss_ref(q, k, v):
        out, _ = _ref_attention(q, k, v, mask)
        return jnp.sum(out * cot)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, interpret=True) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_fl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_encoder_flash_training_end_to_end():
    """A gradient step through the full flash encoder (the long-sequence
    TRAINING capability the VJP enables) matches the dense encoder's."""
    cfg = TemporalConfig(rep_dim=64, num_layers=1, num_heads=4, ffn_dim=96)
    params = encoder_init(jax.random.key(8), cfg)
    x = jax.random.normal(jax.random.key(9), (2, 140, 64))
    mask = jnp.zeros((2, 140), bool).at[0, 120:].set(True)

    def loss(params, use_flash):
        out, _ = encoder_forward(params, x, cfg, mask, use_flash=use_flash,
                                 interpret=True)
        return jnp.sum(jnp.where(mask[..., None], 0.0, out) ** 2)

    g_dense = jax.grad(lambda p: loss(p, False))(params)
    g_flash = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_flash), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_encoder_flash_path_matches_vanilla():
    cfg = TemporalConfig(rep_dim=64, num_layers=2, num_heads=4, ffn_dim=128)
    params = encoder_init(jax.random.key(2), cfg)
    x = jax.random.normal(jax.random.key(3), (3, 130, 64))
    mask = jnp.zeros((3, 130), bool).at[1, 90:].set(True)

    out_ref, attn_ref = encoder_forward(params, x, cfg, mask)
    out_flash, cls_row = encoder_forward(params, x, cfg, mask,
                                         use_flash=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)
    # flash path's CLS row equals row 0 of the vanilla head-averaged matrix
    np.testing.assert_allclose(np.asarray(cls_row),
                               np.asarray(attn_ref[:, 0, :]), rtol=1e-4,
                               atol=1e-6)


def test_trainable_fused_block_forward_and_grad():
    """Pallas-forward / XLA-backward block: forward matches the XLA twin,
    gradients equal the twin's exactly (bwd is its VJP by construction)."""
    from sais_tpu.kernels.fused_mha import (_xla_block_tanh,
                                            make_trainable_fused_block)
    from sais_tpu.models.vit import vit_init
    from sais_tpu.config import ViTConfig
    cfg = ViTConfig(image_size=32, patch_size=8, embed_dim=64, depth=1,
                    num_heads=4)
    p = vit_init(jax.random.key(0), cfg)["blocks"][0]
    weights = (p["attn"]["qkv_w"], p["attn"]["qkv_b"], p["attn"]["proj_w"],
               p["attn"]["proj_b"], p["mlp"]["fc1_w"], p["mlp"]["fc1_b"],
               p["mlp"]["fc2_w"], p["mlp"]["fc2_b"], p["ln1_s"], p["ln1_b"],
               p["ln2_s"], p["ln2_b"])
    x = jax.random.normal(jax.random.key(1), (2, 128, 64))
    valid = 100

    block_op = make_trainable_fused_block(4, valid, interpret=True)
    out = block_op(x, *weights)
    ref = _xla_block_tanh(x, *weights, num_heads=4, valid_len=valid, eps=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, :valid]),
                               np.asarray(ref[:, :valid]), rtol=2e-5,
                               atol=2e-5)

    def loss_fused(x, w0):
        return jnp.sum(block_op(x, w0, *weights[1:])[:, :valid] ** 2)

    def loss_ref(x, w0):
        return jnp.sum(_xla_block_tanh(x, w0, *weights[1:], num_heads=4,
                                       valid_len=valid,
                                       eps=1e-6)[:, :valid] ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, weights[0])
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, weights[0])
    # bwd recomputes via the XLA twin, but the incoming cotangent comes from
    # the (numerically close) pallas forward -> near-exact agreement
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4,
                               atol=1e-4)


def test_flash_all_masked_element_is_zero_and_grad_safe():
    """A batch element with EVERY key masked has no valid softmax; the
    additive -1e30 bias cancels inside exp(s + bias - lse), so without the
    wrapper fix the kernels return an unmasked average (forward) and
    O(L)-magnitude dk/dv (backward).  Contract: zeros out, zero grads in."""
    key = jax.random.key(11)
    b, h, l, dh = 3, 2, 256, 64
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, h, l, dh))
               for i in range(3))
    mask = jnp.zeros((b, l), bool).at[1].set(True)      # element 1: all pad
    out = flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)
    # valid elements unaffected
    ref, _ = _ref_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=2e-5, atol=2e-5)

    def loss(q, k, v):
        o = flash_attention(q, k, v, mask, interpret=True)
        return jnp.sum(o ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (dq, dk, dv):
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_array_equal(np.asarray(g[1]), 0.0)


def test_flash_mixed_dtype_grad():
    """dk must come back in k's dtype (custom_vjp aval check) even when q
    and k/v dtypes differ."""
    key = jax.random.key(12)
    b, h, l, dh = 1, 2, 128, 64
    q = jax.random.normal(jax.random.fold_in(key, 0), (b, h, l, dh),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, l, dh))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, l, dh))

    def loss(q, k, v):
        o = flash_attention(q, k, v, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert dq.dtype == jnp.bfloat16 and dk.dtype == jnp.float32
    assert np.isfinite(np.asarray(dk)).all()


def test_flash_chunked_matches_reference():
    """Past the per-program VMEM ceiling (~4k tokens f32/Dh<=128 for the
    double-buffered K/V) flash_attention switches to the chunked core —
    K/V slices against the full query, merged by the online-softmax
    recurrence.  Forced small chunk here so CPU interpret stays cheap;
    ragged tail (320 -> 128+128+64) and masking included."""
    from sais_tpu.kernels.flash_attention import (_NEG_INF,
                                                  _flash_core_chunked,
                                                  _pad_to)

    key = jax.random.key(3)
    b, h, l, dh = 2, 2, 300, 64
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, h, l, dh))
               for i in range(3))
    mask = jax.random.bernoulli(jax.random.fold_in(key, 9), 0.3, (b, l))
    mask = mask.at[:, 0].set(False)
    ref, _ = _ref_attention(q, k, v, mask)

    bias = jnp.where(mask, _NEG_INF, 0.0).astype(jnp.float32)
    pad = lambda x: _pad_to(_pad_to(x, 2, 64), 3, 128)
    bp = _pad_to(bias, 1, 64, value=_NEG_INF)
    out = _flash_core_chunked(pad(q), pad(k), pad(v), bp, dh ** -0.5,
                              64, 64, True, 128)[:, :, :l, :dh]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradients: dq sums over key chunks, dk/dv over query chunks, all
    # from the GLOBAL logsumexp — must match dense autodiff
    w = jax.random.normal(jax.random.fold_in(key, 20), (b, h, l, dh))

    def loss_chunk(q, k, v):
        o = _flash_core_chunked(pad(q), pad(k), pad(v), bp, dh ** -0.5,
                                64, 64, True, 128)
        return jnp.sum(o[:, :, :l, :dh] * w)

    def loss_dense(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, mask)[0] * w)

    gc = jax.grad(loss_chunk, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                    rtol=5e-4, atol=5e-4)


def test_flash_no_length_ceiling():
    """The old ~8k f32 VMEM ceiling is gone: a 40k-token call traces to
    the chunked core instead of raising (abstract eval only — no CPU
    compute)."""
    b, h, l, dh = 1, 1, 40_000, 64
    q = jax.ShapeDtypeStruct((b, h, l, dh), jnp.bfloat16)
    out = jax.eval_shape(lambda x: flash_attention(x, x, x), q)
    assert out.shape == (b, h, l, dh)


def test_vmem_chunk_tokens_selection():
    from sais_tpu.kernels.flash_attention import _vmem_chunk_tokens

    assert _vmem_chunk_tokens(128, 4, 512) == 4096     # f32, Dh<=128
    assert _vmem_chunk_tokens(128, 2, 512) == 8192     # bf16
    assert _vmem_chunk_tokens(256, 4, 512) == 2048     # wide heads
    assert _vmem_chunk_tokens(128, 4, 512) % 512 == 0
