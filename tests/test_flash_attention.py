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


def test_fused_mha_short_matches_reference():
    from sais_tpu.kernels.fused_mha import fused_mha_short
    b, l, h, dh = 2, 197, 6, 64
    d = h * dh
    qkv = jax.random.normal(jax.random.key(5), (b, l, 3 * d))
    q, k, v = jnp.split(qkv, 3, -1)
    q = q.reshape(b, l, h, dh)
    k = k.reshape(b, l, h, dh)
    v = v.reshape(b, l, h, dh)
    s = jnp.einsum("bnhd,bmhd->bhnm", q * dh ** -0.5, k)
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1),
                     v).reshape(b, l, d)
    out = fused_mha_short(qkv, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)
