"""W8A8 fused ViT block (opt-in throughput experiment).

Measured on v5e (batch 1024): 14.8k f/s vs 14.25k bf16 (+3.8%) — Mosaic's
int8 dot does not reach the MXU's nominal 2x int8 rate on this toolchain,
so the mode stays opt-in.  Quality: mean CLS cosine vs f32 0.9997.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import ViTConfig
from sais_tpu.kernels.fused_mha import (fused_vit_block, fused_vit_block_int8,
                                        quantize_weight)
from sais_tpu.models.vit import vit_init


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (1, 128)
    deq = np.asarray(wq, np.float32) * np.asarray(ws)
    err = np.abs(deq - np.asarray(w)).max()
    # per-channel scale bounds error by half a quantization step
    assert err <= (np.abs(np.asarray(w)).max(0) / 127.0).max() * 0.5 + 1e-7


def test_int8_block_close_to_bf16_block():
    cfg = ViTConfig()
    params = vit_init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["blocks"][0])
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 208, 384)
                          ).astype(jnp.bfloat16)
    args = (x, p["attn"]["qkv_w"], p["attn"]["qkv_b"], p["attn"]["proj_w"],
            p["attn"]["proj_b"], p["mlp"]["fc1_w"], p["mlp"]["fc1_b"],
            p["mlp"]["fc2_w"], p["mlp"]["fc2_b"], p["ln1_s"], p["ln1_b"],
            p["ln2_s"], p["ln2_b"])
    ref = np.asarray(fused_vit_block(*args, num_heads=cfg.num_heads,
                                     valid_len=197, imgs=2, interpret=True),
                     np.float32)[:, :197]
    got = np.asarray(fused_vit_block_int8(*args, num_heads=cfg.num_heads,
                                          valid_len=197, imgs=2,
                                          interpret=True),
                     np.float32)[:, :197]
    cos = (got.ravel() @ ref.ravel()) / (np.linalg.norm(got)
                                         * np.linalg.norm(ref))
    assert cos > 0.9999
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02
