"""Tensor-parallel ViT: Megatron-style sharding over the mesh model axis.

The reference has no tensor parallelism (ViT-S fits one device), but the
framework supports it for larger backbones (ViT-B/L) and to demonstrate the
mesh's model axis: attention heads and MLP hidden units are column-sharded,
output projections row-sharded, with one psum after attention and one after
the MLP per block (standard Megatron layout).  Data axis shards the batch
simultaneously (2-D mesh).

Implemented with shard_map so collectives are explicit (psum over the model
axis rides ICI); numerics match the single-device forward to float tolerance
(tests pin this on an 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sais_tpu.config import ViTConfig
from sais_tpu.models.vit import _layer_norm, _linear, patchify
from sais_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def shard_vit_params_tp(params: Dict[str, Any], cfg: ViTConfig,
                        n_model: int) -> Dict[str, Any]:
    """Split attention heads / MLP hidden across n_model shards.

    Returns a pytree whose sharded leaves carry a leading shard axis of
    size n_model (to be device_put with P(MODEL_AXIS) on that axis).
    """
    h = cfg.num_heads
    assert h % n_model == 0, "heads must divide model-parallel size"
    assert cfg.mlp_dim % n_model == 0
    d, dh = cfg.embed_dim, cfg.head_dim

    def split_qkv_w(w):  # (D, 3D) -> (n, D, 3*h_loc*dh)
        w = w.reshape(d, 3, h, dh)
        w = jnp.stack(jnp.split(w, n_model, axis=2))     # (n, D, 3, h_loc, dh)
        return w.reshape(n_model, d, -1)

    def split_qkv_b(b):
        b = b.reshape(3, h, dh)
        b = jnp.stack(jnp.split(b, n_model, axis=1))
        return b.reshape(n_model, -1)

    def split_rows(w, axis_groups):  # row-shard (in, out) on the in dim
        return jnp.stack(jnp.split(w, n_model, axis=0))

    def split_cols(w):
        return jnp.stack(jnp.split(w, n_model, axis=1))

    out = {k: v for k, v in params.items() if k != "blocks"}
    blocks = []
    for blk in params["blocks"]:
        proj_w = blk["attn"]["proj_w"].reshape(h, dh, d)
        proj_w = jnp.stack(jnp.split(proj_w, n_model, axis=0)).reshape(
            n_model, -1, d)
        blocks.append({
            "ln1_s": blk["ln1_s"], "ln1_b": blk["ln1_b"],
            "ln2_s": blk["ln2_s"], "ln2_b": blk["ln2_b"],
            "attn": {
                "qkv_w": split_qkv_w(blk["attn"]["qkv_w"]),
                "qkv_b": split_qkv_b(blk["attn"]["qkv_b"]),
                "proj_w": proj_w,
                # bias added once then psum'd: divide across shards
                "proj_b": jnp.broadcast_to(blk["attn"]["proj_b"] / n_model,
                                           (n_model, d)),
            },
            "mlp": {
                "fc1_w": split_cols(blk["mlp"]["fc1_w"]),
                "fc1_b": jnp.stack(jnp.split(blk["mlp"]["fc1_b"], n_model)),
                "fc2_w": split_rows(blk["mlp"]["fc2_w"], 0),
                "fc2_b": jnp.broadcast_to(blk["mlp"]["fc2_b"] / n_model,
                                          (n_model, d)),
            },
        })
    out["blocks"] = blocks
    return out


def _tp_block(x, p, cfg: ViTConfig, h_loc: int):
    """One transformer block on a model shard.  Sharded leaves arrive from
    shard_map with a leading block axis of size 1 — index it away."""
    b, n, d = x.shape
    dh = cfg.head_dim
    attn, mlp = p["attn"], p["mlp"]
    y = _layer_norm(x, p["ln1_s"], p["ln1_b"], cfg.layernorm_eps)
    qkv = _linear(y, attn["qkv_w"][0], attn["qkv_b"][0])
    qkv = qkv.reshape(b, n, 3, h_loc, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * dh ** -0.5
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", w.astype(x.dtype), v,
                   preferred_element_type=x.dtype).reshape(b, n, h_loc * dh)
    o = _linear(o, attn["proj_w"][0], attn["proj_b"][0])
    x = x + jax.lax.psum(o, MODEL_AXIS)

    y = _layer_norm(x, p["ln2_s"], p["ln2_b"], cfg.layernorm_eps)
    hdn = _linear(y, mlp["fc1_w"][0], mlp["fc1_b"][0])
    hdn = jax.nn.gelu(hdn.astype(jnp.float32), approximate=False).astype(x.dtype)
    o = _linear(hdn, mlp["fc2_w"][0], mlp["fc2_b"][0])
    return x + jax.lax.psum(o, MODEL_AXIS)


def tp_vit_features(tp_params: Dict[str, Any], images: jnp.ndarray,
                    cfg: ViTConfig, mesh: Mesh) -> jnp.ndarray:
    """Tensor+data-parallel ViT forward over a 2-D mesh.

    images: (B, H, W, 3) with B divisible by the data-axis size.
    tp_params: output of shard_vit_params_tp, device_put with the leading
    shard axis mapped to the model axis.
    """
    n_model = mesh.shape[MODEL_AXIS]
    h_loc = cfg.num_heads // n_model

    def shard_spec(leaf):
        # leaves with a leading shard axis of size n_model are model-sharded
        if leaf.ndim >= 1 and leaf.shape[0] == n_model:
            return P(MODEL_AXIS, *([None] * (leaf.ndim - 1)))
        return P(*([None] * leaf.ndim))

    pspecs = jax.tree.map(shard_spec, tp_params)

    def fwd(params, images):
        # token prep shared with the single-device model (its inputs are
        # replicated leaves): patchify + CLS + pos-embed INCLUDING the
        # torch-exact bicubic interpolation for non-default image sizes —
        # a hand-rolled copy here once skipped the interpolation and
        # broke any non-cfg.image_size input
        from sais_tpu.models.vit import prepare_tokens
        x = prepare_tokens(params, images.astype(jnp.float32), cfg)
        for blk in params["blocks"]:
            x = _tp_block(x, blk, cfg, h_loc)
        x = _layer_norm(x, params["ln_s"], params["ln_b"], cfg.layernorm_eps)
        return x[:, 0]

    mapped = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS)),
        out_specs=P(DATA_AXIS))
    return mapped(tp_params, images)


def put_tp_params(tp_params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the sharded pytree: leading shard axis -> model axis,
    everything else replicated."""
    n_model = mesh.shape[MODEL_AXIS]

    def put(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == n_model:
            spec = P(MODEL_AXIS, *([None] * (leaf.ndim - 1)))
        else:
            spec = P(*([None] * leaf.ndim))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, tp_params)
