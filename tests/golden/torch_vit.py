"""Golden functional PyTorch DINO ViT used only to verify numerical parity.

Consumes a state_dict in the exact naming convention of the reference
checkpoint `dino_deitsmall16_pretrain.pth` (dino-main/vision_transformer.py)
and computes the forward pass with torch.nn.functional ops.  This is the
oracle the JAX implementation + weight converter are tested against.
"""

import math

import torch
import torch.nn.functional as F


def random_dino_state_dict(gen: torch.Generator, depth=12, dim=384, heads=6,
                           patch=16, img=224, mlp_ratio=4):
    def r(*shape):
        return 0.02 * torch.randn(*shape, generator=gen)

    n_patches = (img // patch) ** 2
    sd = {
        "cls_token": r(1, 1, dim),
        "pos_embed": r(1, n_patches + 1, dim),
        "patch_embed.proj.weight": r(dim, 3, patch, patch),
        "patch_embed.proj.bias": r(dim),
        "norm.weight": 1 + 0.1 * r(dim),
        "norm.bias": 0.1 * r(dim),
    }
    md = dim * mlp_ratio
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1 + 0.1 * r(dim), p + "norm1.bias": 0.1 * r(dim),
            p + "attn.qkv.weight": r(3 * dim, dim), p + "attn.qkv.bias": r(3 * dim),
            p + "attn.proj.weight": r(dim, dim), p + "attn.proj.bias": r(dim),
            p + "norm2.weight": 1 + 0.1 * r(dim), p + "norm2.bias": 0.1 * r(dim),
            p + "mlp.fc1.weight": r(md, dim), p + "mlp.fc1.bias": r(md),
            p + "mlp.fc2.weight": r(dim, md), p + "mlp.fc2.bias": r(dim),
        })
    return sd


@torch.no_grad()
def golden_vit_forward(sd, images, depth=12, heads=6, patch=16, eps=1e-6,
                       return_last_attention=False):
    """images: (B, 3, H, W) normalized float32. Returns CLS features (B, D)
    and optionally the last block's attention (B, heads, N+1, N+1)."""
    b = images.shape[0]
    x = F.conv2d(images, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=patch)
    x = x.flatten(2).transpose(1, 2)                       # (B, N, D)
    dim = x.shape[-1]
    x = torch.cat([sd["cls_token"].expand(b, -1, -1), x], dim=1)
    x = x + sd["pos_embed"]

    last_attn = None
    for i in range(depth):
        p = f"blocks.{i}."
        h = F.layer_norm(x, (dim,), sd[p + "norm1.weight"],
                         sd[p + "norm1.bias"], eps)
        qkv = F.linear(h, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
        attn = attn.softmax(dim=-1)
        if i == depth - 1:
            last_attn = attn
        h = (attn @ v).transpose(1, 2).reshape(b, n, dim)
        h = F.linear(h, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"])
        x = x + h
        h = F.layer_norm(x, (dim,), sd[p + "norm2.weight"],
                         sd[p + "norm2.bias"], eps)
        h = F.linear(h, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
        x = x + h

    x = F.layer_norm(x, (dim,), sd["norm.weight"], sd["norm.bias"], eps)
    if return_last_attention:
        return x[:, 0], last_attn
    return x[:, 0]
