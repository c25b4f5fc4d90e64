"""Named DINO backbone configurations — the reference hubconf surface.

The vendored DINO tool exposes torch-hub entry points (dino-main/
hubconf.py:22-81: dino_vits16 / dino_vits8 / dino_vitb16 / dino_vitb8)
that build a ViT at a named geometry and pull the matching pretrained
checkpoint from facebookresearch's release URLs.  This module is the
TPU-native equivalent: `create(name)` returns (params, ViTConfig) at the
same geometries, random-initialized by default or ported from a LOCAL
torch checkpoint file (this environment has no network egress and ships
no weights, so there is no download path — pass the .pth you have).

Out of scope, deliberately: hubconf's dino_resnet50 (hubconf.py:82-96,
a torchvision resnet50 — never used by the SAIS pipeline) and the four
XCiT variants (hubconf.py:98-151, `torch.hub.load` of the external
facebookresearch/xcit repo — not code in the reference tree at all).

Example:
    params, cfg = zoo.create("vits16", key=jax.random.key(0))
    params, cfg = zoo.create("vitb8", torch_checkpoint="dino_vitb8.pth")
    feats = vit_features(params, images, cfg)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from sais_tpu.config import ViTConfig

# hubconf.py geometry table: vit_small(patch_size=...) at :27/42 and
# vit_base at :57/72; vision_transformer.py:243-255 supplies
# embed_dim/depth/heads for each family.
CONFIGS = {
    "vits16": ViTConfig(patch_size=16, embed_dim=384, depth=12, num_heads=6),
    "vits8": ViTConfig(patch_size=8, embed_dim=384, depth=12, num_heads=6),
    "vitb16": ViTConfig(patch_size=16, embed_dim=768, depth=12,
                        num_heads=12),
    "vitb8": ViTConfig(patch_size=8, embed_dim=768, depth=12, num_heads=12),
}

# the torch-hub entry-point names, for discoverability by reference users
ALIASES = {
    "dino_vits16": "vits16",
    "dino_vits8": "vits8",
    "dino_vitb16": "vitb16",
    "dino_vitb8": "vitb8",
}


def config(name: str) -> ViTConfig:
    """ViTConfig for a zoo name (accepts hubconf aliases)."""
    key = ALIASES.get(name, name)
    if key not in CONFIGS:
        raise KeyError(f"unknown model {name!r}; choose from "
                       f"{sorted(CONFIGS) + sorted(ALIASES)}")
    return CONFIGS[key]


def create(name: str, key: Optional[jax.Array] = None,
           torch_checkpoint: Optional[str] = None) -> Tuple[dict, ViTConfig]:
    """Build (params, cfg) for a named DINO backbone.

    torch_checkpoint: path to a local .pth in the facebookresearch
    release layout (a plain backbone state_dict, or a DINO training
    checkpoint whose student keys get stripped — the same two layouts
    extract_representations.py:181-203 handles).
    """
    cfg = config(name)
    if torch_checkpoint is not None:
        from sais_tpu.port.torch_port import (load_torch_pickle,
                                              strip_dino_student_prefix,
                                              vit_params_from_torch)
        sd = load_torch_pickle(torch_checkpoint)
        # handles both layouts: plain backbone state_dict and nested DINO
        # training checkpoints ({'student': ...})
        sd = strip_dino_student_prefix(sd)
        return vit_params_from_torch(sd), cfg
    from sais_tpu.models.vit import vit_init
    if key is None:
        key = jax.random.key(0)
    return vit_init(key, cfg), cfg
