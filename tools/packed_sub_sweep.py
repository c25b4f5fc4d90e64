"""Sweep the packed-attention sub-group size for the fused trainable
blocks at the DINO local-crop geometry (lp=48, valid=37, 512 images =
batch 64 x 8 local crops) and sanity-check the global geometry.

The fully-packed form (sub = whole 8-image group, 384 rows) computes 8x
the useful score FLOPs; per-image (sub=1) starves the MXU.  This sweep
measures fwd and fwd+bwd per sub size to pick _PACKED_SUB_ROWS.

Run alone on the 1-core host: python tools/packed_sub_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sais_tpu.config import ViTConfig
from sais_tpu.models.vit import vit_features_trainable_fused


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


def main():
    from sais_tpu.models.vit import vit_init

    vcfg = ViTConfig()
    key = jax.random.key(0)
    params = vit_init(key, vcfg)
    loc = jax.random.normal(jax.random.key(2), (512, 96, 96, 3),
                            jnp.bfloat16)
    glob = jax.random.normal(jax.random.key(3), (128, 224, 224, 3),
                             jnp.bfloat16)

    def bb(p, x, packed):
        return vit_features_trainable_fused(p, x, vcfg,
                                            drop_path_rate=0.1,
                                            rng=jax.random.key(7),
                                            packed=packed)

    def fb(p, x, ct, packed):
        y, vjp = jax.vjp(lambda pp: bb(pp, x, packed), p)
        return vjp(ct)

    ct_l = jnp.ones((512, vcfg.embed_dim), jnp.float32)
    ct_g = jnp.ones((128, vcfg.embed_dim), jnp.float32)

    for sub in [1, 2, 4, 8]:
        f = jax.jit(lambda p, x, s=sub: bb(p, x, s))
        g = jax.jit(lambda p, x, ct, s=sub: fb(p, x, ct, s))
        t_f = timeit(f, (params, loc))
        t_fb = timeit(g, (params, loc, ct_l))
        print(f"locals  sub={sub} ({sub*48:3d} rows) "
              f"fwd {t_f:6.2f} ms  fwd+bwd {t_fb:6.2f} ms", flush=True)
    f = jax.jit(lambda p, x: bb(p, x, None))
    g = jax.jit(lambda p, x, ct: fb(p, x, ct, None))
    print(f"globals (sub=1 path)        fwd {timeit(f, (params, glob)):6.2f}"
          f" ms  fwd+bwd {timeit(g, (params, glob, ct_g)):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
