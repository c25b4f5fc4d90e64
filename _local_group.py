import time
import jax, jax.numpy as jnp, numpy as np
from sais_tpu.config import ViTConfig
from sais_tpu.models.vit import vit_features, vit_features_trainable_fused

vcfg = ViTConfig()
from sais_tpu.models.vit import vit_init
params = vit_init(jax.random.key(0), vcfg)
loc = jax.random.normal(jax.random.key(2), (512, 96, 96, 3), jnp.bfloat16)

def timeit(fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return (time.time() - t0) / n * 1e3

for nm, bb in (("fused(grouped)", lambda p, x: vit_features_trainable_fused(p, x, vcfg)),
               ("xla_bf16", lambda p, x: vit_features(p, x, vcfg, compute_dtype=jnp.bfloat16))):
    vg = jax.jit(jax.grad(lambda p, x, bb=bb: jnp.sum(bb(p, x) ** 2)))
    print(f"locals(512) fwd+bwd {nm}: {timeit(vg, params, loc):.1f} ms",
          flush=True)
    fwd = jax.jit(lambda p, x, bb=bb: jnp.sum(bb(p, x)))
    print(f"locals(512) fwd {nm}: {timeit(fwd, params, loc):.1f} ms",
          flush=True)
