"""Benchmark: DINO ViT-S/16 feature-extraction throughput on one chip.

This is the reference pipeline's dominant cost (extract_representations.py
:351-378, batch 1024, pinned to CPU) and the headline metric in
BASELINE.json (frames/sec/chip).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

vs_baseline compares against the measured torch-CPU floor recorded in
bench_baseline.json (the reference publishes no numbers of its own).
"""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from sais_tpu.config import ViTConfig
    from sais_tpu.models.vit import vit_features, vit_init

    cfg = ViTConfig()
    params = vit_init(jax.random.key(0), cfg)
    batch = int(os.environ.get("SAIS_BENCH_BATCH", "1024"))
    dtype = jnp.bfloat16

    params = jax.tree.map(lambda a: a.astype(dtype), params)
    fn = jax.jit(lambda p, x: vit_features(p, x, cfg, compute_dtype=dtype,
                                           allow_fused=True))
    x = jax.random.uniform(jax.random.key(1), (batch, 224, 224, 3), dtype)
    jax.block_until_ready(fn(params, x))  # compile

    # timed window; dispatch pipelined a few deep so per-call round-trip
    # latency (large on remote-TPU tunnels) doesn't pollute throughput
    iters = 0
    depth = 4
    inflight = []
    t0 = time.time()
    while time.time() - t0 < float(os.environ.get("SAIS_BENCH_SECS", "10")):
        inflight.append(fn(params, x))
        if len(inflight) > depth:
            jax.block_until_ready(inflight.pop(0))
        iters += 1
    jax.block_until_ready(inflight)
    dt = time.time() - t0
    fps = batch * iters / dt

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_baseline.json")) as f:
        base = json.load(f)["baseline_frames_per_sec"]

    print(json.dumps({
        "metric": "dino_vit_s16_feature_extraction",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / base, 1),
    }))


if __name__ == "__main__":
    main()
