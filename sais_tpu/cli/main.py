"""sais-tpu command line — the reference main.sh pipeline as one binary.

Subcommands map onto the reference stages (SAIS/main.sh:12-30):

  frames   — mp4 -> images/<video>/frames_%08d.jpg   (video_to_frames.sh)
  paths    — path manifests CSVs                      (generate_paths.py)
  extract  — DINO features -> results/*.h5            (extract_representations.py)
  decode   — windows -> prototypes -> gestures CSV    (run_experiments.py
                                                       --inference +
                                                       process_inference_results.py)
  pipeline — all of the above in one pipelined pass

Checkpoints: --dino-weights takes the reference dino_deitsmall16_pretrain.pth;
--params/--prototypes take the reference params.zip/prototypes.zip.  With
--random-init the models run freshly initialized (smoke/benchmark mode).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional, Tuple

import numpy as np


def _load_vit(args, cfg):
    import jax
    from sais_tpu.models.vit import vit_init
    from sais_tpu.port.torch_port import (load_torch_pickle,
                                          strip_dino_student_prefix,
                                          vit_params_from_torch)
    if args.dino_weights:
        sd = load_torch_pickle(args.dino_weights)
        if any(k.startswith(("student", "teacher")) for k in sd):
            sd = strip_dino_student_prefix(sd)
        return vit_params_from_torch(sd)
    if not args.random_init:
        sys.exit("need --dino-weights or --random-init")
    return vit_init(jax.random.key(0), cfg.vit)


def _load_folds(args, cfg) -> List[Tuple[dict, "np.ndarray"]]:
    import jax
    from sais_tpu.models.full_model import full_model_init, prototypes_init
    from sais_tpu.port.torch_port import (full_model_params_from_torch,
                                          load_torch_pickle,
                                          prototypes_from_torch)
    folds = []
    if args.params_dir:
        for fold in range(args.nfolds):
            d = os.path.join(args.params_dir, f"Fold_{fold}")
            params = full_model_params_from_torch(
                load_torch_pickle(os.path.join(d, "params.zip")))
            _, protos = prototypes_from_torch(
                load_torch_pickle(os.path.join(d, "prototypes.zip")))
            folds.append((params, protos))
    else:
        if not args.random_init:
            sys.exit("need --params-dir or --random-init")
        params = full_model_init(jax.random.key(1), cfg.model)
        _, protos = prototypes_init(jax.random.key(2), args.nclasses)
        folds.append((params, protos))
    return folds


def cmd_frames(args):
    from sais_tpu.io.video import dump_frames
    out = os.path.join(args.path, "images", args.videoname)
    n = dump_frames(os.path.join(args.path, "videos", args.videoname + ".mp4"),
                    out)
    print(f"wrote {n} frames to {out}")


def cmd_paths(args):
    from sais_tpu.io.manifests import write_manifests
    write_manifests(args.path, [args.videoname])
    print(f"wrote manifests under {os.path.join(args.path, 'paths')}")


def _pipeline_config(args):
    import dataclasses
    from sais_tpu.config import PipelineConfig, ModelConfig
    cfg = PipelineConfig()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, modalities=args.modalities),
        compute_dtype=args.dtype)
    return cfg


def cmd_extract(args):
    from sais_tpu.infer.pipeline import FeatureExtractor
    from sais_tpu.io.feature_store import FeatureStore, rgb_store_path
    cfg = _pipeline_config(args)
    vit_params = _load_vit(args, cfg)
    fx = FeatureExtractor(vit_params, cfg, batch_size=args.batch_size)
    t0 = time.time()
    reps = fx.extract_video(
        os.path.join(args.path, "videos", args.videoname + ".mp4"))
    dt = time.time() - t0
    with FeatureStore(rgb_store_path(args.path), "a") as fs:
        fs.write_video(args.videoname, reps)
    print(f"extracted {reps.shape} in {dt:.1f}s "
          f"({reps.shape[0] / dt:.0f} frames/s)")


def cmd_flow(args):
    """RAFT flow -> flow-RGB -> DINO flow reps (reference main.sh:18+24)."""
    import jax
    from sais_tpu.infer.pipeline import FlowExtractor
    from sais_tpu.io.feature_store import FeatureStore, flow_store_path
    from sais_tpu.io.video import VideoReader
    from sais_tpu.models.raft import raft_init, raft_params_from_torch
    cfg = _pipeline_config(args)
    if args.raft_weights:
        from sais_tpu.port.torch_port import load_torch_pickle
        sd = load_torch_pickle(args.raft_weights)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        raft_params = raft_params_from_torch(sd)
    else:
        if not args.random_init:
            sys.exit("need --raft-weights or --random-init")
        raft_params = raft_init(jax.random.key(3), cfg.raft)
    vit_params = _load_vit(args, cfg)
    fx = FlowExtractor(raft_params, vit_params, cfg,
                       pair_batch=args.flow_batch)
    with VideoReader(os.path.join(args.path, "videos",
                                  args.videoname + ".mp4")) as r:
        frames = np.stack(list(r.frames()))
    t0 = time.time()
    reps, _ = fx.extract(frames)
    dt = time.time() - t0
    with FeatureStore(flow_store_path(args.path), "a") as fs:
        fs.write_video(args.videoname, reps)
    print(f"extracted flow reps {reps.shape} in {dt:.1f}s")


def cmd_decode(args):
    from sais_tpu.infer.pipeline import GestureDecoder
    from sais_tpu.io.feature_store import (FeatureStore, flow_store_path,
                                           rgb_store_path)
    cfg = _pipeline_config(args)
    folds = _load_folds(args, cfg)
    with FeatureStore(rgb_store_path(args.path)) as fs:
        rgb = fs.read_video(args.videoname)
    flow = None
    fpath = flow_store_path(args.path)
    if cfg.model.modalities != "RGB" and os.path.exists(fpath):
        with FeatureStore(fpath) as fs:
            flow = fs.read_video(args.videoname)
    dec = GestureDecoder(folds, cfg, device_batch=args.batch_size)
    df = dec.decode(args.videoname, rgb, flow)
    out = os.path.join(args.path, "results")
    os.makedirs(out, exist_ok=True)
    dest = os.path.join(out, "Custom_inference_gestures.csv")
    df.to_csv(dest)
    print(f"wrote {len(df)} gesture intervals to {dest}")


def cmd_pipeline(args):
    t0 = time.time()
    cmd_extract(args)
    if args.modalities != "RGB":
        cmd_flow(args)
    cmd_decode(args)
    print(f"total {time.time() - t0:.1f}s")


def build_parser():
    p = argparse.ArgumentParser(prog="sais")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("frames", cmd_frames), ("paths", cmd_paths),
                     ("extract", cmd_extract), ("flow", cmd_flow),
                     ("decode", cmd_decode), ("pipeline", cmd_pipeline)]:
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("-f", "--videoname", required=True)
        sp.add_argument("-p", "--path", default=".")
        sp.add_argument("--dino-weights")
        sp.add_argument("--raft-weights")
        sp.add_argument("--flow-batch", type=int, default=2)
        sp.add_argument("--params-dir")
        sp.add_argument("--random-init", action="store_true")
        sp.add_argument("--nfolds", type=int, default=1)
        sp.add_argument("--nclasses", type=int, default=2)
        sp.add_argument("-mod", "--modalities", default="RGB",
                        choices=["RGB", "Flow", "RGB-Flow"])
        sp.add_argument("-bs", "--batch-size", type=int, default=256)
        sp.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    return p


def _enable_compile_cache():
    """Opt-in persistent XLA executable cache (SAIS_TPU_CACHE=<dir>).

    Off by default: on remote-compile TPU tunnels the serialize/store
    round-trips can cost more than recompilation; enable on hosts with a
    local TPU runtime.
    """
    import jax
    cache = os.environ.get("SAIS_TPU_CACHE")
    if cache:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    args = build_parser().parse_args(argv)
    _enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
