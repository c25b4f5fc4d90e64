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


_VIT_CACHE: dict = {}


def _load_vit(args, cfg):
    """Load (and convert) the ViT weights once per process — cmd_pipeline
    otherwise unpickles and transposes the same ~80 MB checkpoint twice
    (RGB extraction + flow reps)."""
    import jax
    from sais_tpu.models.vit import vit_init
    from sais_tpu.port.torch_port import (load_torch_pickle,
                                          strip_dino_student_prefix,
                                          vit_params_from_torch)
    key = (args.dino_weights, bool(args.random_init))
    if key in _VIT_CACHE:
        return _VIT_CACHE[key]
    if args.dino_weights:
        sd = load_torch_pickle(args.dino_weights)
        if any(str(k).startswith(("student", "teacher")) for k in sd):
            sd = strip_dino_student_prefix(sd)
        params = vit_params_from_torch(sd)
    else:
        if not args.random_init:
            sys.exit("need --dino-weights or --random-init")
        params = vit_init(jax.random.key(0), cfg.vit)
    _VIT_CACHE[key] = params
    return params


def _load_raft(args, cfg):
    """RAFT weights: --raft-weights checkpoint (plain state_dict or a
    ptlflow-style {'state_dict': ...} wrapper) or --random-init.  Shared
    by cmd_flow / cmd_pipeline / cmd_serve so the unwrapping and the
    random-init guard cannot drift between entry points."""
    import jax
    from sais_tpu.models.raft import raft_init, raft_params_from_torch
    if args.raft_weights:
        from sais_tpu.port.torch_port import load_torch_pickle
        sd = load_torch_pickle(args.raft_weights)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return raft_params_from_torch(sd)
    if not args.random_init:
        # random RAFT weights would silently produce garbage flow
        sys.exit("need --raft-weights or --random-init")
    return raft_init(jax.random.key(3), cfg.raft)


def _load_folds(args, cfg) -> List[Tuple[dict, "np.ndarray"]]:
    import jax
    from sais_tpu.models.full_model import full_model_init, prototypes_init
    from sais_tpu.port.torch_port import (full_model_params_from_torch,
                                          load_torch_pickle,
                                          prototypes_from_torch)
    folds = []
    if args.params_dir:
        from sais_tpu.train.checkpoint import load_training_result
        for fold in range(args.nfolds):
            d = os.path.join(args.params_dir, f"Fold_{fold}")
            if os.path.exists(os.path.join(d, "params.pkl")):
                # natively trained fold (sais train output)
                res = load_training_result(d)
                folds.append((res["params"], res["prototypes"]))
            else:
                # reference checkpoints (params.zip + prototypes.zip)
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


def _dp_mesh(dp):
    """--data-parallel value -> data mesh: -1 (bare flag) = all devices,
    N = the first N devices."""
    import jax
    from sais_tpu.config import MeshConfig
    from sais_tpu.parallel.mesh import make_mesh
    devs = jax.devices()
    if dp > 0:
        if dp > len(devs):
            raise SystemExit(f"--data-parallel {dp} exceeds the "
                             f"{len(devs)} available devices")
        devs = devs[:dp]
    return make_mesh(MeshConfig(), devices=devs)


def _extract_mesh(args):
    """Device mesh for data-parallel extraction (--data-parallel on
    extract/flow/pipeline shards frame/pair batches over the chips)."""
    dp = getattr(args, "data_parallel", 0) or 0
    if not dp:
        return None
    return _dp_mesh(dp)


def _pipeline_config(args):
    import dataclasses
    from sais_tpu.config import PipelineConfig
    cfg = PipelineConfig()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, modalities=args.modalities),
        compute_dtype=args.dtype)
    flash = getattr(args, "flash", "auto")
    if flash != "auto":
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, temporal=dataclasses.replace(
                cfg.model.temporal, use_flash=(flash == "on"))))
    if getattr(args, "norm", "imagenet") == "half":
        # timm ViT_Supervised_ImageNet normalization (0.5/0.5 per channel,
        # extract_representations.py:152-156)
        cfg = dataclasses.replace(cfg, preprocess=dataclasses.replace(
            cfg.preprocess, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)))
    maxpos = getattr(args, "max_positions", 0) or 0
    if maxpos:
        # beyond the reference's 2000-slot pos-emb table
        # (prepare_model.py:67): full-length windows past the subsample
        # cap need a bigger table (flash/ring attention carries the
        # compute; the table size is the remaining configured limit)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, temporal=dataclasses.replace(
                cfg.model.temporal, max_positions=maxpos)))
    return cfg


def _apply_flow_jump(cfg, args, video_path: Optional[str] = None):
    """Resolve --flow-jump into cfg.window.flow_jump_factor for EVERY
    consumer (flow extraction AND decode/assess/steps/serve): extraction
    and window->flow index mapping must agree on the stride or dual-stream
    decoding silently gathers the wrong flow rows."""
    import dataclasses as dc
    if not getattr(args, "flow_jump", None):
        return cfg
    if args.flow_jump == "auto":
        if video_path is None or not os.path.exists(video_path):
            # stores-only runs (decode/steps from extracted features with
            # the .mp4 gone) get a clean exit, not a decoder traceback
            sys.exit("--flow-jump auto needs the source video to read fps "
                     f"from ({video_path or 'no path available'} not "
                     "found); pass an explicit stride")
        from sais_tpu.io.video import VideoReader
        with VideoReader(video_path) as r:
            jump = max(int(r.fps // 2), 1)
        print(f"flow jump {jump} (fps {2 * jump})")
    else:
        jump = int(args.flow_jump)
    return dc.replace(cfg, window=dc.replace(cfg.window,
                                             flow_jump_factor=jump))


def _reconcile_flow_jump(cfg, args, videoname: str):
    """Adopt or validate the flow-pair stride recorded by extraction.

    The flow store's rows are indexed frame//jump AT THE EXTRACTION
    stride; decoding with a different cfg stride silently gathers the
    wrong flow rows (half misaligned, half out of range).  `sais flow`
    records its stride as a per-video H5 attr; here, consumers that map
    window frames to flow rows (decode/assess/steps) adopt it when the
    user gave no --flow-jump, and refuse a contradicting explicit one."""
    from sais_tpu.io.feature_store import FeatureStore, flow_store_path
    if cfg.model.modalities == "RGB":
        return cfg
    path = flow_store_path(args.path)
    if not os.path.exists(path):
        return cfg
    with FeatureStore(path) as fs:
        stored = fs.video_attr(videoname, "flow_jump")
    if stored is None:      # store predates the attr — trust the flags
        return cfg
    stored = int(stored)
    if cfg.window.flow_jump_factor == stored:
        args.flow_jump = str(stored)   # pin: consumers with their own
        # stride fallbacks (assess's per-phase tables) must use the
        # extraction stride, exactly as if the user passed it
        return cfg
    if getattr(args, "flow_jump", None):
        sys.exit(f"--flow-jump {cfg.window.flow_jump_factor} contradicts "
                 f"the stride {videoname}'s flow reps were extracted at "
                 f"({stored}); re-extract with `sais flow --force "
                 f"--flow-jump {cfg.window.flow_jump_factor}` or pass "
                 f"--flow-jump {stored}")
    print(f"flow jump {stored} (recorded by extraction)")
    args.flow_jump = str(stored)       # pin (see above)
    import dataclasses as dc
    return dc.replace(cfg, window=dc.replace(cfg.window,
                                             flow_jump_factor=stored))


def _already_extracted(store_path: str, videoname: str) -> bool:
    """Idempotent skip-existing (the reference skips videos whose flow dir
    already exists, extract_representations.py:485)."""
    from sais_tpu.io.feature_store import FeatureStore
    if not os.path.exists(store_path):
        return False
    with FeatureStore(store_path) as fs:
        return videoname in fs.videos()


def cmd_extract(args):
    from sais_tpu.infer.pipeline import FeatureExtractor
    from sais_tpu.io.feature_store import FeatureStore, rgb_store_path
    cfg = _pipeline_config(args)
    if not args.force and _already_extracted(rgb_store_path(args.path),
                                             args.videoname):
        print(f"{args.videoname}: reps exist, skipping (--force to redo)")
        return
    vit_params = _load_vit(args, cfg)
    fx = FeatureExtractor(vit_params, cfg, batch_size=args.batch_size,
                          exact_preprocess=args.exact_preprocess,
                          mesh=_extract_mesh(args))
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
    from sais_tpu.infer.pipeline import FlowExtractor
    from sais_tpu.io.feature_store import FeatureStore, flow_store_path
    cfg = _pipeline_config(args)
    if not args.force and _already_extracted(flow_store_path(args.path),
                                             args.videoname):
        print(f"{args.videoname}: flow reps exist, skipping (--force to redo)")
        return
    raft_params = _load_raft(args, cfg)
    vit_params = _load_vit(args, cfg)
    video_path = os.path.join(args.path, "videos", args.videoname + ".mp4")
    # per-video jump = fps // 2, the reference's per-video fps tables
    # (extract_representations.py:437-463, 484-494) read from the container
    cfg = _apply_flow_jump(cfg, args, video_path)
    fx = FlowExtractor(raft_params, vit_params, cfg,
                       pair_batch=args.flow_batch,
                       iters=args.flow_iters,
                       mesh=_extract_mesh(args))
    t0 = time.time()
    # streaming: decode/RAFT/ViT pipelined, O(batch) host residency
    # (a multi-hour case would not fit in RAM as a frame stack)
    save_dir = (os.path.join(args.path, "flows", args.videoname)
                if args.save_flows else None)
    reps = fx.extract_video(video_path, save_flow_dir=save_dir)
    dt = time.time() - t0
    with FeatureStore(flow_store_path(args.path), "a") as fs:
        # record the stride the pairs were built at: decode/assess/steps
        # adopt (or validate against) it instead of trusting the user to
        # re-pass the same --flow-jump months later
        fs.write_video(args.videoname, reps,
                       attrs={"flow_jump": cfg.window.flow_jump_factor})
    print(f"extracted flow reps {reps.shape} in {dt:.1f}s")


def _seq_mesh_from_args(args, with_data: bool = False):
    """--seq-parallel N -> an N-device ('data','seq') mesh, or None.

    with_data (train only): combine with --data-parallel into one
    (n_data, n_seq) mesh — batches shard over 'data', each window's time
    axis over 'seq' (`sais train --seq-parallel 4 --data-parallel 2` on a
    v5e-8).  Bare --data-parallel means "all remaining devices"."""
    n = getattr(args, "seq_parallel", 0) or 0
    if n <= 0:
        return None
    import jax
    from sais_tpu.parallel.sequence import seq_mesh
    devs = jax.devices()
    n_data = 1
    if with_data:
        dp = getattr(args, "data_parallel", 0) or 0
        if dp:
            n_data = dp if dp > 0 else max(len(devs) // n, 1)
    if n * n_data > len(devs):
        raise SystemExit(
            f"--seq-parallel {n} x --data-parallel {n_data} exceeds the "
            f"{len(devs)} available devices")
    return seq_mesh(n, n_data=n_data, devices=devs[:n * n_data])


def cmd_decode(args):
    from sais_tpu.infer.pipeline import GestureDecoder
    from sais_tpu.io.feature_store import (FeatureStore, flow_store_path,
                                           rgb_store_path)
    cfg = _pipeline_config(args)
    cfg = _apply_flow_jump(cfg, args, os.path.join(
        args.path, "videos", args.videoname + ".mp4"))
    cfg = _reconcile_flow_jump(cfg, args, args.videoname)
    folds = _load_folds(args, cfg)
    with FeatureStore(rgb_store_path(args.path)) as fs:
        rgb = fs.read_video(args.videoname)
    flow = None
    fpath = flow_store_path(args.path)
    if cfg.model.modalities != "RGB" and os.path.exists(fpath):
        with FeatureStore(fpath) as fs:
            flow = fs.read_video(args.videoname)
    dec = GestureDecoder(folds, cfg, device_batch=args.batch_size,
                         seq_mesh=_seq_mesh_from_args(args))
    df = dec.decode(args.videoname, rgb, flow)
    out = os.path.join(args.path, "results")
    os.makedirs(out, exist_ok=True)
    dest = os.path.join(out, "Custom_inference_gestures.csv")
    df.to_csv(dest)
    print(f"wrote {len(df)} gesture intervals to {dest}")
    if args.save_artifacts:
        # reps_and_labels_<phase> / attention_<phase> (train.py:113-119)
        from sais_tpu.train.checkpoint import save_inference_artifacts
        art = dec.inference_artifacts(args.videoname, rgb, flow)
        save_inference_artifacts(
            os.path.join(args.path, "params", "Fold_0"), "Custom_inference",
            {"reps": art["reps"], "probs": art["probs"],
             "videonames": art["videonames"]},
            attention=art["attention"])
        print("wrote inference artifacts under params/Fold_0")


def cmd_assess(args):
    """Skill assessment over annotated stitch segments (-f video):
    EASE-domain probabilities + frame-importance + CLS attention, exported
    in the reference's inference-artifact layout (train.py:113-121)."""
    import pandas as pd
    from sais_tpu.infer.skill import SkillAssessor
    from sais_tpu.io.feature_store import (FeatureStore, flow_store_path,
                                           rgb_store_path)
    from sais_tpu.train.checkpoint import save_inference_artifacts

    cfg = _pipeline_config(args)
    cfg = _apply_flow_jump(cfg, args, os.path.join(
        args.path, "videos", args.videoname + ".mp4"))
    cfg = _reconcile_flow_jump(cfg, args, args.videoname)
    import dataclasses as dc
    cfg = dc.replace(cfg, model=dc.replace(
        cfg.model, importance_head=True, nclasses=args.nclasses))
    folds = _load_folds(args, cfg)
    segments = pd.read_csv(args.segments)
    if "Video" not in segments.columns and "Path" in segments.columns:
        segments["Video"] = segments["Path"].apply(
            lambda pth: pth.split("\\")[-1] if "\\" in pth
            else pth.split("/")[-1])
    from sais_tpu.data.skill import (EASE_INFERENCE_PHASES,
                                     ease_inference_table)
    if (args.phase in EASE_INFERENCE_PHASES
            and {"RACE", "EASE", "maj"} <= set(segments.columns)):
        # reference phase-table selection for cross-hospital inference
        # (prepare_dataset.py:304-380): RACE/EASE filter, maj remap, and
        # the phase's sampling/balancing — applied over the WHOLE stitch
        # CSV (the per-video sampling depends on every video's rows)
        # before restricting to this video
        segments = ease_inference_table(segments, args.phase, args.domain)
    rows = segments[segments["Video"].astype(str) == args.videoname]
    if not len(rows):
        sys.exit(f"no segments for video {args.videoname} in "
                 f"{args.segments}")
    if "StartFrame" not in rows.columns:
        # stitch-schema CSV (per-RACE frame columns): derive the
        # race-specific windows exactly like the reference
        # (getStartAndEndFrame; data/reference_datasets.vua_ease_window)
        from sais_tpu.data.reference_datasets import vua_ease_window
        rows = rows.copy()
        se = rows.apply(lambda r: pd.Series(vua_ease_window(r["RACE"], r)),
                        axis=1)
        rows[["StartFrame", "EndFrame"]] = se.to_numpy()
    with FeatureStore(rgb_store_path(args.path)) as fs:
        rgb = fs.read_video(args.videoname)
    flow = None
    if cfg.model.modalities != "RGB":
        with FeatureStore(flow_store_path(args.path)) as fs:
            flow = fs.read_video(args.videoname)
    assessor = None
    for fold, (params, protos) in enumerate(folds):
        if assessor is None:   # one jit cache across folds (set_fold)
            assessor = SkillAssessor(params, protos, cfg)
        else:
            assessor.set_fold(params, protos)
        art = assessor.assess_segments(
            rgb, flow, rows, phase=args.phase, videoname=args.videoname,
            # reference flow-jump selection per phase unless the user
            # explicitly overrode the stride
            flow_jump=(cfg.window.flow_jump_factor if args.flow_jump
                       else None))
        savepath = os.path.join(args.path, "params", f"Fold_{fold}")
        save_inference_artifacts(
            savepath, args.phase,
            {"reps": art["reps"], "probs": art["probs"],
             "videonames": [args.videoname] * len(rows)},
            attention=art["attention"],
            importance=art["importance"] or None)
        import numpy as _np
        mean_probs = _np.mean(
            [_np.stack(art["probs"][t]) for t in sorted(art["probs"])],
            axis=0)
        out = rows.copy()
        for c in range(mean_probs.shape[1]):
            out[f"prob_{c}"] = mean_probs[:, c]
        dest = os.path.join(args.path, "results",
                            f"{args.videoname}_skill_fold{fold}.csv")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        out.to_csv(dest)
        print(f"fold {fold}: wrote {dest} + artifacts under {savepath}")


def cmd_steps(args):
    """Sub-phase (step) recognition over a full-length video: 10 s / 5 s
    sliding windows (prepare_dataset.py:459-486), fold-ensembled."""
    from sais_tpu.data.tasks import step_window_config
    from sais_tpu.infer.pipeline import GestureDecoder
    from sais_tpu.infer.skill import StepRecognizer
    from sais_tpu.io.feature_store import (FeatureStore, flow_store_path,
                                           rgb_store_path)

    cfg = _pipeline_config(args)
    import dataclasses as dc
    cfg = dc.replace(cfg, window=step_window_config(args.fps),
                     model=dc.replace(cfg.model, nclasses=3))
    if args.stride_divisor:
        cfg = dc.replace(cfg, window=dc.replace(
            cfg.window, stride_divisor=args.stride_divisor))
    # 'auto' reads fps from the video container, same as decode/assess
    cfg = _apply_flow_jump(cfg, args, os.path.join(
        args.path, "videos", args.videoname + ".mp4"))
    cfg = _reconcile_flow_jump(cfg, args, args.videoname)
    args.nclasses = 3          # random-init prototypes must match the 3
    folds = _load_folds(args, cfg)  # step classes (NH/ND/NW)
    with FeatureStore(rgb_store_path(args.path)) as fs:
        rgb = fs.read_video(args.videoname)
    flow = None
    if cfg.model.modalities != "RGB":
        with FeatureStore(flow_store_path(args.path)) as fs:
            flow = fs.read_video(args.videoname)
    dec = GestureDecoder(folds, cfg, seq_mesh=_seq_mesh_from_args(args))
    rec = StepRecognizer(dec, fps=args.fps)
    df = rec.recognize(args.videoname, rgb, flow)
    dest = os.path.join(args.path, "results",
                        f"{args.videoname}_steps.csv")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    df.to_csv(dest)
    print(f"wrote {len(df)} step windows to {dest}")


def cmd_train(args):
    """Fold-driver training (run_experiments.py:85-116 semantics): iterate
    domains x folds, split/balance per fold, train with early stopping,
    save params/[domain/]Fold_<k>."""
    if getattr(args, "domains", None):
        # reference -domains loop (run_experiments.py:44,85-90): one
        # invocation trains every domain; artifacts nest per domain
        import copy
        for dom in args.domains:
            print(f"Domain: {dom}")
            sub = copy.copy(args)
            sub.domains = None
            sub.domain = dom
            sub.params_subdir = dom if len(args.domains) > 1 else None
            cmd_train(sub)
        return
    import jax
    import pandas as pd
    from sais_tpu.data.collate import segment_batches
    from sais_tpu.data.datasets import build_segment_dataset
    from sais_tpu.io.feature_store import (FeatureStore, flow_store_path,
                                           rgb_store_path)
    from sais_tpu.models.full_model import full_model_init, prototypes_init
    from sais_tpu.parallel.mesh import make_mesh
    from sais_tpu.train.checkpoint import save_training_result
    from sais_tpu.train.loop import PrototypeTrainer
    from sais_tpu.config import MeshConfig, TrainConfig

    cfg = _pipeline_config(args)
    segments = pd.read_csv(args.segments)
    use_flow = cfg.model.modalities != "RGB"
    if args.data_type == "raw":
        rgb_store = flow_store = None  # raw mode reads JPEG frame dirs
    else:
        rgb_store = FeatureStore(rgb_store_path(args.path))
        flow_store = (FeatureStore(flow_store_path(args.path))
                      if use_flow else None)
    if args.init_distributed:
        # multi-process launch (one process per host/slice): the NCCL
        # process-group equivalent, auto-detected on TPU pods
        from sais_tpu.parallel.distributed import initialize
        initialize()
    seq_n = getattr(args, "seq_parallel", 0) or 0
    if args.num_slices > 1:
        from sais_tpu.parallel.distributed import multislice_mesh
        mesh = multislice_mesh(args.num_slices)
    elif args.data_parallel and not seq_n:
        mesh = _dp_mesh(args.data_parallel)
    else:
        # with --seq-parallel, --data-parallel folds into the seq mesh's
        # 'data' axis (one mesh owns the devices; see _seq_mesh_from_args)
        mesh = None

    skill_mode = args.dataset == "vua-ease"
    stitch_mode = args.dataset == "vua-ease-stitch"
    if args.training_fraction < 1 and not stitch_mode:
        sys.exit("-tf only applies to --dataset vua-ease-stitch (and the "
                 "library-level NS_vs_VUA tables): the reference subsamples "
                 "the train split only in those branches "
                 "(prepare_dataset.py:549, :703)")
    explanations = None
    if args.importance_loss:
        if not skill_mode:
            sys.exit("--importance-loss requires --dataset vua-ease "
                     "(explanations are EASE stitch annotations)")
        if not args.explanations:
            sys.exit("--importance-loss needs --explanations <csv> [...]")
        explanations = [pd.read_csv(p) for p in args.explanations]

    for fold in range(args.nfolds):
        print(f"Fold: {fold}")
        if skill_mode:
            # VUA_EASE skill branch (prepare_dataset.py:63-426): RACE/EASE
            # filters, 0.9/0.1 fold split, explanation-derived importance
            from sais_tpu.data.skill import build_ease_dataset
            from sais_tpu.data.datasets import SegmentDataset
            meta = None
            if args.balance_groups and args.single_group:
                sys.exit("-bg and -sg are mutually exclusive "
                         "(prepare_dataset.py:281-287 asserts this)")
            if (args.balance_groups or args.single_group) \
                    and not args.balance_classes:
                sys.exit("-bg/-sg require -bc: the reference applies group "
                         "balancing/restriction only inside the "
                         "balance==True branch (prepare_dataset.py:281-291)")
            if args.balance_groups or args.single_group:
                from sais_tpu.data.reference_datasets import prepare_usc_meta
                if not args.meta:
                    sys.exit("--balance-groups/--single-group need "
                             "--meta <csv>")
                meta = prepare_usc_meta(pd.read_csv(args.meta))
            use_group = args.balance_groups or args.single_group
            frames, classes = build_ease_dataset(
                segments, args.domain, fold,
                balance=args.balance_classes,
                explanations=explanations,
                importance_loss=args.importance_loss,
                meta=meta, group=args.group if use_group else None,
                group_val=args.single_group)
            ds = SegmentDataset(frames, [str(c) for c in classes])
            ds.skill_classes = classes
        elif stitch_mode:
            # VUA_EASE_Stitch sub-phase recognition branch
            # (prepare_dataset.py:428-568): same annotations, label = EASE
            # domain (NH vs ND vs NW)
            from sais_tpu.data.datasets import SegmentDataset
            from sais_tpu.data.reference_datasets import stitch_phase_tables
            frames, classes = stitch_phase_tables(
                segments, fold, training_fraction=args.training_fraction)
            ds = SegmentDataset(frames, list(classes))
            ds.skill_classes = classes
        elif args.dataset in ("vua-gestures", "dvc-ucl"):
            # gesture-timestamp classification branches
            # (prepare_dataset.py:1283-1395, :1396-1500)
            from sais_tpu.data.datasets import SegmentDataset
            from sais_tpu.data.reference_datasets import (dvc_ucl_tables,
                                                          vua_gestures_tables)
            if args.dataset == "vua-gestures":
                frames, classes = vua_gestures_tables(
                    segments, args.domain if "_vs_" in args.domain
                    else "Top4", fold, balance=args.balance_classes)
            else:
                frames, classes = dvc_ucl_tables(
                    segments, fold, balance=args.balance_classes)
            frames = {ph: frames[ph] for ph in ("train", "val", "test")}
            for ph in frames:
                frames[ph] = frames[ph].copy()
                frames[ph]["Gesture"] = frames[ph]["Gesture"].astype(str)
            ds = SegmentDataset(frames, [str(c) for c in classes])
        elif args.split_policy == "fold-video":
            ds = build_segment_dataset(segments, fold,
                                       balance=args.balance_classes)
        else:
            # named reference split policies (data/reference_datasets.py)
            from sais_tpu.data.datasets import SegmentDataset
            from sais_tpu.data.reference_datasets import (
                instance_split, leave_one_user_out_split,
                per_gesture_video_split)
            classes = sorted(segments["Gesture"].unique().tolist())
            if args.split_policy == "per-gesture-video":
                tr, va, te = per_gesture_video_split(
                    segments, fold, balance=args.balance_classes)
            elif args.split_policy == "louo":
                tr, va, te = leave_one_user_out_split(segments, fold)
            elif args.split_policy == "instance":
                tr, va, te = instance_split(segments,
                                            balance=args.balance_classes)
            ds = SegmentDataset({"train": tr.reset_index(drop=True),
                                 "val": va.reset_index(drop=True),
                                 "test": te.reset_index(drop=True)}, classes)
        nclasses = len(ds.classes)
        # multi-task '+' domains double the label space (+2 offset for the
        # second domain, prepare_dataset.py:2156-2158)
        if skill_mode and "+" in args.domain:
            nclasses *= 2
        import dataclasses as dc
        mcfg = dc.replace(cfg.model, nclasses=nclasses,
                          importance_head=(cfg.model.importance_head
                                           or args.importance_loss),
                          multi_task=(skill_mode and "+" in args.domain),
                          self_attention=not args.no_self_attention)
        if args.rep_dim:
            mcfg = dc.replace(
                mcfg, rep_dim=args.rep_dim,
                temporal=dc.replace(mcfg.temporal, rep_dim=args.rep_dim))
        params = full_model_init(jax.random.fold_in(jax.random.key(0), fold),
                                 mcfg)
        keys, protos = prototypes_init(
            jax.random.fold_in(jax.random.key(1), fold), nclasses)
        tcfg = TrainConfig(lr=args.lr, nepochs=args.nepochs,
                           batch_size=args.batch_size,
                           importance_loss=args.importance_loss)
        raw_mode = args.data_type == "raw"
        if raw_mode:
            # raw-video training (prepare_dataset.py:1795-1990): frozen
            # encoder over 16-frame JPEG snippets + cls_head
            if not skill_mode:
                sys.exit("--data-type raw requires --dataset vua-ease")
            from sais_tpu.train.classification import RawClassificationTrainer
            mcfg = dc.replace(mcfg, data_type="raw",
                              rep_dim=512 if args.encoder == "R3D"
                              else cfg.model.rep_dim)
            params = full_model_init(
                jax.random.fold_in(jax.random.key(0), fold), mcfg)
            if args.encoder == "R3D":
                from sais_tpu.models.r3d import r3d18_init
                enc_params = r3d18_init(jax.random.key(5))
                vit_cfg = None
            else:
                from sais_tpu.models.vit import vit_init
                enc_params = vit_init(jax.random.key(5), cfg.vit)
                vit_cfg = cfg.vit
            trainer = RawClassificationTrainer(
                mcfg, tcfg, params, enc_params, encoder_type=args.encoder,
                mesh=mesh, vit_cfg=vit_cfg,
                freeze_encoder=not args.unfreeze_encoder)
        elif args.task == "Prototypes":
            trainer = PrototypeTrainer(
                mcfg, tcfg, params, keys, protos, mesh=mesh,
                seq_mesh=_seq_mesh_from_args(args, with_data=True))
        else:
            from sais_tpu.train.classification import ClassificationTrainer
            trainer = ClassificationTrainer(mcfg, tcfg, params,
                                            task=args.task, mesh=mesh)

        def loader(phase, shuffle):
            # factories take the epoch index: per-epoch reshuffle seed
            # (the reference DataLoader reshuffles every epoch)
            rows = ds.frames[phase]
            tta = phase in ("val", "test")  # 3-way eval TTA
            if raw_mode:
                from sais_tpu.data.raw import jpeg_frame_source, raw_batches
                src = jpeg_frame_source(args.path, dataset="VUA")
                return lambda epoch=0: raw_batches(
                    rows, src, ds.skill_classes, args.domain, phase,
                    args.batch_size, shuffle, width=args.raw_width,
                    encoder_type=args.encoder, tta=tta, seed=epoch,
                    # dual-stream raw: the reference loader always pairs
                    # RGB with flow JPEGs (prepare_dataset.py raw branch)
                    use_flow=use_flow)
            if skill_mode:
                from sais_tpu.data.skill import skill_batches
                return lambda epoch=0: skill_batches(
                    rows, rgb_store, flow_store, ds.skill_classes,
                    args.domain, phase, args.batch_size, shuffle,
                    importance_loss=args.importance_loss, tta=tta,
                    seed=epoch)
            if stitch_mode:
                from sais_tpu.data.skill import skill_batches
                classes_ = list(ds.skill_classes)
                return lambda epoch=0: skill_batches(
                    rows, rgb_store, flow_store, classes_,
                    "NH_vs_ND_vs_NW", phase, args.batch_size, shuffle,
                    tta=tta, seed=epoch,
                    label_fn=lambda row: classes_.index(row["EASE"]),
                    branch="stitch")
            return lambda epoch=0: segment_batches(
                rows, rgb_store, flow_store, ds.classes, cfg.window,
                args.batch_size, shuffle, seed=epoch, use_flow=use_flow,
                tta=tta)

        loaders = {ph: loader(ph, ph == "train")
                   for ph in ("train", "val", "test")
                   if len(ds.frames.get(ph, []))}
        subdir = getattr(args, "params_subdir", None)
        savepath = os.path.join(args.path, "params",
                                *((subdir,) if subdir else ()),
                                f"Fold_{fold}")
        if args.task == "Prototypes" and not raw_mode:
            result = trainer.fit(loaders, nepochs=args.nepochs)
            save_training_result(savepath, result)
            print(f"saved fold {fold} (best epoch {result['best_epoch']}) "
                  f"to {savepath}")
        else:
            from sais_tpu.train.metrics import format_metrics
            for epoch in range(args.nepochs):
                for phase, make in loaders.items():
                    _, m = trainer.run_epoch(make(epoch), phase == "train")
                    print(format_metrics(phase, m))
            save_training_result(savepath, {"model": trainer.params,
                                            "prototypes": protos})
            print(f"saved fold {fold} to {savepath}")
    if rgb_store is not None:
        rgb_store.close()
    if flow_store is not None:
        flow_store.close()


def cmd_pretrain(args):
    """DINO self-supervised pre-training over surgical video frames
    (reference dino-main/main_dino.py train path, VUA fine-tuning recipe).

    Frames stream from every mp4 under <root>/videos; augmentation is the
    on-device multi-crop pipeline; checkpoints resume transparently.
    """
    import glob
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sais_tpu.io.video import VideoReader
    from sais_tpu.ops.augment import multi_crop_batch
    from sais_tpu.train.checkpoint import CheckpointManager
    from sais_tpu.train.dino import DINOConfig, DINOTrainer
    from sais_tpu.utils.logging import MetricLogger

    if args.source == "flows":
        # pretrain on rendered optical-flow images, the reference's
        # --optical_flow_to_reps mode (main_dino.py:254-257 loads
        # <ds>_FlowPaths.csv and reads the flows_%08d.jpg renders)
        videos = sorted(d for d in glob.glob(
            os.path.join(args.path, "flows", "*")) if os.path.isdir(d))
        if not videos:
            sys.exit(f"no flow dirs under {os.path.join(args.path, 'flows')}")
    else:
        videos = sorted(glob.glob(os.path.join(args.path, "videos", "*.mp4")))
        if not videos:
            sys.exit(f"no videos under {os.path.join(args.path, 'videos')}")

    bs = args.batch_size
    dcfg = DINOConfig(out_dim=args.out_dim, epochs=args.nepochs,
                      batch_size=bs, n_local_crops=args.local_crops,
                      warmup_epochs=min(10, max(args.nepochs // 10, 0)),
                      drop_path_rate=args.drop_path,
                      use_bn_in_head=args.use_bn_in_head)

    def _frame_count(v):
        if args.source == "flows":
            return len(glob.glob(os.path.join(v, "*.jpg")))
        with VideoReader(v) as r:   # release the capture: summing over
            return r.frame_count    # hundreds of mp4s would pile up FDs

    def _source(v):
        """Sequential frame iterator for one video / frame dir."""
        if args.source == "flows":
            from sais_tpu.io.video import read_frame_dir

            def it():
                yield from read_frame_dir(v)   # skips corrupt, RGB order
        else:
            def it():
                with VideoReader(v) as r:
                    yield from r.frames()
        return it

    # rough steps/epoch from total frame count
    total = sum(_frame_count(v) for v in videos)
    niter = max(total // bs, 1)
    mesh = None
    if args.data_parallel:
        mesh = _dp_mesh(args.data_parallel)
        ndev = mesh.devices.size
        if bs % ndev:
            # fail at the CLI instead of a mid-epoch shard error: every
            # loader batch is exactly -bs frames and must split evenly
            sys.exit(f"-bs {bs} does not divide over the {ndev}-device "
                     f"mesh; use a multiple of {ndev}")
    from sais_tpu.models import zoo
    vit_cfg = zoo.config(args.arch)
    trainer = DINOTrainer(vit_cfg, dcfg, niter_per_ep=niter,
                          key=jax.random.key(0), optimizer=args.optimizer,
                          mesh=mesh)
    outdir = os.path.join(args.path, "pretrain")
    mgr = CheckpointManager(os.path.join(outdir, "ckpt"))
    start_epoch, state = mgr.restore_latest(trainer.state())
    if start_epoch is not None:
        trainer.load_state(state)
        print(f"resumed from epoch {start_epoch}")
    log_path = os.path.join(outdir, "log.txt")

    from sais_tpu.io.shuffle_stream import FrameShuffleStream
    from sais_tpu.ops.augment import center_border_crop
    hf, wf = (0.8, 0.7) if args.crop_policy == "gronau" else (0.8, 0.8)
    aug = jax.jit(lambda k, x: multi_crop_batch(
        k, x, dcfg.n_global_crops, dcfg.n_local_crops,
        dcfg.global_size, dcfg.local_size))

    def _border(frame):
        # SurgDataset border removal, on the loader thread (pure slicing)
        return center_border_crop(frame[None], hf, wf, args.trim_right)[0]

    for epoch in range((start_epoch or 0), args.nepochs):
        # fresh meters per epoch (main_dino builds a new MetricLogger each
        # epoch; cumulative averages would flatten the loss curve)
        logger = MetricLogger(jsonl_path=log_path)
        pending = None   # one step in flight: fetch step k-1's loss while
        # globally shuffled batches, threads decoding in parallel — the
        # reference's shuffle=True / num_workers=10 loader semantics
        # (main_dino.py:351-359); per-epoch seed = per-epoch reshuffle
        stream = FrameShuffleStream(
            [_source(v) for v in videos], bs,
            buffer_frames=args.shuffle_buffer,
            workers=args.loader_threads, seed=epoch, transform=_border)
        with stream:   # step k computes while workers decode ahead
            for bi, batch in enumerate(stream.batches(drop_last=True)):
                key = jax.random.key(hash((epoch, bi)) % (2 ** 31))
                g, l = aug(key, jnp.asarray(batch, jnp.float32) / 255.0)
                loss_dev = trainer.step_async(g, l)
                if pending is not None:
                    logger.update(loss=trainer.check_loss(pending))
                pending = loss_dev
        if pending is not None:
            logger.update(loss=trainer.check_loss(pending))
        mgr.save(epoch + 1, trainer.state())
        logger.write_epoch(epoch)
        print(f"epoch {epoch}: loss {logger.meters['loss'].global_avg:.4f}")
    print(f"pretraining done; checkpoints in {outdir}")


def cmd_pipeline(args):
    t0 = time.time()
    cmd_extract(args)
    if args.modalities != "RGB":
        cmd_flow(args)
    cmd_decode(args)
    print(f"total {time.time() - t0:.1f}s")


def cmd_serve(args):
    """Long-lived decode daemon (see cli/serve.py): compile once, answer
    {"video": name} requests over a Unix socket."""
    from sais_tpu.cli.serve import DecodeService, serve
    cfg = _pipeline_config(args)
    if args.flow_jump == "auto":
        sys.exit("sais serve decodes many videos with one compiled window "
                 "config; pass an explicit --flow-jump stride (the daemon "
                 "extracts flow per request at that same stride, so "
                 "pairing and window mapping always agree — but per-video "
                 "fps//2 parity needs one daemon per fps group)")
    cfg = _apply_flow_jump(cfg, args)
    vit_params = _load_vit(args, cfg)
    folds = _load_folds(args, cfg)
    raft_params = (None if cfg.model.modalities == "RGB"
                   else _load_raft(args, cfg))
    svc = DecodeService(args.path, cfg, vit_params, folds, raft_params,
                        batch_size=args.batch_size,
                        exact_preprocess=args.exact_preprocess,
                        pair_batch=args.flow_batch,
                        flow_iters=args.flow_iters,
                        mesh=_extract_mesh(args))
    print("warming up (compiling)...")
    svc.warmup()
    if getattr(args, "flow_warmup", None):
        # one or more HxW resolutions (comma-separated): a deployment
        # serving several camera formats pre-compiles each fused flow
        # program instead of paying the first request's compile per format
        for res in args.flow_warmup.split(","):
            h, w = (int(x) for x in res.strip().split("x"))
            print(f"pre-compiling flow path for {h}x{w}...")
            svc.warmup_flow(h, w)
    serve(svc, args.socket)


def cmd_request(args):
    """Client for a running `sais serve` daemon."""
    import json as _json
    from sais_tpu.cli.serve import request
    if not args.rpc and not args.videoname:
        sys.exit("sais request: -f <videoname> or --rpc <cmd> is required")
    payload = ({"cmd": args.rpc} if args.rpc
               else {"video": args.videoname,
                     "flow": args.modalities != "RGB"})
    print(_json.dumps(request(args.socket, payload)))


def cmd_eval(args):
    """Encoder probes over stored features: weighted k-NN + linear probe
    (reference eval_knn.py / eval_linear.py).  Labels come from a CSV with
    Video,Label columns; features from the RGB store."""
    import numpy as np
    import pandas as pd
    from sais_tpu.eval.probes import knn_classifier, train_linear_probe
    from sais_tpu.io.feature_store import FeatureStore, rgb_store_path
    labels_df = pd.read_csv(args.segments)  # Video,Label per-frame-range
    # video-level fold split: temporally adjacent frames of one video must
    # not straddle train/test (an index-parity split leaks near-duplicate
    # frames and makes k-NN numbers meaningless)
    from sais_tpu.data.datasets import fold_video_split
    train_v, val_v, test_v = fold_video_split(
        labels_df["Video"].unique().tolist(), fold=0)
    train_v = set(train_v) | set(val_v)
    feats, labels, is_train = [], [], []
    with FeatureStore(rgb_store_path(args.path)) as fs:
        for _, row in labels_df.iterrows():
            reps = fs.read_video(row["Video"])
            s, e = int(row.get("StartFrame", 0)), int(
                row.get("EndFrame", len(reps)))
            # clamp to the stored rep count: frame-count drift otherwise
            # misaligns feats with labels/is_train and crashes the probes
            s = max(0, min(s, len(reps)))
            e = max(s, min(e, len(reps)))
            if e == s:
                continue
            feats.append(reps[s:e])
            labels.append(np.full(e - s, row["Label"]))
            is_train.append(np.full(e - s, row["Video"] in train_v))
    feats = np.concatenate(feats)
    names = sorted(set(np.concatenate(labels).tolist()))
    y = np.asarray([names.index(v) for v in np.concatenate(labels)])
    tr = np.concatenate(is_train)
    if tr.all() or not tr.any():
        sys.exit("eval needs labels from at least two videos so train and "
                 "test can hold disjoint videos")
    top1, top5 = knn_classifier(feats[tr], y[tr], feats[~tr], y[~tr], k=20)
    lin = train_linear_probe(feats[tr], y[tr], feats[~tr], y[~tr],
                             num_classes=len(names), epochs=10)
    print(f"knn top1 {top1:.2f} top5 {top5:.2f} | linear top1 "
          f"{lin['top1']:.2f}")


def cmd_port(args):
    """Convert checkpoints between reference torch naming and native pkl.

    --params-dir with params.zip/prototypes.zip -> params.pkl/prototypes.pkl
    (and the reverse when only .pkl files exist).

    --verify CKPT --kind vit|raft|full: load + convert a REAL reference
    checkpoint, run a fixed probe batch, and assert <=1e-3 agreement with
    the committed golden digest (port/golden/<kind>.npz) — the one-file-
    drop evidence path for pretrained-weight numerics.  --record CKPT
    writes the digest instead (run once where the verified checkpoint
    exists).  See sais_tpu/port/verify.py.
    """
    if getattr(args, "record_all", None):
        # one-command golden-digest recipe (VERDICT r4 #7): point at a
        # directory holding any of the three published artifacts and
        # record every digest in one run; missing kinds print their
        # published origin so the operator knows what to fetch.
        from sais_tpu.port import verify as verify_lib
        found = verify_lib.discover_checkpoints(args.record_all)
        if not found:
            sys.exit(f"no checkpoints discovered under {args.record_all}; "
                     "expected dino_deitsmall16_pretrain.pth, a "
                     "*raft*.ckpt, and/or Fold_*/params.zip")
        for kind in ("vit", "raft", "full"):
            if kind in found:
                dest = verify_lib.record(found[kind], kind,
                                         golden_dir=args.golden_dir)
                sha = verify_lib.file_sha256(found[kind])[:16]
                print(f"{kind}: recorded {dest} from {found[kind]} "
                      f"(sha256 {sha}…)")
            else:
                print(f"{kind}: NOT FOUND — fetch from "
                      f"{verify_lib.CHECKPOINT_URLS[kind]}")
        print("commit the recorded .npz digests; `sais port --verify "
              "<ckpt> --kind <kind>` then asserts <=1e-3 agreement "
              "anywhere")
        return
    if args.verify or args.record:
        from sais_tpu.port import verify as verify_lib
        ckpt = args.verify or args.record
        if not args.kind:
            sys.exit("sais port --verify/--record needs --kind "
                     "{vit,raft,full}")
        if args.record:
            dest = verify_lib.record(ckpt, args.kind,
                                     golden_dir=args.golden_dir)
            print(f"recorded golden digest {dest} "
                  f"(sha256 {verify_lib.file_sha256(ckpt)[:16]}…)")
        else:
            errs = verify_lib.verify(ckpt, args.kind,
                                     golden_dir=args.golden_dir)
            for name, err in errs.items():
                print(f"{args.kind}/{name}: max|Δ| = {err:.3e} "
                      f"(tol {verify_lib.ATOL})")
            print(f"port verified: {ckpt}")
        return
    import pickle
    import jax
    import numpy as np
    from sais_tpu.port.torch_port import (full_model_params_from_torch,
                                          load_torch_pickle,
                                          prototypes_from_torch)
    from sais_tpu.train.checkpoint import (export_torch_prototypes,
                                           export_torch_state_dict,
                                           load_training_result)
    d = args.params_dir
    if not any(os.path.exists(os.path.join(d, f))
               for f in ("params.zip", "params.pkl")):
        d = os.path.join(d, "Fold_0")
    if os.path.exists(os.path.join(d, "params.zip")):
        params = full_model_params_from_torch(
            load_torch_pickle(os.path.join(d, "params.zip")))
        keys, protos = prototypes_from_torch(
            load_torch_pickle(os.path.join(d, "prototypes.zip")))
        with open(os.path.join(d, "params.pkl"), "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, params), f)
        with open(os.path.join(d, "prototypes.pkl"), "wb") as f:
            pickle.dump(np.asarray(protos), f)
        print(f"converted torch -> native under {d}")
    else:
        res = load_training_result(d)
        sd = export_torch_state_dict(res["params"])
        keys = [str(i) for i in range(res["prototypes"].shape[0])]
        pd_ = export_torch_prototypes(keys, res["prototypes"])
        import torch
        torch.save({k: torch.tensor(v) for k, v in sd.items()},
                   os.path.join(d, "params.zip"))
        torch.save({k: torch.tensor(v) for k, v in pd_.items()},
                   os.path.join(d, "prototypes.zip"))
        print(f"converted native -> torch under {d}")


def cmd_attention(args):
    """DINO CLS-attention visualization (reference dino-main tools).

    --image <path>: per-head heatmap PNGs (+ mass-threshold masks with
    --attn-threshold) like visualize_attention.py:179-213.
    -f <videoname>: attention-overlay mp4 like video_generation.py.
    """
    import jax.numpy as jnp
    from sais_tpu.ops.preprocess import preprocess_batch

    cfg = _pipeline_config(args)
    vit_params = _load_vit(args, cfg)
    outdir = os.path.join(args.path, "results")
    os.makedirs(outdir, exist_ok=True)
    if args.image:
        from PIL import Image
        from sais_tpu.eval.attention_viz import (cls_attention_maps,
                                                 save_attention_pngs,
                                                 threshold_masks,
                                                 upsample_maps)
        img = np.asarray(Image.open(args.image).convert("RGB"))
        x = preprocess_batch(jnp.asarray(img[None]), cfg.preprocess)
        maps = cls_attention_maps(vit_params, x, cfg.vit)
        stem = os.path.splitext(os.path.basename(args.image))[0]
        prefix = os.path.join(outdir, f"{stem}_attn")
        paths = save_attention_pngs(maps, prefix, cfg.vit.patch_size)
        if args.attn_threshold is not None:
            masks = upsample_maps(
                threshold_masks(maps, args.attn_threshold),
                cfg.vit.patch_size)
            for h in range(masks.shape[1]):
                mp = f"{prefix}_mask_th{args.attn_threshold}_head{h}.png"
                Image.fromarray(
                    (masks[0, h] * 255).astype(np.uint8)).save(mp)
                paths.append(mp)
        print(f"wrote {len(paths)} maps under {prefix}_*.png")
        return
    if not args.videoname:
        sys.exit("sais attention: --image <path> or -f <videoname> "
                 "is required")
    from sais_tpu.eval.video_generation import attention_video
    video_path = os.path.join(args.path, "videos", args.videoname + ".mp4")
    dest = os.path.join(outdir, f"{args.videoname}_attention.mp4")
    n = attention_video(vit_params, cfg.vit, video_path, dest,
                        pre=cfg.preprocess, batch_size=args.batch_size,
                        alpha=args.alpha, threshold=args.attn_threshold)
    print(f"wrote {n} frames to {dest}")


def build_parser():
    p = argparse.ArgumentParser(prog="sais")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("frames", cmd_frames), ("paths", cmd_paths),
                     ("extract", cmd_extract), ("flow", cmd_flow),
                     ("decode", cmd_decode), ("pipeline", cmd_pipeline),
                     ("assess", cmd_assess), ("steps", cmd_steps),
                     ("train", cmd_train), ("pretrain", cmd_pretrain),
                     ("eval", cmd_eval), ("port", cmd_port),
                     ("serve", cmd_serve), ("request", cmd_request),
                     ("attention", cmd_attention)]:
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("-f", "--videoname",
                        required=(name not in ("train", "pretrain", "eval",
                                               "port", "serve", "request",
                                               "attention")))
        sp.add_argument("--socket", default="/tmp/sais.sock")
        sp.add_argument("--rpc", choices=["ping", "shutdown", "stats"])
        sp.add_argument("-p", "--path", default=".")
        sp.add_argument("--dino-weights")
        sp.add_argument("--raft-weights")
        sp.add_argument("--flow-batch", type=int, default=None,
                        help="RAFT pair batch (default: auto by resolution)")
        sp.add_argument("--flow-iters", type=int, default=None,
                        help="RAFT GRU iterations (default 32 = 'things' "
                             "eval parity; 12-16 trades ~0.5 px EPE for "
                             "~2x flow speed)")
        sp.add_argument("--flow-jump", default=None,
                        help="flow pair stride: frames, or 'auto' = "
                             "fps // 2 (per-video fps tables, "
                             "extract_representations.py:437-463)")
        # attention visualization (visualize_attention.py /
        # video_generation.py equivalents)
        sp.add_argument("--image", default=None,
                        help="attention: visualize one image instead of a "
                             "video (per-head heatmap PNGs, reference "
                             "visualize_attention.py --image_path)")
        sp.add_argument("--attn-threshold", type=float, default=None,
                        help="attention: also write the mass-threshold "
                             "masks keeping this fraction of attention "
                             "(visualize_attention.py --threshold, "
                             "reference value 0.6); on videos, masks the "
                             "heat overlay")
        sp.add_argument("--alpha", type=float, default=0.5,
                        help="attention video: overlay blend weight "
                             "(video_generation.py default)")
        sp.add_argument("--flow-warmup", default=None, metavar="HxW[,HxW...]",
                        help="serve: pre-compile the fused dual-stream "
                             "program for this video resolution (e.g. "
                             "240x320) so the first flow request pays no "
                             "compile")
        sp.add_argument("--params-dir")
        sp.add_argument("--verify", default=None, metavar="CKPT",
                        help="port: probe a real reference checkpoint "
                             "against the committed golden digest "
                             "(needs --kind)")
        sp.add_argument("--record", default=None, metavar="CKPT",
                        help="port: record the golden digest from a "
                             "verified checkpoint (needs --kind)")
        sp.add_argument("--record-all", default=None, metavar="DIR",
                        help="port: discover the three published "
                             "checkpoints under DIR by name and record "
                             "every golden digest in one run")
        sp.add_argument("--kind", choices=["vit", "raft", "full"],
                        default=None,
                        help="port --verify/--record: checkpoint family")
        sp.add_argument("--golden-dir", default=None,
                        help="port: override the golden digest directory "
                             "(default sais_tpu/port/golden)")
        sp.add_argument("--random-init", action="store_true")
        sp.add_argument("--nfolds", type=int, default=1)
        sp.add_argument("--nclasses", type=int, default=2)
        sp.add_argument("-mod", "--modalities", default="RGB",
                        choices=["RGB", "Flow", "RGB-Flow"])
        sp.add_argument("-bs", "--batch-size", type=int, default=256)
        sp.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
        sp.add_argument("--seq-parallel", type=int, default=0,
                        metavar="N",
                        help="shard each window's time axis over an "
                             "N-device 'seq' mesh (ring attention, "
                             "parallel/sequence.py) for step windows "
                             "beyond one chip's attention; 0 = off. "
                             "Saved attention artifacts contain the "
                             "CLS-query row (like --flash on)")
        sp.add_argument("--flash", default="auto",
                        choices=["auto", "on", "off"],
                        help="fused Pallas flash attention in the temporal "
                             "encoder (no (L,L) weight materialization). "
                             "auto = on TPU for sequences >= 512. NOTE: "
                             "when flash runs, saved attention artifacts "
                             "contain the CLS-query row (the only row SAIS "
                             "consumes) instead of the reference's full "
                             "(L,L) matrix; pass 'off' if a downstream "
                             "tool needs the full-matrix layout")
        # training flags (run_experiments.py:19-46 equivalents)
        sp.add_argument("--segments",
                        help="CSV with Video/StartFrame/EndFrame/Gesture")
        sp.add_argument("-lr", "--lr", type=float, default=0.1)
        sp.add_argument("-e", "--nepochs", type=int, default=50)
        sp.add_argument("-bc", "--balance-classes", action="store_true")
        sp.add_argument("-t", "--task", default="Prototypes",
                        choices=["Prototypes", "MIL", "ClassificationHead"])
        sp.add_argument("--save-artifacts", action="store_true",
                        help="persist reps_and_labels/attention artifacts")
        sp.add_argument("--split-policy", default="fold-video",
                        choices=["fold-video", "per-gesture-video", "louo",
                                 "instance"])
        sp.add_argument("--dataset", default="segments",
                        choices=["segments", "vua-ease", "vua-ease-stitch",
                                 "vua-gestures", "dvc-ucl"],
                        help="vua-ease: EASE stitch-annotation skill branch; "
                             "vua-ease-stitch: sub-phase (NH/ND/NW) "
                             "recognition over the same annotations; "
                             "vua-gestures/dvc-ucl: gesture-timestamp "
                             "classification branches")
        sp.add_argument("-tf", "--training-fraction", type=float, default=1.0,
                        help="subsample the train split to this fraction "
                             "(run_experiments.py -tf; sample(random_state=0)"
                             ", prepare_dataset.py:549,703)")
        sp.add_argument("--unfreeze-encoder", action="store_true",
                        help="raw path: train the R3D/ViT encoder jointly "
                             "with the head (the reference CLI default "
                             "without -fe; our default matches -fe = "
                             "frozen, prepare_model.py:112-124)")
        sp.add_argument("--no-self-attention", action="store_true",
                        help="disable the temporal transformer: snippets "
                             "become plain frame means — equivalent to the "
                             "reference CLI WITHOUT -sa "
                             "(prepare_model.py:296-301). Our default "
                             "matches the reference's published commands "
                             "(-sa on). No -sa short alias on purpose: its "
                             "polarity here would be inverted.")
        sp.add_argument("-bg", "--balance-groups", action="store_true",
                        help="balance surgeon/patient groups within classes "
                             "(balanceGroups, prepare_dataset.py:190-213)")
        sp.add_argument("--meta", help="surgeon/patient meta CSV for -bg/-sg")
        sp.add_argument("-sg", "--single-group", nargs="?",
                        const="ProstateLarge60ml", default=None,
                        help="restrict the train split to one group value "
                             "of --group (run_experiments.py:100-103; bare "
                             "-sg uses the reference's hardcoded "
                             "ProstateLarge60ml)")
        sp.add_argument("--group", default="Caseload Group",
                        help="meta column for group balancing")
        sp.add_argument("-dim", "--rep-dim", type=int, default=None,
                        help="representation dim override "
                             "(run_experiments.py -dim; default 384 for "
                             "ViT reps, 512 for the R3D raw path)")
        sp.add_argument("--domains", nargs="+", default=None,
                        help="train several domains in one invocation "
                             "(run_experiments.py -domains); artifacts "
                             "nest under params/<domain>/Fold_<k>")
        sp.add_argument("-d", "--domain", default="NH_02",
                        help="EASE domain, e.g. NH_02 or NH_02+ND_02 "
                             "(run_experiments.py -d)")
        sp.add_argument("-il", "--importance-loss", action="store_true",
                        help="add the frame-importance BCE to the NCE loss "
                             "(run_experiments.py:36, perform_training.py"
                             ":127-130)")
        sp.add_argument("--explanations", nargs="*",
                        help="EASE explanation CSVs (prepare_dataset.py"
                             ":65-77) for --importance-loss")
        sp.add_argument("-dt", "--data-type", default="reps",
                        choices=["reps", "raw"],
                        help="raw: train on 16-frame JPEG snippets with a "
                             "frozen encoder (prepare_dataset.py:1795-1990)")
        sp.add_argument("--encoder", default="R3D", choices=["R3D", "ViT"],
                        help="raw-path encoder (run_experiments.py -m)")
        sp.add_argument("--raw-width", type=int, default=112,
                        help="raw snippet resize width (R3D default 112)")
        sp.add_argument("--force", action="store_true",
                        help="re-extract even when reps already exist "
                             "(default skips, extract_representations.py:485)")
        sp.add_argument("--exact-preprocess", action="store_true",
                        help="host PIL preprocessing, bit-exact with the "
                             "reference transform stack (parity runs; "
                             "slower than the on-device path)")
        sp.add_argument("--save-flows", action="store_true",
                        help="also write the rendered flow images as "
                             "flows/<video>/flows_%%08d.jpg (the reference "
                             "saveFlows layout, extract_representations"
                             ".py:254-262; consumed by `sais pretrain "
                             "--source flows`)")
        sp.add_argument("--phase", default="inference",
                        help="assess: artifact phase suffix "
                             "(reps_and_labels_<phase> etc., "
                             "train.py:113-121)")
        sp.add_argument("--stride-divisor", type=int, default=None,
                        help="per-window frame subsampling divisor "
                             "(reference: span//10, prepare_dataset.py"
                             ":2647).  Large values approach stride 1 = "
                             "FULL-length windows into the temporal "
                             "encoder; the flash path handles those "
                             "without (L,L) attention materialization")
        sp.add_argument("--fps", type=float, default=20.0,
                        help="steps: video fps for the 10 s / 5 s windows "
                             "(prepare_dataset.py:471-473)")
        sp.add_argument("--max-positions", type=int, default=0,
                        metavar="N",
                        help="temporal pos-emb table size (default: the "
                             "reference's 2000, prepare_model.py:67).  "
                             "Raise for full-length windows past the "
                             "2000-frame subsample cap, e.g. `sais steps "
                             "--stride-divisor 4096 --max-positions 4096`")
        sp.add_argument("--norm", default="imagenet",
                        choices=["imagenet", "half"],
                        help="feature-extraction normalization: imagenet "
                             "stats for ViT_SelfSupervised_* encoders, "
                             "half = 0.5/0.5 for the timm "
                             "ViT_Supervised_ImageNet variant "
                             "(extract_representations.py:145-162)")
        sp.add_argument("--data-parallel", type=int, nargs="?", const=-1,
                        default=0, metavar="M",
                        help="shard batches over devices: bare flag = all "
                             "visible devices, M = an M-way data axis. "
                             "With train --seq-parallel N the two compose "
                             "into one (M, N) mesh — batches shard over "
                             "'data', each window's time axis rings over "
                             "'seq' (e.g. --seq-parallel 4 "
                             "--data-parallel 2 on a v5e-8)")
        sp.add_argument("--num-slices", type=int, default=1,
                        help="train over N TPU slices with a "
                             "('dcn','data','model') mesh (DCN crosses "
                             "slices; gradient reductions run ICI-first)")
        sp.add_argument("--init-distributed", action="store_true",
                        help="call jax.distributed.initialize (multi-host "
                             "launch; auto-detects on TPU pods)")
        # pretraining flags (main_dino.py argparse equivalents)
        sp.add_argument("--out-dim", type=int, default=65536)
        sp.add_argument("--local-crops", type=int, default=8)
        sp.add_argument("--source", default="videos",
                        choices=["videos", "flows"],
                        help="pretrain input: decoded video frames, or the "
                             "rendered flow JPEGs under <root>/flows "
                             "(reference --optical_flow_to_reps, "
                             "main_dino.py:254-257)")
        sp.add_argument("--crop-policy", default="default",
                        choices=["default", "gronau"],
                        help="pretrain border removal: 0.8/0.8 center crop, "
                             "or 0.8/0.7 for Gronau videos "
                             "(main_dino.py getCropDims)")
        sp.add_argument("--trim-right", type=int, default=0,
                        help="extra right-hand pixel trim after the border "
                             "crop (VUA_Lab/AFB timer overlay: 130, "
                             "main_dino.py:306-308)")
        sp.add_argument("--arch", default="vits16",
                        help="pretrain backbone geometry (main_dino.py "
                             "--arch/--patch_size via the zoo names: "
                             "vits16/vits8/vitb16/vitb8 or their dino_* "
                             "hubconf aliases; SAIS's recipe is vits16)")
        sp.add_argument("--loader-threads", type=int, default=4,
                        help="parallel decode threads feeding the shuffle "
                             "buffer (the reference DataLoader's "
                             "num_workers=10, main_dino.py:131)")
        sp.add_argument("--shuffle-buffer", type=int, default=1024,
                        help="frames held in the shuffle reservoir; batches "
                             "sample uniformly from it (approximates the "
                             "reference's global index shuffle; >= dataset "
                             "size makes it exact). Bounds host RAM: "
                             "buffer * frame bytes")
        sp.add_argument("--optimizer", default="adamw",
                        choices=["adamw", "sgd", "lars"])
        sp.add_argument("--drop-path", type=float, default=0.1,
                        help="pretrain: student stochastic-depth rate "
                             "(main_dino.py --drop_path_rate default 0.1; "
                             "runs fused at any rate — per-image branch "
                             "scales; 0 skips the mask draws)")
        sp.add_argument("--use-bn-in-head", action="store_true",
                        help="BatchNorm1d after each hidden head linear "
                             "(main_dino.py --use_bn_in_head, default "
                             "off; batch stats sync across a dp mesh "
                             "like SyncBatchNorm)")
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


def _apply_platform_override():
    """SAIS_PLATFORM / JAX_PLATFORMS=<cpu|tpu|...> pins the jax backend
    for this process.

    Needed because a PJRT plugin registered at interpreter startup (e.g.
    a sitecustomize TPU tunnel) can force jax_platforms before the CLI
    runs, at which point the JAX_PLATFORMS env var is read too late —
    jax.config.update is the only override that still wins.  Honoring
    JAX_PLATFORMS restores jax's own documented semantics for spawned
    CLIs (the test suite runs `sais` subprocesses with
    JAX_PLATFORMS=cpu; without this they silently grab the tunnel TPU
    and can block on a device already held by the parent).
    SAIS_PLATFORM wins when both are set."""
    plat = (os.environ.get("SAIS_PLATFORM")
            or os.environ.get("JAX_PLATFORMS"))
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def main(argv=None):
    args = build_parser().parse_args(argv)
    _apply_platform_override()
    _enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
