"""Typed configuration for the SAIS-TPU framework.

Every constant that is hardcoded somewhere in the reference pipeline
(danikiyasseh/SAIS) is captured here as a named, documented knob with the
reference value as the default.  Citations point at the reference files so a
reviewer can check parity:

- window geometry:           prepare_dataset.py:1711-1715 (0.5 s windows @ 30 fps)
- TTA offsets:               prepare_dataset.py:2649-2651 (+0, +3, +6 frames)
- stride divisor:            prepare_dataset.py:2647 (jump_size = span // 10)
- flow jump factor:          prepare_dataset.py:2663, generate_paths.py:43 (15 = fps // 2)
- pos-embedding table size:  prepare_model.py:67 (2000 learned slots)
- temporal encoder:          prepare_model.py:74-81 (4 layers, 4 heads, d_model=rep_dim)
- post-processing:           process_inference_results.py:230-234
  (decision threshold 0.515, entropy filter 0.66, 3 s interval merge)
- preprocessing:             extract_representations.py:145-162 (resize 224,
  ImageNet mean/std for self-supervised DINO), main_dino.py:300-326
  (center-crop 0.8/0.8 border removal)
- ViT-S/16:                  dino-main/vision_transformer.py:243-247
- training:                  train.py:48 (early-stop patience 5),
  prepare_model.py:566-567 (SGD over model+prototypes), main.sh:27 (lr 1e-1)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """DINO ViT backbone (dino-main/vision_transformer.py:134-247)."""

    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layernorm_eps: float = 1e-6
    in_channels: int = 3

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


VIT_TINY = ViTConfig(embed_dim=192, num_heads=3)
VIT_SMALL = ViTConfig(embed_dim=384, num_heads=6)
VIT_BASE = ViTConfig(embed_dim=768, num_heads=12)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Frame preprocessing for DINO feature extraction.

    Reference: SurgDataset.__getitem__ center-crops 0.8/0.8 of the frame
    (main_dino.py:300-326, getCropDims main_dino.py:320-326), resizes to
    224x224 and normalizes with ImageNet statistics for the self-supervised
    encoder (extract_representations.py:145-162).
    """

    crop_height_frac: float = 0.8
    crop_width_frac: float = 0.8
    resize: int = 224
    # 'ViT_SelfSupervised_*' -> ImageNet stats; 'ViT_Supervised_*' -> 0.5/0.5
    mean: Sequence[float] = (0.485, 0.456, 0.406)
    std: Sequence[float] = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class TemporalConfig:
    """Temporal transformer encoder over per-frame features.

    Reference: two 4-layer / 4-head nn.TransformerEncoders at
    d_model=rep_dim (prepare_model.py:74-81), hand-patched to also return
    the last layer's head-averaged attention (README.md:43-48).  PyTorch
    TransformerEncoderLayer defaults apply: post-norm residual blocks,
    ReLU activation, feed-forward width 2048, LayerNorm eps 1e-5.
    """

    rep_dim: int = 384
    num_layers: int = 4
    num_heads: int = 4
    ffn_dim: int = 2048
    layernorm_eps: float = 1e-5
    max_positions: int = 2000  # learned pos-emb table (prepare_model.py:67)
    # Fused Pallas flash attention (kernels/flash_attention.py) for long
    # sequences: no (L, L) weight materialization; the exported attention
    # becomes the CLS query's head-averaged row — the only row SAIS consumes
    # for attribution (prepare_model.py:213,221).  None = auto: flash on TPU
    # whenever the padded sequence reaches `flash_min_len` (the reference's
    # 2000-frame cap regime, prepare_dataset.py:2437); True/False force it.
    # Differentiable: the kernel carries a two-pass Pallas flash backward
    # (custom VJP), so long-sequence TRAINING runs flash too.
    use_flash: Optional[bool] = None
    flash_min_len: int = 512


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full SAIS temporal model (prepare_model.py:18-515)."""

    rep_dim: int = 384
    proj_dim: int = 256          # linear: rep_dim -> 256 (prepare_model.py:47)
    aux_logit_dim: int = 3       # linear2: 256 -> 3 (prepare_model.py:50)
    nclasses: int = 2
    n_attention_classes: int = 3  # MIL per-class modules (prepare_model.py:88)
    modalities: str = "RGB-Flow"  # 'RGB' | 'Flow' | 'RGB-Flow'
    self_attention: bool = True
    importance_head: bool = False  # importance_function (prepare_model.py:55-56)
    multi_task: bool = False     # '+'-joined domains -> linearB head
    data_type: str = "reps"      # 'raw' | 'reps'
    temporal: TemporalConfig = dataclasses.field(default_factory=TemporalConfig)


@dataclasses.dataclass(frozen=True)
class WindowConfig:
    """Sliding-window geometry for inference over unlabeled video.

    Reference Custom_Gestures: duration = hop = 0.5 s at fps 30
    (prepare_dataset.py:1711-1715); per-window frame subsampling with
    jump_size = span // stride_divisor (prepare_dataset.py:2647) and TTA
    start offsets (prepare_dataset.py:2649-2651).  Frame indices are
    StartFrame-1 .. EndFrame-1 (prepare_dataset.py:2642-2643) which makes
    the first window begin at index -1 -- numpy wrap-around semantics the
    reference relies on; preserved behind `preserve_negative_index`.
    """

    duration_s: float = 0.5
    hop_s: float = 0.5
    fps: float = 30.0
    stride_divisor: int = 10
    tta_offsets: Sequence[int] = (0, 3, 6)
    flow_jump_factor: int = 15   # fps // 2 (generate_paths.py:43)
    preserve_negative_index: bool = True

    @property
    def duration_frames(self) -> int:
        return int(self.duration_s * self.fps)

    @property
    def hop_frames(self) -> int:
        return int(self.hop_s * self.fps)


@dataclasses.dataclass(frozen=True)
class PostprocessConfig:
    """Gesture CSV post-processing (process_inference_results.py:230-244)."""

    decision_threshold: float = 0.515
    entropy_threshold: float = 0.66
    merge_gap_s: int = 3
    fps: int = 30
    class_names: Sequence[str] = ("in-view", "out-of-view")


# ---------------------------------------------------------------------------
# Per-video fps tables (config data the reference scatters through code)
# ---------------------------------------------------------------------------
# prepare_dataset.py:24-26: the VUA training videos' fps, used to derive the
# flow jump size (jump = fps // 2, prepare_dataset.py:2245).  The reference
# ships only video '1' at 20 fps; unknown videos default to 30 fps.
VUA_FPS_TABLE = {"1": 20.0}

# extract_representations.py:437-463: per-video fps for the HMH hospital's
# videos, used when generating flows (jump_size = fps // 2) and when loading
# flow reps for HMH_inference (prepare_dataset.py:1960).
HMH_FPS_TABLE = {
    "HMV1": 30.0, "HMV2": 30.0, "HMV3": 30.0,
    "HMV4": 60.0, "HMV5": 60.0, "HMV6": 60.0, "HMV7": 60.0,
    "HMV8": 59.94, "HMV9": 59.94, "HMV10": 59.94, "HMV11": 59.94,
    "HMV12": 59.94, "HMV13": 59.94, "HMV14": 59.94, "HMV15": 59.94,
    "HMV16": 59.94, "HMV17": 59.94, "HMV18": 59.94, "HMV19": 59.94,
    "HMV20": 59.94, "HMV21": 59.94, "HMV22": 59.94,
    "HMV23": 29.97, "HMV24": 29.97, "HMV25": 29.97, "HMV26": 29.97,
}

# Dataset-keyed flow jump sizes for inference phases
# (prepare_dataset.py:2240-2245: Gronau fixed 15, Lab/AFB fixed 30,
# HMH per-video fps // 2, VUA per-video fps // 2).
FLOW_JUMP_BY_PHASE = {"Gronau_inference": 15, "Lab_inference": 30,
                      "AFB_inference": 30}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop (train.py:46-96, prepare_model.py:566-567)."""

    lr: float = 0.1              # main.sh:27 '-lr 1e-1'
    nepochs: int = 50
    max_patience: int = 5        # train.py:48
    batch_size: int = 2          # main.sh:27 '-bs 2'
    nfolds: int = 1
    seed: int = 0
    importance_loss: bool = False
    balance_classes: bool = True


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    """RAFT optical-flow estimator (ptlflow 'raft' w/ 'things' checkpoint).

    Reference runs RAFT over frame pairs 15 frames apart
    (extract_representations.py:264-288) and renders the flow field to an
    RGB image via flow_to_rgb (extract_representations.py:243-247).
    """

    hidden_dim: int = 128
    context_dim: int = 128
    feature_dim: int = 256
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 32              # RAFT 'things' eval default
    small: bool = False
    # dtype of the stored all-pairs correlation pyramid.  'bfloat16' halves
    # the dominant HBM stream of the update loop (the level-0 volume is
    # read every iteration) at ~1e-2 relative flow error; 'float32' is the
    # checkpoint-parity default.
    corr_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map execution."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1      # -1 -> all devices
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end configuration for `sais decode`."""

    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    preprocess: PreprocessConfig = dataclasses.field(default_factory=PreprocessConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    window: WindowConfig = dataclasses.field(default_factory=WindowConfig)
    postprocess: PostprocessConfig = dataclasses.field(default_factory=PostprocessConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    raft: RAFTConfig = dataclasses.field(default_factory=RAFTConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    # Frame-count buckets used to pad ragged windows to a small set of static
    # shapes so XLA compiles once per bucket (SURVEY.md section 7 'Ragged
    # windows vs XLA static shapes').
    frame_buckets: Sequence[int] = (16, 32, 64, 128)
    compute_dtype: str = "bfloat16"
    params_dtype: str = "float32"
